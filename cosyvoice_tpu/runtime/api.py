"""Public API — mirrors the reference CLI surface (cosyvoice/cli/cosyvoice.py).

`CosyVoice2` exposes inference_zero_shot / inference_cross_lingual /
inference_instruct2 / inference_vc generators yielding
{'tts_speech': np.ndarray [1, n]} chunks with per-yield RTF logging, plus the
zero-shot speaker cache (add_zero_shot_spk / save_spkinfo). `AutoModel` picks
the model class from the files in the model dir (cosyvoice.py:228-238).

Checkpoints are flax msgpack files (lm.msgpack / flow.msgpack / hift.msgpack)
written by cosyvoice_tpu.train; absent files fall back to seeded random init
so the full pipeline stays runnable for benchmarking.
"""

import json
import logging
import os
import time
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.frontend.frontend import CosyVoiceFrontEnd
from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.runtime.engine import CosyVoice2Engine


def _load_msgpack(path, template):
    import flax.serialization as ser

    with open(path, "rb") as f:
        return ser.from_bytes(template, f.read())


def _save_msgpack(path, params):
    import flax.serialization as ser

    with open(path, "wb") as f:
        f.write(ser.to_bytes(params))


def _read_dir_config(model_dir: str) -> dict:
    path = os.path.join(model_dir, "config.json") if model_dir else ""
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def load_frontend(model_dir: str = "", sample_rate: int = 24000, version: int = 2):
    """Build a CosyVoiceFrontEnd from a model dir.

    A model dir may carry converted/trained frontend models (the reference
    ships speech_tokenizer_v2.onnx + campplus.onnx in every model dir,
    cli/frontend.py:45-48): `speech_tokenizer.msgpack` / `campplus.msgpack`
    params plus a config.json "frontend": {"s3": ...} section describing the
    S3 architecture (as derived from the ONNX graph by
    tools.convert_checkpoint.s3_config_from_weights). Missing pieces fall
    back to seeded random init, matching the data-prep tools."""
    from cosyvoice_tpu.frontend.tokenizer import find_tokenizer_assets
    from cosyvoice_tpu.models.campplus import CamPPEmbedding
    from cosyvoice_tpu.models.speech_tokenizer import S3Tokenizer, S3TokenizerConfig

    file_cfg = _read_dir_config(model_dir)
    fe_cfg = file_cfg.get("frontend", {})
    s3_cfg = None
    if fe_cfg.get("s3"):
        from cosyvoice_tpu.utils.config import build_s3_config

        s3_cfg = build_s3_config(fe_cfg["s3"])

    def _maybe_params(name, module, *init_args):
        from cosyvoice_tpu.utils.devices import jit_init

        path = os.path.join(model_dir, f"{name}.msgpack") if model_dir else ""
        if path and os.path.exists(path):
            template = jit_init(module.init, *init_args)
            logging.info("loaded frontend %s", path)
            return _load_msgpack(path, template)
        return None

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    s3 = S3Tokenizer(s3_cfg or S3TokenizerConfig())
    s3_params = _maybe_params(
        "speech_tokenizer", s3, k1, jnp.zeros((1, 100, s3.cfg.n_mels)), jnp.asarray([100])
    )
    cam_params = _maybe_params("campplus", CamPPEmbedding(), k2, jnp.zeros((1, 100, 80)))
    return CosyVoiceFrontEnd(
        token_path=find_tokenizer_assets(model_dir),
        sample_rate=sample_rate,
        spk2info_path=os.path.join(model_dir, "spk2info.pkl") if model_dir else "",
        s3_cfg=s3_cfg,
        tokenizer_params=s3_params,
        campplus_params=cam_params,
        version=version,
    )


class CosyVoice2:
    sample_rate = 24000

    def __init__(
        self,
        model_dir: str = "",
        fp16: bool = False,
        seed: int = 1986,
        lm_cfg: Optional[LMConfig] = None,
        flow_cfg: Optional[FlowConfig] = None,
        hift_cfg: Optional[HiFTConfig] = None,
        quant_lm=False,  # weight-only LM: True/"int8" (2x faster decode), "int4"
        # (half the int8 memory, XLA path) or "int4p" (int4 via the fused
        # Pallas decode kernels, ops/int4_fused.py)
        kv_quant: bool = False,  # int8 KV arena (halves batched long-context
        # decode's arena-read HBM term; see ops/decode_attention.py)
        hop_policy: str = "",  # streaming hop growth: doubling | exponential
        # | time_based (reference Triton model.py:386-429); "" = config.json's
        # engine.hop_policy, else "doubling"
    ):
        self.model_dir = model_dir
        # model dirs may carry a declarative config.json (the reference's
        # model-dir yaml role, cli/cosyvoice.py:150); explicit cfg args win
        file_cfg = _read_dir_config(model_dir)
        from cosyvoice_tpu.utils.config import build_flow_config, build_hift_config, build_lm_config

        lm_cfg = lm_cfg or (build_lm_config(file_cfg["llm"]) if "llm" in file_cfg else LMConfig())
        if kv_quant:
            import dataclasses

            lm_cfg = dataclasses.replace(
                lm_cfg, qwen=dataclasses.replace(lm_cfg.qwen, kv_quant=True)
            )
        flow_cfg = flow_cfg or (build_flow_config(file_cfg["flow"]) if "flow" in file_cfg else FlowConfig())
        hift_cfg = hift_cfg or (build_hift_config(file_cfg["hift"]) if "hift" in file_cfg else HiFTConfig())
        self.quant_lm = quant_lm
        self.lm = Qwen2LM(lm_cfg)
        self.flow = CausalFlow(flow_cfg)
        self.hift = HiFTGenerator(hift_cfg)

        from cosyvoice_tpu.utils.devices import init_on_cpu, to_default_device

        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        from cosyvoice_tpu.utils.devices import jit_init

        with init_on_cpu():
            lm_params = self.lm.init(k1)
            flow_params = self.flow.init(k2)
            hift_params = jit_init(self.hift.init, k3, jnp.zeros((1, 8, 80)), k)
        for name, template in (("lm", lm_params), ("flow", flow_params), ("hift", hift_params)):
            path = os.path.join(model_dir, f"{name}.msgpack") if model_dir else ""
            if path and os.path.exists(path):
                template = _load_msgpack(path, template)
                logging.info("loaded %s", path)
            else:
                logging.warning("no checkpoint for %s — using random init", name)
            if name == "lm" and quant_lm:
                # quantize the fp checkpoint on host, swap in the quant module
                import dataclasses

                from cosyvoice_tpu.ops.quant import quantize_lm_params

                mode = quant_lm if quant_lm in ("int4", "int4p") else "int8"
                template = quantize_lm_params(template, mode)
                self.lm = Qwen2LM(dataclasses.replace(
                    lm_cfg, qwen=dataclasses.replace(lm_cfg.qwen, quant=mode)))
            setattr(self, f"{name}_params", to_default_device(template))

        self._init_frontend_only(model_dir)
        self.engine = CosyVoice2Engine(
            self.lm, self.flow, self.hift, self.lm_params, self.flow_params, self.hift_params, seed=seed,
            hop_policy=hop_policy or file_cfg.get("engine", {}).get("hop_policy", "doubling"),
        )

    def _init_frontend_only(self, model_dir: str = ""):
        """Build only the host-side frontend (tokenizer, prompt features,
        speaker cache). Used stand-alone by the disaggregated-serving gateway,
        which replaces `self.engine` with a RemoteEngine."""
        self.model_dir = model_dir
        self.frontend = load_frontend(model_dir, sample_rate=self.sample_rate)

    # ---------------- speaker cache ----------------
    def list_available_spks(self):
        return list(self.frontend.spk2info.keys())

    def add_zero_shot_spk(self, prompt_text: str, prompt_wav, zero_shot_spk_id: str) -> bool:
        assert zero_shot_spk_id != "", "do not use empty zero_shot_spk_id"
        return self.frontend.add_zero_shot_spk(prompt_text, prompt_wav, zero_shot_spk_id)

    def save_spkinfo(self):
        self.frontend.save_spkinfo(os.path.join(self.model_dir or ".", "spk2info.pkl"))

    def set_sampling(self, top_p=None, top_k=None, temperature=None, repetition_penalty=None):
        """Override the LM's decode sampling convention (the reference's
        Triton consumer uses top_p 0.95 / top_k 50 / temperature 0.8 /
        repetition_penalty 1.1, model_repo/cosyvoice2/1/model.py:116-126;
        the in-repo default is RAS top_p 0.8 / top_k 25). Rebuilds the LM
        wrapper with the new config; params are shared. Call before
        enable_continuous_batching."""
        import dataclasses

        kw = {}
        if top_p is not None:
            kw["top_p"] = float(top_p)
        if top_k is not None:
            kw["top_k"] = int(top_k)
        if temperature is not None:
            kw["temperature"] = float(temperature)
        if repetition_penalty is not None:
            kw["repetition_penalty"] = float(repetition_penalty)
        if not kw:
            return self.lm.cfg
        self.lm = type(self.lm)(dataclasses.replace(self.lm.cfg, **kw))
        self.engine.lm = self.lm
        if getattr(self.engine, "scheduler", None) is not None:
            raise RuntimeError("set_sampling must be called before enable_continuous_batching")
        return self.lm.cfg

    def enable_continuous_batching(self, max_batch: int = 4, block_size=None):
        """Serve concurrent requests with ONE shared LM decode loop: every
        block step decodes all live sessions' next tokens in a single device
        program over a persistent batched KV arena (the role vLLM plays in
        the reference serving stack). Call once; inference_* calls from any
        thread then share the scheduler."""
        from cosyvoice_tpu.runtime.batch_scheduler import LMBatchScheduler

        sched = LMBatchScheduler(self.lm, self.lm_params, max_batch=max_batch, block_size=block_size)
        sched.start()
        self.engine.scheduler = sched
        return sched

    # ---------------- inference modes ----------------
    def _run(self, model_input: dict, stream: bool, speed: float, text_len_s: float):
        start = time.time()
        extra = {}
        if model_input.get("llm_embedding") is not None:
            # v1 conditions the LM on its own speaker vector (engine.py:689);
            # the v2/v3 engine has no such kwarg
            extra["llm_embedding"] = model_input["llm_embedding"]
        for out in self.engine.tts(
            **extra,
            text_tokens=model_input.get("text_tokens", np.zeros(0, np.int32)),
            prompt_text_tokens=model_input.get("prompt_text_tokens", np.zeros(0, np.int32)),
            llm_prompt_speech_token=model_input.get("llm_prompt_speech_token", np.zeros(0, np.int32)),
            flow_prompt_speech_token=model_input.get("flow_prompt_speech_token", np.zeros(0, np.int32)),
            prompt_speech_feat=model_input.get("prompt_speech_feat", np.zeros((1, 0, 80), np.float32)),
            flow_embedding=model_input.get("flow_embedding", np.zeros((1, 192), np.float32)),
            stream=stream,
            speed=speed,
            source_speech_token=model_input.get("source_speech_token"),
        ):
            speech_len = out["tts_speech"].shape[1] / self.sample_rate
            rtf = (time.time() - start) / max(speech_len, 1e-6)
            logging.info("yield speech len %.2f, rtf %.3f", speech_len, rtf)
            yield out
            start = time.time()

    def _run_segments(self, job_iter, stream: bool, speed: float):
        """job_iter lazily yields (model_input, text_len) per text segment.
        Offline multi-segment synthesis with continuous batching enabled
        runs the segments CONCURRENTLY through the shared LM decode loop and
        yields chunks in segment order (long-text latency ≈ one segment
        instead of the sum — the TRT-LLM batched-offline role; the reference
        synthesizes segments serially). Streaming and scheduler-less
        requests keep the lazy serial path: segment 1's audio starts after
        ONE frontend pass, the other segments' frontends run as reached."""
        scheduler = getattr(self.engine, "scheduler", None)
        if stream or scheduler is None:
            for mi, ln in job_iter:
                yield from self._run(mi, stream, speed, ln)
            return
        jobs = list(job_iter)
        if len(jobs) <= 1:
            for mi, ln in jobs:
                yield from self._run(mi, stream, speed, ln)
            return
        import queue

        # chunk-level interleaving: segment 1's first chunk is yielded as soon
        # as it exists (not when the whole segment — or worse, all segments —
        # finish), while later segments keep decoding in the shared batch
        ex = self._segment_executor(scheduler.B)
        queues = [queue.Queue() for _ in jobs]

        def worker(mi, ln, q):
            try:
                for out in self._run(mi, False, speed, ln):
                    q.put(out)
                q.put(None)
            except BaseException as e:  # surfaced on the consumer thread
                q.put(e)

        for (mi, ln), q in zip(jobs, queues):
            ex.submit(worker, mi, ln, q)
        for q in queues:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item

    def _segment_executor(self, width: int):
        """Persistent thread pool for concurrent offline segments (a pool per
        call churns threads under serving load)."""
        ex = getattr(self, "_seg_ex", None)
        if ex is None or self._seg_ex_width < width:
            if ex is not None:
                ex.shutdown(wait=False)
            from concurrent.futures import ThreadPoolExecutor

            ex = ThreadPoolExecutor(max_workers=width, thread_name_prefix="cosy-seg")
            self._seg_ex = ex
            self._seg_ex_width = width
        return ex

    def inference_zero_shot(
        self, tts_text, prompt_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True
    ):
        prompt_texts = self.frontend.text_normalize(prompt_text, split=False) if text_frontend else prompt_text

        def jobs():
            for seg in self.frontend.text_normalize(tts_text, split=True) if text_frontend else [tts_text]:
                if hasattr(seg, "__next__"):
                    # generator tts_text: routed to the LM's bistream decode
                    # (reference cli/cosyvoice.py:91-94 accepts a Generator)
                    yield self.frontend.frontend_zero_shot(seg, prompt_texts, prompt_wav, zero_shot_spk_id), 0
                    continue
                if len(seg) < 0.5 * len(prompt_text):
                    logging.warning("synthesis text %s too short compared to prompt text %s", seg, prompt_text)
                yield self.frontend.frontend_zero_shot(seg, prompt_texts, prompt_wav, zero_shot_spk_id), len(seg)

        yield from self._run_segments(jobs(), stream, speed)

    def inference_cross_lingual(self, tts_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True):
        def jobs():
            for seg in self.frontend.text_normalize(tts_text, split=True) if text_frontend else [tts_text]:
                yield self.frontend.frontend_cross_lingual(seg, prompt_wav, zero_shot_spk_id), len(seg)

        yield from self._run_segments(jobs(), stream, speed)

    def inference_instruct2(
        self, tts_text, instruct_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True
    ):
        def jobs():
            for seg in self.frontend.text_normalize(tts_text, split=True) if text_frontend else [tts_text]:
                ln = 0 if hasattr(seg, "__next__") else len(seg)
                yield self.frontend.frontend_instruct2(seg, instruct_text, prompt_wav, zero_shot_spk_id), ln

        yield from self._run_segments(jobs(), stream, speed)

    def inference_vc(self, source_speech_16k, prompt_wav, stream=False, speed=1.0):
        mi = self.frontend.frontend_vc(source_speech_16k, prompt_wav)
        yield from self._run(mi, stream, speed, 0.0)

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0, text_frontend=True):
        """Pre-enrolled-speaker synthesis. The reference v2/v3 classes inherit
        this from CosyVoice (cli/cosyvoice.py:79-89,141): a speaker enrolled
        via add_zero_shot_spk+save_spkinfo (full prompt set) or a released
        spk2info entry (bare 'embedding' x-vector) synthesizes without a
        prompt wav."""
        info = self.frontend.spk2info[spk_id]

        def jobs():
            for seg in self.frontend.text_normalize(tts_text, split=True) if text_frontend else [tts_text]:
                if "embedding" in info:
                    # released sft-style entry: x-vector only (frontend.py:162-166)
                    mi = {"flow_embedding": np.asarray(info["embedding"], np.float32).reshape(1, -1)}
                else:
                    mi = dict(info)
                mi["text_tokens"] = self.frontend._extract_text_token(seg)
                yield mi, (0 if hasattr(seg, "__next__") else len(seg))

        yield from self._run_segments(jobs(), stream, speed)

    # ---------------- checkpoint save ----------------
    def save_pretrained(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        _save_msgpack(os.path.join(out_dir, "lm.msgpack"), self.lm_params)
        _save_msgpack(os.path.join(out_dir, "flow.msgpack"), self.flow_params)
        _save_msgpack(os.path.join(out_dir, "hift.msgpack"), self.hift_params)
        # frontend models too, so the dir round-trips self-contained (the
        # reference ships the ONNX pair in every model dir)
        _save_msgpack(
            os.path.join(out_dir, "speech_tokenizer.msgpack"), self.frontend.speech_tokenizer_params
        )
        _save_msgpack(os.path.join(out_dir, "campplus.msgpack"), self.frontend.campplus_params)


class CosyVoice:
    """CosyVoice-300M (v1): TransformerLM + MaskedDiffWithXvec + 22.05 kHz
    HiFT (reference cli/cosyvoice.py:26-139). Adds inference_sft and
    inference_instruct on top of zero-shot/cross-lingual/vc."""

    sample_rate = 22050

    def __init__(
        self,
        model_dir: str = "",
        fp16: bool = False,
        seed: int = 1986,
        lm_cfg=None,
        flow_cfg=None,
        hift_cfg=None,
    ):
        from cosyvoice_tpu.models.flow_v1 import FlowV1Config, MaskedDiffFlow
        from cosyvoice_tpu.models.llm_v1 import LMv1Config, TransformerLM
        from cosyvoice_tpu.runtime.engine import CosyVoiceV1Engine
        from cosyvoice_tpu.utils.devices import init_on_cpu, to_default_device

        self.model_dir = model_dir
        file_cfg = _read_dir_config(model_dir)
        from cosyvoice_tpu.utils.config import build_flow_v1_config, build_hift_config, build_lm_v1_config

        if lm_cfg is None and "llm" in file_cfg:
            lm_cfg = build_lm_v1_config(file_cfg["llm"])
        if flow_cfg is None and "flow" in file_cfg:
            flow_cfg = build_flow_v1_config(file_cfg["flow"])
        if hift_cfg is None and "hift" in file_cfg:
            hift_cfg = build_hift_config(file_cfg["hift"])
        self.lm = TransformerLM(lm_cfg or LMv1Config())
        self.flow = MaskedDiffFlow(flow_cfg or FlowV1Config())
        self.hift = HiFTGenerator(
            hift_cfg
            or HiFTConfig(
                sampling_rate=22050,
                upsample_rates=(8, 8),
                upsample_kernel_sizes=(16, 16),
                source_resblock_kernel_sizes=(7, 11),
                source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
            )
        )
        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        with init_on_cpu():
            lm_params = self.lm.init(k1)
            flow_params = self.flow.init(k2)
            from cosyvoice_tpu.utils.devices import jit_init

            hift_params = jit_init(self.hift.init, k3, jnp.zeros((1, 8, 80)), k)
        for name, template in (("lm", lm_params), ("flow", flow_params), ("hift", hift_params)):
            path = os.path.join(model_dir, f"{name}.msgpack") if model_dir else ""
            if path and os.path.exists(path):
                template = _load_msgpack(path, template)
            setattr(self, f"{name}_params", to_default_device(template))
        self.frontend = load_frontend(model_dir, sample_rate=self.sample_rate, version=1)
        self.engine = CosyVoiceV1Engine(
            self.lm, self.flow, self.hift, self.lm_params, self.flow_params, self.hift_params, seed=seed
        )

    list_available_spks = CosyVoice2.list_available_spks
    add_zero_shot_spk = CosyVoice2.add_zero_shot_spk
    save_spkinfo = CosyVoice2.save_spkinfo
    _run = CosyVoice2._run
    _run_segments = CosyVoice2._run_segments
    _segment_executor = CosyVoice2._segment_executor
    inference_zero_shot = CosyVoice2.inference_zero_shot
    inference_cross_lingual = CosyVoice2.inference_cross_lingual
    inference_vc = CosyVoice2.inference_vc
    save_pretrained = CosyVoice2.save_pretrained

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0, text_frontend=True):
        """Pre-enrolled speaker synthesis (cli/cosyvoice.py:80-89)."""
        info = self.frontend.spk2info[spk_id]
        for seg in self.frontend.text_normalize(tts_text, split=True) if text_frontend else [tts_text]:
            mi = dict(info)
            mi["text_tokens"] = self.frontend._extract_text_token(seg)
            mi.setdefault("prompt_text_tokens", np.zeros(0, np.int32))
            mi.setdefault("llm_prompt_speech_token", np.zeros(0, np.int32))
            yield from self._run(mi, stream, speed, len(seg))

    def inference_instruct(self, tts_text, spk_id, instruct_text, stream=False, speed=1.0, text_frontend=True):
        """Instructed synthesis: instruct text as LM prompt, no speaker
        embedding in the LM (cli/frontend.py:201-209)."""
        info = self.frontend.spk2info[spk_id]
        for seg in self.frontend.text_normalize(tts_text, split=True) if text_frontend else [tts_text]:
            mi = dict(info)
            mi["text_tokens"] = self.frontend._extract_text_token(seg)
            mi["prompt_text_tokens"] = self.frontend._extract_text_token(instruct_text + "<endofprompt>")
            mi["llm_prompt_speech_token"] = np.zeros(0, np.int32)
            yield from self._run(mi, stream, speed, len(seg))


class CosyVoice3(CosyVoice2):
    """Fun-CosyVoice3-0.5B: FSQ-6561 codec with 200 special rows in the
    speech table, DiT flow estimator, fully causal vocoder
    (reference cli/cosyvoice.py:189-226, cli/model.py:397-450)."""

    def __init__(self, model_dir: str = "", fp16: bool = False, seed: int = 1986, **kwargs):
        from cosyvoice_tpu.models.dit import DiTConfig
        from cosyvoice_tpu.runtime.engine import CosyVoice3Engine

        # v3 defaults apply only when neither an explicit cfg arg nor a
        # config.json section provides one (super() builds from config.json)
        file_cfg = _read_dir_config(model_dir)
        lm_cfg = kwargs.pop("lm_cfg", None)
        if lm_cfg is None and "llm" not in file_cfg:
            lm_cfg = LMConfig(speech_token_size=6561, num_special_head=200, special_in_speech_table=True)
        flow_cfg = kwargs.pop("flow_cfg", None)
        if flow_cfg is None and "flow" not in file_cfg:
            flow_cfg = FlowConfig(
                input_size=80, encoder_type="dit_prelookahead", estimator_type="dit", dit=DiTConfig()
            )
        hift_cfg = kwargs.pop("hift_cfg", None)
        if hift_cfg is None and "hift" not in file_cfg:
            hift_cfg = HiFTConfig(causal=True)
        hop_policy = kwargs.pop("hop_policy", "")
        super().__init__(model_dir, fp16=fp16, seed=seed, lm_cfg=lm_cfg, flow_cfg=flow_cfg,
                         hift_cfg=hift_cfg, hop_policy=hop_policy)
        # swap in the v3 engine (cumulative-mel causal vocoding + FSQ squelch)
        self.engine = CosyVoice3Engine(
            self.lm, self.flow, self.hift, self.lm_params, self.flow_params, self.hift_params, seed=seed,
            hop_policy=hop_policy or file_cfg.get("engine", {}).get("hop_policy", "doubling"),
        )

    def inference_instruct2(
        self, tts_text, instruct_text, prompt_wav, zero_shot_spk_id="", stream=False, speed=1.0, text_frontend=True
    ):
        # the frontend appends the <|endofprompt|> delimiter itself
        # (reference llm.py:586-590); a stray one inside instruct_text would
        # silently split the prompt at the wrong place
        assert "<|endofprompt|>" not in instruct_text, "instruct_text must not contain <|endofprompt|>"
        yield from super().inference_instruct2(
            tts_text, instruct_text, prompt_wav, zero_shot_spk_id, stream, speed, text_frontend
        )


def detect_model_version(model_dir: str) -> int:
    """Model generation from dir contents: config.json 'version' key, else
    the reference's yaml-NAME convention (cli/cosyvoice.py:231-236 picks the
    class by which of cosyvoice{,2,3}.yaml exists). Default 2."""
    cfg_path = os.path.join(model_dir, "config.json") if model_dir else ""
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f).get("version", 2)
    if model_dir:
        for v, name in ((3, "cosyvoice3.yaml"), (2, "cosyvoice2.yaml"), (1, "cosyvoice.yaml")):
            if os.path.exists(os.path.join(model_dir, name)):
                return v
    return 2


class AutoModel:
    """Pick the model class from the model dir contents (cosyvoice.py:228-238)."""

    def __new__(cls, model_dir: str = "", **kwargs):
        version = detect_model_version(model_dir)
        if version == 1:
            return CosyVoice(model_dir, **kwargs)
        if version == 2:
            return CosyVoice2(model_dir, **kwargs)
        if version == 3:
            return CosyVoice3(model_dir, **kwargs)
        raise ValueError(f"unsupported model version {version}")
