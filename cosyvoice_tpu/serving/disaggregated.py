"""Disaggregated serving: LLM workers and token2wav workers on separate
chips/hosts, orchestrated by a gateway that keeps the engine's chunk cadence.

This is the TPU-native analog of the reference's Triton BLS + TRT-LLM
disaggregation (runtime/triton_trtllm/model_repo/cosyvoice2/1/model.py:48-315
drives audio_tokenizer -> TRT-LLM -> token2wav over BLS;
README.Cosyvoice2.DiT.md:104-124 splits LLM and token2wav across GPUs).
Design differences, deliberately TPU-first:

- the LLM worker runs the continuous-batching arena scheduler
  (runtime/batch_scheduler.py) so concurrent sessions share one decode
  program — the role TRT-LLM in-flight batching plays;
- the token2wav worker holds per-RPC session state (HiFT mel/source caches)
  for the lifetime of one `Synthesize` stream — no global uuid dict;
- the gateway reuses CosyVoice2Engine.tts()'s hop/cadence/finalize logic
  verbatim by subclassing and swapping the two device calls for RPCs.

Run:  python -m cosyvoice_tpu.serving.disaggregated llm  --model_dir D --port 50051
      python -m cosyvoice_tpu.serving.disaggregated t2w  --model_dir D --port 50052
      python -m cosyvoice_tpu.serving.disaggregated gateway --model_dir D \
          --llm_addr host:50051 --t2w_addr host:50052 --port 50000
(the gateway exposes the standard HTTP surface on --port).
"""

import argparse
import logging
import os
import queue
import sys
import threading
from concurrent import futures
from typing import Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import cosyvoice_pb2 as pb  # noqa: E402


def _i32(b: bytes) -> np.ndarray:
    return np.frombuffer(b, np.int32).copy()


def _f32(b: bytes, shape) -> np.ndarray:
    return np.frombuffer(b, np.float32).reshape(shape).copy()


def _pcm(wav: np.ndarray) -> bytes:
    return (np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes()


def _unpcm(raw: bytes) -> np.ndarray:
    return (np.frombuffer(raw, np.int16).astype(np.float32) / 32767.0)[None, :]


# ---------------------------------------------------------------------------
# LLM worker
# ---------------------------------------------------------------------------


class LLMService:
    """Serves speech-token generation. With max_batch > 1 requests are decoded
    together by the continuous-batching scheduler (one device program for all
    live sessions)."""

    def __init__(self, lm, lm_params, max_batch: int = 4):
        import jax

        self._jax = jax
        self.lm = lm
        self.params = lm_params
        self.scheduler = None
        if max_batch > 1:
            from cosyvoice_tpu.runtime.batch_scheduler import LMBatchScheduler

            self.scheduler = LMBatchScheduler(lm, lm_params, max_batch=max_batch)
            self.scheduler.start()

    def GenerateTokens(self, request: "pb.LLMRequest", context):
        ids = _i32(request.ids)
        types = _i32(request.types)
        if self.scheduler is not None:
            handle = self.scheduler.submit(ids, types, request.min_len, request.max_len)
            for block in handle:
                yield pb.TokenBlock(speech_tokens=np.asarray(block, np.int32).tobytes())
        else:
            rng = self._jax.random.PRNGKey(request.seed)
            for block in self.lm.generate(self.params, ids, types, rng, request.min_len, request.max_len):
                yield pb.TokenBlock(speech_tokens=np.asarray(block, np.int32).tobytes())

    def GenerateTokensBistream(self, request_iterator, context):
        first = next(request_iterator)
        prompt_text = _i32(first.prompt_text)
        prompt_speech = _i32(first.prompt_speech)
        rng = self._jax.random.PRNGKey(first.seed)

        def text_stream():
            chunk = _i32(first.text_chunk)
            if len(chunk):
                yield chunk
            for msg in request_iterator:
                chunk = _i32(msg.text_chunk)
                if len(chunk):
                    yield chunk

        for block in self.lm.generate_bistream(self.params, text_stream(), prompt_text, prompt_speech, rng):
            yield pb.TokenBlock(speech_tokens=np.asarray(block, np.int32).tobytes())


# ---------------------------------------------------------------------------
# token2wav worker
# ---------------------------------------------------------------------------


class Token2WavService:
    """One `Synthesize` RPC per TTS session; the per-session HiFT caches live
    in a SessionState scoped to the stream."""

    def __init__(self, engine):
        self.engine = engine

    def Synthesize(self, request_iterator, context):
        from cosyvoice_tpu.runtime.engine import SessionState

        state = SessionState()
        ctx_tokens = ctx_feat = ctx_emb = None
        for msg in request_iterator:
            if ctx_tokens is None:
                ctx_tokens = _i32(msg.prompt_speech_tokens)
                ctx_feat = _f32(msg.prompt_feat, (1, msg.prompt_feat_len, 80))
                ctx_emb = _f32(msg.embedding, (1, -1))
            tokens = _i32(msg.speech_tokens)
            if msg.stream:
                wav = self.engine.token2wav(
                    state, tokens, ctx_tokens, ctx_feat, ctx_emb,
                    token_offset=int(msg.token_offset), stream=True,
                    finalize=bool(msg.finalize), speed=msg.speed or 1.0,
                )
            else:
                wav = self.engine.synthesize_offline(
                    tokens, ctx_tokens, ctx_feat, ctx_emb, speed=msg.speed or 1.0
                )
            yield pb.T2WResponse(tts_audio=_pcm(wav))


# ---------------------------------------------------------------------------
# gateway
# ---------------------------------------------------------------------------


class _T2WStream:
    """Client side of one Synthesize RPC: queue-fed request iterator, lockstep
    one-response-per-request reads."""

    def __init__(self, channel):
        self._q: "queue.Queue" = queue.Queue()
        call = channel.stream_stream(
            "/cosyvoice_tpu.CosyVoiceToken2Wav/Synthesize",
            request_serializer=pb.T2WRequest.SerializeToString,
            response_deserializer=pb.T2WResponse.FromString,
        )
        self._resp = call(iter(self._q.get, None))

    def __call__(self, msg: "pb.T2WRequest") -> np.ndarray:
        self._q.put(msg)
        return _unpcm(next(self._resp).tts_audio)

    def close(self):
        self._q.put(None)


class RemoteEngine:
    """Engine facade whose LM and token2wav run on remote workers. Reuses
    CosyVoice2Engine.tts (hop growth 25->100, lookahead gate, prompt pad,
    finalize pass) by subclass-free delegation: the cadence method is bound
    from the engine class; only the two device entry points are replaced."""

    # the cadence generator and squelch helpers are borrowed from the engine
    from cosyvoice_tpu.runtime.engine import CosyVoice2Engine as _E

    _squelch = _E._squelch
    next_hop = _E.next_hop
    silent_tokens: tuple = ()
    max_silent: int = 5
    # the borrowed tts() probes these; the gateway has no local LM/flow so
    # both fast paths stay off
    speculative_first_chunk = False
    incremental_flow = False
    flow_arena0 = 256

    def __init__(
        self,
        llm_channel,
        t2w_channel,
        lm_cfg=None,
        token_hop_len: int = 25,
        pre_lookahead_len: int = 3,
        token_mel_ratio: int = 2,
        seed: int = 1986,
        hop_policy: str = "doubling",
    ):
        from types import SimpleNamespace

        from cosyvoice_tpu.models.llm import LMConfig

        self.lm = SimpleNamespace(cfg=lm_cfg or LMConfig())
        self.llm_channel = llm_channel
        self.t2w_channel = t2w_channel
        self.token_hop_len = token_hop_len
        self.token_max_hop_len = 4 * token_hop_len
        self.stream_scale_factor = 2
        assert hop_policy in ("doubling", "exponential", "time_based"), hop_policy
        self.hop_policy = hop_policy
        self.token_rate = 25
        self.pre_lookahead_len = pre_lookahead_len
        self.token_mel_ratio = token_mel_ratio
        self.seed = seed
        self.scheduler = None
        # the borrowed CosyVoice2Engine.tts records a "first_chunk" stage on
        # self.timer (engine.py); the gateway gets its own StageTimer so that
        # metric exists here too (gateway-side first-chunk, RPC-inclusive)
        from cosyvoice_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()
        self._streams = {}  # id(state) -> _T2WStream
        self._gen_tokens = llm_channel.unary_stream(
            "/cosyvoice_tpu.CosyVoiceLLM/GenerateTokens",
            request_serializer=pb.LLMRequest.SerializeToString,
            response_deserializer=pb.TokenBlock.FromString,
        )
        self._gen_bistream = llm_channel.stream_stream(
            "/cosyvoice_tpu.CosyVoiceLLM/GenerateTokensBistream",
            request_serializer=pb.BistreamRequest.SerializeToString,
            response_deserializer=pb.TokenBlock.FromString,
        )

    # ---- LM via RPC ----
    def _remote_tokens(self, ids, types, min_len, max_len, seed):
        req = pb.LLMRequest(
            ids=np.asarray(ids, np.int32).tobytes(),
            types=np.asarray(types, np.int32).tobytes(),
            min_len=int(min_len), max_len=int(max_len), seed=int(seed),
        )
        for block in self._gen_tokens(req):
            yield _i32(block.speech_tokens)

    def _remote_tokens_bistream(self, text_stream, prompt_text, prompt_speech, seed):
        def reqs():
            yield pb.BistreamRequest(
                prompt_text=np.asarray(prompt_text, np.int32).tobytes(),
                prompt_speech=np.asarray(prompt_speech, np.int32).tobytes(),
                text_chunk=b"", seed=int(seed),
            )
            for chunk in text_stream:
                yield pb.BistreamRequest(text_chunk=np.asarray(chunk, np.int32).tobytes())

        for block in self._gen_bistream(reqs()):
            yield _i32(block.speech_tokens)

    # tts() calls this when given generator text or a plain prompt; we wrap by
    # overriding the call sites: build the token generator up front and pass
    # it through the engine's token_generator hook.
    def tts(self, *args, **kwargs):  # noqa: F811 (intentional override of the bound method)
        from cosyvoice_tpu.models.llm import TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT

        c = self.lm.cfg
        text_tokens = kwargs.get("text_tokens") if "text_tokens" in kwargs else args[0]
        if kwargs.get("token_generator") is None and kwargs.get("source_speech_token") is None:
            seed = self.seed if kwargs.get("rng_seed") is None else kwargs["rng_seed"]
            if hasattr(text_tokens, "__next__"):
                kwargs["token_generator"] = self._squelch(
                    self._remote_tokens_bistream(
                        text_tokens,
                        kwargs["prompt_text_tokens"].astype(np.int32),
                        kwargs["llm_prompt_speech_token"].astype(np.int32),
                        seed,
                    )
                )
                kwargs["text_tokens"] = np.zeros(0, np.int32)
            else:
                text = np.concatenate([kwargs["prompt_text_tokens"], text_tokens]).astype(np.int32)
                psp = kwargs["llm_prompt_speech_token"].astype(np.int32)
                ids = np.concatenate([[c.sos_id], text, [c.task_id], psp]).astype(np.int32)
                types = np.concatenate(
                    [[TYPE_SPECIAL], np.full(len(text), TYPE_TEXT), [TYPE_SPECIAL],
                     np.full(len(psp), TYPE_SPEECH)]
                ).astype(np.int32)
                kwargs["token_generator"] = self._squelch(
                    self._remote_tokens(ids, types, len(text_tokens) * 2, len(text_tokens) * 20, seed)
                )
        # track the streams THIS call opens via a per-call shallow-copy view:
        # the `_opened` list rides in this generator's closure, so cleanup is
        # correct even when successive next() calls land on different threads
        # (FastAPI's iterate_in_threadpool) or when generators interleave on
        # one thread — a thread-local or shared last-key slot would let
        # session A leak or close session B's stream
        import copy as _copy

        view = _copy.copy(self)
        view._opened = []
        gen = RemoteEngine._E.tts(view, *args, **kwargs)
        try:
            yield from gen
        finally:
            for key in view._opened:
                s = self._streams.pop(key, None)
                if s is not None:
                    s.close()

    # ---- token2wav via RPC ----
    def _stream_for(self, state) -> "_T2WStream":
        key = id(state)
        if key not in self._streams:
            self._streams[key] = _T2WStream(self.t2w_channel)
            opened = getattr(self, "_opened", None)
            if opened is not None:
                opened.append(key)
        return self._streams[key]

    def _ctx_fields(self, prompt_token, prompt_feat, embedding, first: bool) -> dict:
        if not first:
            return {}
        return dict(
            prompt_speech_tokens=np.asarray(prompt_token, np.int32).tobytes(),
            prompt_feat=np.asarray(prompt_feat, np.float32).tobytes(),
            prompt_feat_len=int(prompt_feat.shape[1]),
            embedding=np.asarray(embedding, np.float32).tobytes(),
        )

    def token2wav(self, state, tokens, prompt_token, prompt_feat, embedding,
                  token_offset, stream=False, finalize=False, speed=1.0):
        s = self._stream_for(state)
        first = not getattr(state, "_ctx_sent", False)
        msg = pb.T2WRequest(
            speech_tokens=np.asarray(tokens, np.int32).tobytes(),
            token_offset=int(token_offset), stream=bool(stream),
            finalize=bool(finalize), speed=float(speed),
            **self._ctx_fields(prompt_token, prompt_feat, embedding, first),
        )
        state._ctx_sent = True
        return s(msg)

    def synthesize_offline(self, tokens, prompt_token, prompt_feat, embedding, speed: float = 1.0):
        s = _T2WStream(self.t2w_channel)
        try:
            msg = pb.T2WRequest(
                speech_tokens=np.asarray(tokens, np.int32).tobytes(),
                token_offset=0, stream=False, finalize=True, speed=float(speed),
                **self._ctx_fields(prompt_token, prompt_feat, embedding, True),
            )
            return s(msg)
        finally:
            s.close()


# ---------------------------------------------------------------------------
# servers / entry points
# ---------------------------------------------------------------------------


def make_llm_server(lm, lm_params, port: int, max_batch: int = 4, max_conc: int = 8):
    import grpc

    service = LLMService(lm, lm_params, max_batch=max_batch)
    handler = grpc.method_handlers_generic_handler(
        "cosyvoice_tpu.CosyVoiceLLM",
        {
            "GenerateTokens": grpc.unary_stream_rpc_method_handler(
                service.GenerateTokens,
                request_deserializer=pb.LLMRequest.FromString,
                response_serializer=pb.TokenBlock.SerializeToString,
            ),
            "GenerateTokensBistream": grpc.stream_stream_rpc_method_handler(
                service.GenerateTokensBistream,
                request_deserializer=pb.BistreamRequest.FromString,
                response_serializer=pb.TokenBlock.SerializeToString,
            ),
        },
    )
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_conc))
    server.add_generic_rpc_handlers((handler,))
    server.add_insecure_port(f"[::]:{port}")
    return server, service


def make_t2w_server(engine, port: int, max_conc: int = 8):
    import grpc

    service = Token2WavService(engine)
    handler = grpc.method_handlers_generic_handler(
        "cosyvoice_tpu.CosyVoiceToken2Wav",
        {
            "Synthesize": grpc.stream_stream_rpc_method_handler(
                service.Synthesize,
                request_deserializer=pb.T2WRequest.FromString,
                response_serializer=pb.T2WResponse.SerializeToString,
            ),
        },
    )
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_conc))
    server.add_generic_rpc_handlers((handler,))
    server.add_insecure_port(f"[::]:{port}")
    return server, service


def make_gateway_model(model_dir: str, llm_addr: str, t2w_addr: str, hop_policy: str = "doubling"):
    """A CosyVoice2-compatible model whose engine is remote: loads ONLY the
    frontend locally (tokenizer, speech-token extractor, CAM++, mel)."""
    import grpc

    from cosyvoice_tpu.runtime.api import CosyVoice2

    model = CosyVoice2.__new__(CosyVoice2)  # skip heavy __init__
    CosyVoice2._init_frontend_only(model, model_dir)
    model.engine = RemoteEngine(
        grpc.insecure_channel(llm_addr), grpc.insecure_channel(t2w_addr), hop_policy=hop_policy
    )
    return model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("role", choices=["llm", "t2w", "gateway"])
    parser.add_argument("--model_dir", type=str, default="")
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--llm_addr", type=str, default="localhost:50051")
    parser.add_argument("--t2w_addr", type=str, default="localhost:50052")
    parser.add_argument("--max_batch", type=int, default=4)
    parser.add_argument("--hop_policy", type=str, default="doubling",
                        choices=["doubling", "exponential", "time_based"],
                        help="streaming hop-growth policy for the gateway's chunk consumer")
    args = parser.parse_args()

    if args.role == "gateway":
        from cosyvoice_tpu.serving.http_server import make_fastapi_app, make_stdlib_server

        model = make_gateway_model(args.model_dir, args.llm_addr, args.t2w_addr, args.hop_policy)
        try:
            import uvicorn

            uvicorn.run(make_fastapi_app(model), host="0.0.0.0", port=args.port)
        except ImportError:
            logging.info("fastapi/uvicorn unavailable; stdlib http server on :%d", args.port)
            make_stdlib_server(model, port=args.port).serve_forever()
        return

    from cosyvoice_tpu.runtime.api import AutoModel

    api = AutoModel(args.model_dir)
    if args.role == "llm":
        server, _ = make_llm_server(api.engine.lm, api.engine.lm_params, args.port, args.max_batch)
    else:
        server, _ = make_t2w_server(api.engine, args.port)
    server.start()
    logging.info("%s worker listening on :%d", args.role, args.port)
    server.wait_for_termination()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
