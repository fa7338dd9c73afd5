"""Inference frontend: text -> tokens, prompt wav -> (speech tokens, mel,
x-vector), per-mode model_input assembly.

Behavioral port of cosyvoice/cli/frontend.py:30-224 with the native ONNX
sessions replaced by JAX modules (S3Tokenizer, CamPPEmbedding) and the
feature extractors by the XLA ops in cosyvoice_tpu.ops.
"""

import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.frontend.text_normalize import basic_normalize
from cosyvoice_tpu.frontend.tokenizer import get_tokenizer
from cosyvoice_tpu.models.campplus import CamPPEmbedding
from cosyvoice_tpu.models.speech_tokenizer import S3Tokenizer, S3TokenizerConfig
from cosyvoice_tpu.ops.mel import kaldi_fbank, mel_spectrogram, whisper_log_mel
from cosyvoice_tpu.utils.audio_io import load_wav


class CosyVoiceFrontEnd:
    def __init__(
        self,
        tokenizer=None,
        token_path: Optional[str] = None,
        sample_rate: int = 24000,
        token_frame_rate: int = 25,
        spk2info_path: str = "",
        tokenizer_params=None,
        campplus_params=None,
        rng_seed: int = 0,
        version: int = 2,
        s3_cfg: Optional[S3TokenizerConfig] = None,
    ):
        self.tokenizer = tokenizer or get_tokenizer(token_path, version=version)
        self.sample_rate = sample_rate
        self.token_frame_rate = token_frame_rate
        self.speech_tokenizer = S3Tokenizer(s3_cfg or S3TokenizerConfig())
        self.campplus = CamPPEmbedding()
        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        mel0 = jnp.zeros((1, 100, self.speech_tokenizer.cfg.n_mels))
        from cosyvoice_tpu.utils.devices import jit_init

        self.speech_tokenizer_params = tokenizer_params or jit_init(
            self.speech_tokenizer.init, k1, mel0, jnp.asarray([100])
        )
        self.campplus_params = campplus_params or jit_init(
            self.campplus.init, k2, jnp.zeros((1, 100, 80)))
        self.spk2info: Dict[str, dict] = {}
        if spk2info_path and os.path.exists(spk2info_path):
            with open(spk2info_path, "rb") as f:
                self.spk2info = pickle.load(f)
        elif spk2info_path and os.path.exists(spk2info_path[: -len(".pkl")] + ".pt"):
            # migration: the reference caches speakers as a torch pickle
            # (cli/cosyvoice.py:40-53 spk2info.pt); load and convert to numpy
            import torch

            raw = torch.load(spk2info_path[: -len(".pkl")] + ".pt", map_location="cpu")
            self.spk2info = {
                spk: {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in info.items()}
                for spk, info in raw.items()
            }

        self._jit_tokenize = jax.jit(
            lambda p, mel, ml: self.speech_tokenizer.apply(p, mel, ml)
        )
        self._jit_spk = jax.jit(lambda p, f: self.campplus.apply(p, f))
        # anonymous-prompt LRU: serving clients often repeat the same prompt
        # wav without registering a spk id; re-running S3 + CAM++ + two mels
        # per request puts ~4 device round trips on the first-chunk path
        from collections import OrderedDict

        self._prompt_cache: "OrderedDict[tuple, dict]" = OrderedDict()
        self._prompt_cache_max = 16

    # ---------------- extraction ----------------
    def _extract_text_token(self, text) -> np.ndarray:
        """str -> [Lt] int32. A GENERATOR of text pieces (an upstream LLM
        streaming its output, reference cli/frontend.py:78-93) returns a
        generator of per-piece token arrays instead — the engine routes that
        to the bistream decode path."""
        if hasattr(text, "__next__"):
            return self._extract_text_token_generator(text)
        return np.asarray(self.tokenizer.encode(text, allowed_special="all"), np.int32)

    def _extract_text_token_generator(self, text_generator):
        for piece in text_generator:
            toks = np.asarray(self.tokenizer.encode(piece, allowed_special="all"), np.int32)
            if toks.size:
                yield toks

    def _extract_speech_token(self, speech_16k: np.ndarray) -> np.ndarray:
        """speech_16k: [1, L] float32 @16 kHz -> [T_tok] int32 (25 Hz)."""
        assert speech_16k.shape[1] / 16000 <= 30, "do not support audio longer than 30s"
        mel = whisper_log_mel(jnp.asarray(speech_16k), n_mels=self.speech_tokenizer.cfg.n_mels)
        mel = jnp.swapaxes(mel, 1, 2)
        tokens, tok_len = self._jit_tokenize(self.speech_tokenizer_params, mel, jnp.asarray([mel.shape[1]]))
        return np.asarray(tokens[0, : int(tok_len[0])], np.int32)

    def _extract_spk_embedding(self, speech_16k: np.ndarray) -> np.ndarray:
        feat = kaldi_fbank(jnp.asarray(speech_16k[0]), cmn=True)
        emb = self._jit_spk(self.campplus_params, feat[None])
        return np.asarray(emb, np.float32)  # [1, 192]

    def _extract_speech_feat(self, speech_24k: np.ndarray) -> np.ndarray:
        mel = mel_spectrogram(jnp.asarray(speech_24k), sr=self.sample_rate)  # [1, 80, T]
        return np.asarray(jnp.swapaxes(mel, 1, 2), np.float32)  # [1, T, 80]

    # ---------------- text normalize ----------------
    def text_normalize(self, text, split: bool = True):
        if hasattr(text, "__next__"):
            # generator tts_text (bi-streaming input): normalization would
            # need the full text — skip it, one "segment" = the generator
            # (reference cli/frontend.py:128-130)
            return [text] if split else text
        if "<|" in text and "|>" in text:  # ssml passthrough
            return [text] if split else text
        return basic_normalize(text, self.tokenizer.encode, split=split)

    # ---------------- per-mode assembly ----------------
    def _prompt_key(self, prompt_text: str, prompt_wav):
        if isinstance(prompt_wav, str):
            try:
                sig = (prompt_wav, os.path.getmtime(prompt_wav))
            except OSError:
                sig = (prompt_wav, 0.0)
        else:
            import hashlib

            sig = hashlib.blake2b(np.ascontiguousarray(prompt_wav).tobytes(), digest_size=16).hexdigest()
        return (prompt_text, sig)

    def frontend_zero_shot(self, tts_text, prompt_text, prompt_wav, zero_shot_spk_id: str = ""):
        """prompt_wav: path or [1, L] float array at 16 kHz (will be resampled
        internally for the 24 kHz mel)."""
        out = {"text_tokens": self._extract_text_token(tts_text)}
        if zero_shot_spk_id and zero_shot_spk_id in self.spk2info:
            out.update(self.spk2info[zero_shot_spk_id])
            return out
        key = self._prompt_key(prompt_text, prompt_wav)
        info = self._prompt_cache.get(key)
        if info is None:
            # one disk read: load at 16 kHz, resample in memory for the 24 kHz mel
            speech_16k = load_wav(prompt_wav, 16000) if isinstance(prompt_wav, str) else prompt_wav
            speech_24k = _resample(speech_16k, 16000, self.sample_rate)
            speech_feat = self._extract_speech_feat(speech_24k)
            speech_token = self._extract_speech_token(speech_16k)
            if self.sample_rate == 24000:
                # force feat len == 2 * token len (frontend.py:174-178)
                token_len = min(speech_feat.shape[1] // 2, len(speech_token))
                speech_feat = speech_feat[:, : 2 * token_len]
                speech_token = speech_token[:token_len]
            info = dict(
                prompt_text_tokens=self._extract_text_token(prompt_text),
                llm_prompt_speech_token=speech_token,
                flow_prompt_speech_token=speech_token,
                prompt_speech_feat=speech_feat,
                flow_embedding=self._extract_spk_embedding(speech_16k),
            )
            self._prompt_cache[key] = info
            if len(self._prompt_cache) > self._prompt_cache_max:
                self._prompt_cache.popitem(last=False)
        else:
            self._prompt_cache.move_to_end(key)
        out.update(info)
        return out

    def frontend_cross_lingual(self, tts_text, prompt_wav, zero_shot_spk_id: str = ""):
        out = self.frontend_zero_shot(tts_text, "", prompt_wav, zero_shot_spk_id)
        # cross-lingual: no text/speech prompt in the LM (frontend.py:191-198)
        out["prompt_text_tokens"] = np.zeros(0, np.int32)
        out["llm_prompt_speech_token"] = np.zeros(0, np.int32)
        return out

    def frontend_instruct2(self, tts_text, instruct_text, prompt_wav, zero_shot_spk_id: str = ""):
        out = self.frontend_zero_shot(tts_text, instruct_text + "<|endofprompt|>", prompt_wav, zero_shot_spk_id)
        out["llm_prompt_speech_token"] = np.zeros(0, np.int32)
        return out

    def frontend_vc(self, source_speech_16k, prompt_wav):
        # one disk read: load at 16 kHz, resample in memory for the 24 kHz mel
        speech_16k = load_wav(prompt_wav, 16000) if isinstance(prompt_wav, str) else prompt_wav
        speech_24k = _resample(speech_16k, 16000, self.sample_rate)
        src = load_wav(source_speech_16k, 16000) if isinstance(source_speech_16k, str) else source_speech_16k
        return dict(
            source_speech_token=self._extract_speech_token(src),
            flow_prompt_speech_token=self._extract_speech_token(speech_16k),
            prompt_speech_feat=self._extract_speech_feat(speech_24k),
            flow_embedding=self._extract_spk_embedding(speech_16k),
        )

    # ---------------- speaker cache ----------------
    def add_zero_shot_spk(self, prompt_text, prompt_wav, spk_id: str) -> bool:
        info = self.frontend_zero_shot("", prompt_text, prompt_wav, "")
        info.pop("text_tokens")
        self.spk2info[spk_id] = info
        return True

    def save_spkinfo(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.spk2info, f)


def _resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(target_sr, sr).limit_denominator(1000)
    return resample_poly(x[0], frac.numerator, frac.denominator).astype(np.float32)[None]
