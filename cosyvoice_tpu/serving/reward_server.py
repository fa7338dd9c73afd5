"""GRPO reward server — the reference's token2wav+ASR KServe endpoint
(examples/grpo/cosyvoice2/token2wav_asr_server.py: synthesize the rolled-out
speech tokens with the flow+vocoder, transcribe with an ASR model, reward =
1 - CER vs the prompt text; served over HTTP for reward_tts.py clients).

TPU-native equivalent: token2wav runs through the loaded CosyVoice engine;
the ASR stage is pluggable (--asr module:function mapping
``fn(wav: np.ndarray, sample_rate: int) -> str``) since no ASR checkpoint
ships with this image. Protocol is KServe v2, matching the client in
train.grpo.http_reward: POST body {"inputs": [{"name": "TOKENS", ...},
{"name": "TOKEN_LENS", ...}, {"name": "GT", ...}]} ->
{"outputs": [{"name": "REWARD", "data": [r, ...]}]}.

Usage:
  python -m cosyvoice_tpu.serving.reward_server --model_dir DIR \
      --asr mypkg.asr:transcribe [--port 8000]
"""

import argparse
import importlib
import json
import logging
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def edit_distance(a, b) -> int:
    """Levenshtein distance over sequences (the CER core)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def cer(hyp: str, ref: str) -> float:
    """Character error rate with whitespace/punctuation stripped (the
    reference computes pinyin-CER via pypinyin; plain char-CER here — same
    ordering, no pinyin dependency)."""
    norm = lambda s: re.sub(r"[\s\W]+", "", s.lower())  # noqa: E731
    h, r = norm(hyp), norm(ref)
    if not r:
        return 0.0 if not h else 1.0
    return edit_distance(h, r) / len(r)


def make_reward_fn(model, asr_fn):
    from cosyvoice_tpu.runtime.engine import CosyVoiceV1Engine, SessionState, V1SessionState

    spk_dim = model.flow.cfg.spk_embed_dim

    def fn(tokens: np.ndarray, ground_truth: str) -> float:
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        if tokens.size == 0:
            return 0.0
        no_prompt = (np.zeros(0, np.int32), np.zeros((1, 0, 80), np.float32),
                     np.zeros((1, spk_dim), np.float32))
        if isinstance(model.engine, CosyVoiceV1Engine):
            wav = model.engine.token2wav(V1SessionState(), tokens, *no_prompt, finalize=True)
        else:
            wav = model.engine.token2wav(SessionState(), tokens, *no_prompt, token_offset=0, finalize=True)
        hyp = asr_fn(np.asarray(wav).reshape(-1), model.sample_rate)
        return 1.0 - min(cer(hyp, ground_truth), 1.0)

    return fn


def make_server(reward_fn, host: str = "0.0.0.0", port: int = 8000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers.get("Content-Length", 0)) or 0))
            inputs = {i.get("name"): i for i in body.get("inputs", [])}
            toks = np.asarray(inputs["TOKENS"]["data"], np.int32).reshape(inputs["TOKENS"]["shape"])
            gts = inputs["GT"]["data"]
            if "TOKEN_LENS" in inputs:  # batched rollouts are pad-aligned
                lens = np.asarray(inputs["TOKEN_LENS"]["data"], np.int32).reshape(-1)
            else:
                lens = np.full(toks.shape[0], toks.shape[1], np.int32)
            preds = [float(reward_fn(toks[i, : lens[i]], gts[i])) for i in range(toks.shape[0])]
            data = json.dumps(
                {"outputs": [{"name": "REWARD", "shape": [len(preds)], "datatype": "FP32", "data": preds}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            logging.debug(*a)

    return ThreadingHTTPServer((host, port), Handler)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default="")
    parser.add_argument("--asr", required=True, help="module:function -> fn(wav, sr) -> str")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()

    mod, _, fn = args.asr.partition(":")
    asr_fn = getattr(importlib.import_module(mod), fn or "transcribe")

    from cosyvoice_tpu.runtime.api import AutoModel

    model = AutoModel(args.model_dir)
    server = make_server(make_reward_fn(model, asr_fn), args.host, args.port)
    logging.info("reward server on %s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
