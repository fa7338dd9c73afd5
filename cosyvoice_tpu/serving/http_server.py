"""HTTP serving (behavioral port of runtime/python/fastapi/server.py:40-95).

Endpoints (same names as the reference):
  /inference_sft, /inference_zero_shot, /inference_cross_lingual,
  /inference_instruct, /inference_instruct2
each streaming raw int16 PCM chunks.

When `fastapi`+`uvicorn` are installed the FastAPI app is used verbatim;
otherwise a dependency-free stdlib http.server fallback serves the same
endpoints with JSON bodies ({"tts_text": ..., "prompt_text": ...,
"prompt_audio_b64": <base64 int16 pcm @16k>}) and chunked transfer encoding.
"""

import base64
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _pcm(wav: np.ndarray) -> bytes:
    return (np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes()


def _wav_from_b64(b64: str) -> np.ndarray:
    raw = base64.b64decode(b64)
    return (np.frombuffer(raw, np.int16).astype(np.float32) / 32767.0)[None, :]


def _metrics(model) -> dict:
    """Structured serving metrics (SURVEY §5.1/§5.5 — the reference has only
    ad-hoc per-yield RTF logs): request counters + per-stage wall-time
    percentiles from the engine's StageTimer."""
    out = {"requests": dict(_REQUEST_COUNTS), "audio_seconds": _AUDIO_SECONDS[0]}
    timer = getattr(getattr(model, "engine", None), "timer", None)
    if timer is not None:
        out["stages"] = timer.summary()
    return out


_REQUEST_COUNTS: dict = {}
_AUDIO_SECONDS = [0.0]
_METRICS_LOCK = threading.Lock()  # handler threads update these concurrently


def _reset_metrics(model) -> dict:
    """POST /metrics/reset — clear counters and the engine's StageTimer so a
    benchmark window starts clean (warmup/compile entries otherwise pollute
    the percentiles forever; the reference's perf client has no server-side
    stages at all, so it never faces this)."""
    with _METRICS_LOCK:
        _REQUEST_COUNTS.clear()
        _AUDIO_SECONDS[0] = 0.0
    timer = getattr(getattr(model, "engine", None), "timer", None)
    if timer is not None:
        timer.reset()
    return {"ok": True}


def _count(endpoint: str):
    with _METRICS_LOCK:
        _REQUEST_COUNTS[endpoint] = _REQUEST_COUNTS.get(endpoint, 0) + 1


def _add_audio(seconds: float):
    with _METRICS_LOCK:
        _AUDIO_SECONDS[0] += seconds


def _truthy(v) -> bool:
    """Multipart form values arrive as strings: 'false'/'0' must not enable
    streaming the way bool('false') would."""
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "on")
    return bool(v)


def _dispatch(model, endpoint: str, body: dict):
    stream = _truthy(body.get("stream", False))
    if endpoint == "inference_sft":
        return model.inference_sft(body["tts_text"], body["spk_id"], stream=stream)
    if endpoint == "inference_zero_shot":
        return model.inference_zero_shot(
            body["tts_text"], body.get("prompt_text", ""), _wav_from_b64(body["prompt_audio_b64"]),
            stream=stream,
        )
    if endpoint == "inference_cross_lingual":
        return model.inference_cross_lingual(
            body["tts_text"], _wav_from_b64(body["prompt_audio_b64"]), stream=stream
        )
    if endpoint == "inference_instruct":
        return model.inference_instruct(body["tts_text"], body["spk_id"], body["instruct_text"], stream=stream)
    if endpoint == "inference_instruct2":
        return model.inference_instruct2(
            body["tts_text"], body["instruct_text"], _wav_from_b64(body["prompt_audio_b64"]),
            stream=stream,
        )
    raise KeyError(endpoint)


def make_stdlib_server(model, host: str = "0.0.0.0", port: int = 50000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            path = self.path.split("?")[0].strip("/")
            if path == "metrics":
                payload, ctype = json.dumps(_metrics(model)).encode(), "application/json"
            elif path == "":
                from cosyvoice_tpu.serving.web_page import render

                payload, ctype = render(getattr(model, "sample_rate", 24000)), "text/html; charset=utf-8"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):  # noqa: N802
            endpoint = self.path.strip("/")
            if endpoint == "metrics/reset":
                # drain the request body so a keep-alive connection's stream
                # stays framed if protocol_version is ever bumped to HTTP/1.1
                self.rfile.read(int(self.headers.get("Content-Length", 0) or 0))
                payload = json.dumps(_reset_metrics(model)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                gen = _dispatch(model, endpoint, body)
            except Exception as e:  # noqa: BLE001
                self.send_response(400)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            _count(endpoint)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            sr = getattr(model, "sample_rate", 24000)
            for out in gen:
                _add_audio(out["tts_speech"].shape[1] / sr)
                chunk = _pcm(out["tts_speech"])
                self.wfile.write(f"{len(chunk):x}\r\n".encode())
                self.wfile.write(chunk)
                self.wfile.write(b"\r\n")
            self.wfile.write(b"0\r\n\r\n")

        def log_message(self, fmt, *args):
            logging.info("http: " + fmt, *args)

    return ThreadingHTTPServer((host, port), Handler)


def make_fastapi_app(model):
    from fastapi import FastAPI, Request
    from fastapi.responses import HTMLResponse, StreamingResponse

    app = FastAPI()

    def stream(gen, endpoint: str):
        _count(endpoint)
        sr = getattr(model, "sample_rate", 24000)

        def body():
            for out in gen:
                _add_audio(out["tts_speech"].shape[1] / sr)
                yield _pcm(out["tts_speech"])

        return StreamingResponse(body())

    @app.get("/metrics")
    async def metrics():
        return _metrics(model)

    @app.post("/metrics/reset")
    async def metrics_reset():
        return _reset_metrics(model)

    @app.get("/")
    async def index():
        from cosyvoice_tpu.serving.web_page import render

        return HTMLResponse(render(getattr(model, "sample_rate", 24000)))

    async def handle(request: Request, endpoint: str):
        """Both protocols: reference-style multipart form with a `prompt_wav`
        file (runtime/python/fastapi/server.py:40-95) and the JSON body used
        by the stdlib fallback and the built-in web page. Client errors
        (bad JSON, missing fields) map to 400, like the stdlib server."""
        from fastapi.responses import JSONResponse

        try:
            if request.headers.get("content-type", "").startswith("application/json"):
                body = dict(await request.json())
            else:
                form = await request.form()
                body = {k: v for k, v in form.items() if isinstance(v, str)}
                up = form.get("prompt_wav")
                if up is not None and not isinstance(up, str):
                    raw = await up.read()
                    body["prompt_audio_b64"] = base64.b64encode(raw).decode()
            gen = _dispatch(model, endpoint, body)
        except Exception as e:  # noqa: BLE001 — report the bad request, not a 500
            return JSONResponse({"error": str(e)}, status_code=400)
        return stream(gen, endpoint)

    for ep in ("inference_sft", "inference_zero_shot", "inference_cross_lingual",
               "inference_instruct", "inference_instruct2"):
        def _make(ep=ep):
            async def route(request: Request):
                return await handle(request, ep)

            return route

        app.post(f"/{ep}")(_make())

    return app


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--model_dir", type=str, default="")
    parser.add_argument("--max_batch", type=int, default=0,
                        help=">0: continuous batching — concurrent requests share one batched LM decode loop")
    parser.add_argument("--compile_cache", type=str, default="",
                        help="persistent XLA compile-cache dir (default: repo-local host-keyed)")
    parser.add_argument("--hop_policy", type=str, default="",
                        choices=["", "doubling", "exponential", "time_based"],
                        help="streaming hop growth (v2/v3; default: model-dir config or doubling)")
    parser.add_argument("--top_p", type=float, default=None,
                        help="decode nucleus top_p (Triton convention: 0.95; default RAS 0.8)")
    parser.add_argument("--top_k", type=int, default=None,
                        help="decode top_k (Triton convention: 50; default RAS 25)")
    parser.add_argument("--temperature", type=float, default=None,
                        help="decode softmax temperature (Triton convention: 0.8; default 1.0)")
    parser.add_argument("--repetition_penalty", type=float, default=None,
                        help="CTRL-style repetition penalty over prompt+generated speech tokens "
                             "(Triton convention: 1.1; default 1.0 = off)")
    args = parser.parse_args()

    from cosyvoice_tpu.utils.compile_cache import enable_persistent_cache

    cache = enable_persistent_cache(args.compile_cache)
    if cache:
        logging.info("persistent compile cache: %s", cache)

    from cosyvoice_tpu.runtime.api import AutoModel

    model = AutoModel(args.model_dir, **({"hop_policy": args.hop_policy} if args.hop_policy else {}))
    if any(v is not None for v in (args.top_p, args.top_k, args.temperature, args.repetition_penalty)):
        model.set_sampling(top_p=args.top_p, top_k=args.top_k, temperature=args.temperature,
                           repetition_penalty=args.repetition_penalty)
        logging.info("sampling overrides applied: %s", model.lm.cfg)
    if args.max_batch > 0:
        model.enable_continuous_batching(max_batch=args.max_batch)
    try:
        import uvicorn

        uvicorn.run(make_fastapi_app(model), host="0.0.0.0", port=args.port)
    except ImportError:
        logging.info("fastapi/uvicorn unavailable; stdlib http server on :%d", args.port)
        make_stdlib_server(model, port=args.port).serve_forever()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
