"""Serving benchmark client — the role of the reference's Triton perf client
(runtime/triton_trtllm/client_grpc.py: dataset-driven concurrency sweep with
latency/RTF stats, README.Cosyvoice2.Unet.md:63-122).

Drives the HTTP server (stdlib JSON endpoints or fastapi) with N concurrent
zero-shot requests and reports per-request first-chunk latency, total
latency, audio seconds, and RTF percentiles as one JSON line per concurrency
level.

Usage:
  python -m cosyvoice_tpu.tools.bench_client --host 127.0.0.1 --port 50000 \
      --concurrency 1,2,4 --n_requests 8 --text "..." [--stream]
"""

import argparse
import base64
import http.client
import json
import threading
import time

import numpy as np


def _percentiles(xs):
    xs = sorted(xs)
    if not xs:
        return {}
    p = lambda q: xs[min(int(q * len(xs)), len(xs) - 1)]  # noqa: E731
    return {"p50": round(p(0.50), 4), "p90": round(p(0.90), 4), "max": round(xs[-1], 4)}


def one_request(host, port, endpoint, body, sample_rate, chunk_hook=None):
    """Returns (first_chunk_s, total_s, audio_s)."""
    conn = http.client.HTTPConnection(host, port, timeout=600)
    t0 = time.time()
    conn.request("POST", f"/{endpoint}", json.dumps(body))
    resp = conn.getresponse()
    assert resp.status == 200, f"HTTP {resp.status}: {resp.read()[:200]!r}"
    first = None
    n_bytes = 0
    while True:
        chunk = resp.read(65536)
        if not chunk:
            break
        if first is None:
            first = time.time() - t0
        n_bytes += len(chunk)
        if chunk_hook:
            chunk_hook(chunk)
    total = time.time() - t0
    audio_s = n_bytes / 2 / sample_rate  # int16 PCM
    return first if first is not None else total, total, audio_s


def _server_stages(host, port):
    """Fetch the engine's StageTimer summary from /metrics (server-side,
    non-tunnel accounting: `first_chunk` there is measured inside the engine,
    after the HTTP/frontend hop and before the client socket)."""
    try:
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        if resp.status != 200:
            return None
        return json.loads(resp.read()).get("stages")
    except Exception:
        return None


def sweep(host, port, endpoint, body, concurrency_levels, n_requests, sample_rate):
    results = []
    for conc in concurrency_levels:
        firsts, totals, audios = [], [], []
        lock = threading.Lock()
        errors = []

        def worker(k):
            try:
                f, t, a = one_request(host, port, endpoint, body, sample_rate)
                with lock:
                    firsts.append(f)
                    totals.append(t)
                    audios.append(a)
            except Exception as e:  # pragma: no cover - diagnostics path
                with lock:
                    errors.append(str(e))

        t0 = time.time()
        done = 0
        while done < n_requests:
            batch = min(conc, n_requests - done)
            threads = [threading.Thread(target=worker, args=(done + i,)) for i in range(batch)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            done += batch
        wall = time.time() - t0

        total_audio = sum(audios)
        line = {
            "concurrency": conc,
            "n_requests": len(totals),
            "errors": len(errors),
            "first_chunk_s": _percentiles(firsts),
            "latency_s": _percentiles(totals),
            "audio_s_total": round(total_audio, 2),
            "rtf": round(wall / total_audio, 4) if total_audio else None,
            "throughput_audio_s_per_s": round(total_audio / wall, 2) if wall else None,
        }
        if errors:
            line["first_error"] = errors[0][:200]
        stages = _server_stages(host, port)
        if stages:
            line["server_stages"] = stages
        results.append(line)
        print(json.dumps(line), flush=True)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--endpoint", default="inference_zero_shot")
    parser.add_argument("--text", default="收到好友从远方寄来的生日礼物，那份意外的惊喜与深深的祝福让我心中充满了甜蜜的快乐。")
    parser.add_argument("--prompt_text", default="希望你以后能够做的比我还好呦。")
    parser.add_argument("--prompt_wav", default="", help="raw int16 pcm @16k file; zeros if empty")
    parser.add_argument("--concurrency", default="1,2,4")
    parser.add_argument("--n_requests", type=int, default=8)
    parser.add_argument("--sample_rate", type=int, default=24000)
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    if args.prompt_wav:
        with open(args.prompt_wav, "rb") as f:
            pcm = f.read()
    else:
        pcm = np.zeros(16000, np.int16).tobytes()
    body = {
        "tts_text": args.text,
        "prompt_text": args.prompt_text,
        "prompt_audio_b64": base64.b64encode(pcm).decode(),
        "stream": bool(args.stream),
    }
    levels = [int(x) for x in args.concurrency.split(",") if x]
    sweep(args.host, args.port, args.endpoint, body, levels, args.n_requests, args.sample_rate)


if __name__ == "__main__":
    main()
