"""HTTP client (behavioral port of runtime/python/fastapi/client.py)."""

import argparse
import base64
import http.client
import json

import numpy as np


def request(host: str, port: int, endpoint: str, body: dict, timeout: float = 600.0) -> np.ndarray:
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    conn.request("POST", f"/{endpoint}", json.dumps(body))
    resp = conn.getresponse()
    assert resp.status == 200, f"{resp.status}: {resp.read()[:200]}"
    return np.frombuffer(resp.read(), np.int16)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--mode", default="zero_shot",
                        choices=["sft", "zero_shot", "cross_lingual", "instruct", "instruct2"])
    parser.add_argument("--tts_text", default="Hello, this is a test.")
    parser.add_argument("--prompt_text", default="A prompt.")
    parser.add_argument("--prompt_wav", default="")
    parser.add_argument("--spk_id", default="")
    parser.add_argument("--instruct_text", default="")
    parser.add_argument("--out", default="out.wav")
    args = parser.parse_args()

    body = {"tts_text": args.tts_text}
    if args.prompt_wav:
        from cosyvoice_tpu.utils.audio_io import load_wav

        wav = load_wav(args.prompt_wav, 16000)
        body["prompt_audio_b64"] = base64.b64encode(
            (np.clip(wav[0], -1, 1) * 32767).astype(np.int16).tobytes()
        ).decode()
    if args.mode in ("sft", "instruct"):
        body["spk_id"] = args.spk_id
    if args.mode == "zero_shot":
        body["prompt_text"] = args.prompt_text
    if args.mode in ("instruct", "instruct2"):
        body["instruct_text"] = args.instruct_text

    pcm = request(args.host, args.port, f"inference_{args.mode}", body)
    from cosyvoice_tpu.utils.audio_io import save_wav

    save_wav(args.out, pcm.astype(np.float32) / 32767.0, 24000)
    print(f"wrote {args.out} ({len(pcm) / 24000:.2f}s)")


if __name__ == "__main__":
    main()
