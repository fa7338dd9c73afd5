"""gRPC client (behavioral port of runtime/python/grpc/client.py)."""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import cosyvoice_pb2 as pb  # noqa: E402

import grpc  # noqa: E402


def inference(host: str, port: int, mode: str, **kwargs):
    """Returns np.int16 waveform assembled from the streamed chunks."""
    channel = grpc.insecure_channel(f"{host}:{port}")
    req = pb.Request()
    if mode == "sft":
        req.sft_request.spk_id = kwargs["spk_id"]
        req.sft_request.tts_text = kwargs["tts_text"]
    elif mode == "zero_shot":
        req.zero_shot_request.tts_text = kwargs["tts_text"]
        req.zero_shot_request.prompt_text = kwargs["prompt_text"]
        req.zero_shot_request.prompt_audio = kwargs["prompt_audio"]
    elif mode == "cross_lingual":
        req.cross_lingual_request.tts_text = kwargs["tts_text"]
        req.cross_lingual_request.prompt_audio = kwargs["prompt_audio"]
    elif mode == "instruct":
        req.instruct_request.tts_text = kwargs["tts_text"]
        req.instruct_request.spk_id = kwargs["spk_id"]
        req.instruct_request.instruct_text = kwargs["instruct_text"]
    else:
        raise ValueError(mode)

    stub = channel.unary_stream(
        "/cosyvoice_tpu.CosyVoice/Inference",
        request_serializer=pb.Request.SerializeToString,
        response_deserializer=pb.Response.FromString,
    )
    chunks = [np.frombuffer(resp.tts_audio, np.int16) for resp in stub(req)]
    return np.concatenate(chunks) if chunks else np.zeros(0, np.int16)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--mode", default="zero_shot", choices=["sft", "zero_shot", "cross_lingual", "instruct"])
    parser.add_argument("--tts_text", default="Hello, this is a test.")
    parser.add_argument("--prompt_text", default="A prompt.")
    parser.add_argument("--prompt_wav", default="")
    parser.add_argument("--spk_id", default="")
    parser.add_argument("--instruct_text", default="")
    parser.add_argument("--out", default="out.wav")
    args = parser.parse_args()

    prompt_audio = b""
    if args.prompt_wav:
        from cosyvoice_tpu.utils.audio_io import load_wav

        wav = load_wav(args.prompt_wav, 16000)
        prompt_audio = (np.clip(wav[0], -1, 1) * 32767).astype(np.int16).tobytes()

    pcm = inference(
        args.host, args.port, args.mode,
        tts_text=args.tts_text, prompt_text=args.prompt_text, prompt_audio=prompt_audio,
        spk_id=args.spk_id, instruct_text=args.instruct_text,
    )
    from cosyvoice_tpu.utils.audio_io import save_wav

    save_wav(args.out, pcm.astype(np.float32) / 32767.0, 24000)
    logging.info("wrote %s (%d samples)", args.out, len(pcm))


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
