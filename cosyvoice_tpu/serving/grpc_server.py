"""gRPC serving (behavioral port of runtime/python/grpc/server.py:34-90).

One `Inference` RPC with a oneof {sft, zero_shot, cross_lingual, instruct}
request, streaming `Response{tts_audio}` int16 PCM chunks. The service is
registered through grpc's generic handlers (no grpc_python_plugin in this
image), with protoc-generated message classes.
"""

import argparse
import io
import logging
import os
import sys
from concurrent import futures

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import cosyvoice_pb2 as pb  # noqa: E402

import grpc  # noqa: E402


def _pcm(wav: np.ndarray) -> bytes:
    return (np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes()


def _wav_from_bytes(raw: bytes) -> np.ndarray:
    """int16 PCM bytes at 16 kHz -> [1, L] float32 (client convention)."""
    return (np.frombuffer(raw, np.int16).astype(np.float32) / 32767.0)[None, :]


class CosyVoiceService:
    def __init__(self, model):
        self.model = model

    def Inference(self, request: pb.Request, context):
        which = request.WhichOneof("request")
        if which == "sft_request":
            r = request.sft_request
            out = self.model.inference_sft(r.tts_text, r.spk_id)
        elif which == "zero_shot_request":
            r = request.zero_shot_request
            out = self.model.inference_zero_shot(r.tts_text, r.prompt_text, _wav_from_bytes(r.prompt_audio))
        elif which == "cross_lingual_request":
            r = request.cross_lingual_request
            out = self.model.inference_cross_lingual(r.tts_text, _wav_from_bytes(r.prompt_audio))
        elif which == "instruct_request":
            r = request.instruct_request
            out = self.model.inference_instruct(r.tts_text, r.spk_id, r.instruct_text)
        else:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, f"unknown request {which}")
            return
        logging.info("grpc inference request: %s", which)
        for chunk in out:
            yield pb.Response(tts_audio=_pcm(chunk["tts_speech"]))


def make_server(model, port: int = 50000, max_conc: int = 4):
    service = CosyVoiceService(model)
    rpc = grpc.stream_stream_rpc_method_handler  # placeholder; real handler below
    handler = grpc.method_handlers_generic_handler(
        "cosyvoice_tpu.CosyVoice",
        {
            "Inference": grpc.unary_stream_rpc_method_handler(
                service.Inference,
                request_deserializer=pb.Request.FromString,
                response_serializer=pb.Response.SerializeToString,
            )
        },
    )
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_conc))
    server.add_generic_rpc_handlers((handler,))
    server.add_insecure_port(f"[::]:{port}")
    return server


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=50000)
    parser.add_argument("--model_dir", type=str, default="")
    parser.add_argument("--max_conc", type=int, default=4)
    parser.add_argument("--hop_policy", type=str, default="",
                        choices=["", "doubling", "exponential", "time_based"],
                        help="streaming hop growth (v2/v3; default: model-dir config or doubling)")
    parser.add_argument("--compile_cache", type=str, default="",
                        help="persistent XLA compile-cache dir (default: repo-local host-keyed)")
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
    server = make_server(model, args.port, args.max_conc)
    server.start()
    logging.info("grpc server listening on :%d", args.port)
    server.wait_for_termination()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
