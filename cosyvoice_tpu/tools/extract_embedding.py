"""Extract CAM++ x-vectors for a wav.scp (replaces tools/extract_embedding.py:24-50)."""

import argparse
import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", required=True, help="kaldi-style dir with wav.scp and utt2spk")
    parser.add_argument("--num_thread", type=int, default=8)
    parser.add_argument("--model_dir", default="", help="model dir with converted "
                        "campplus.msgpack (the reference's --onnx_path campplus.onnx role)")
    args = parser.parse_args()

    from cosyvoice_tpu.runtime.api import load_frontend
    from cosyvoice_tpu.utils.audio_io import load_wav

    fe = load_frontend(args.model_dir)
    utt2wav = dict(line.split(maxsplit=1) for line in open(f"{args.dir}/wav.scp").read().splitlines())
    utt2spk = dict(line.split(maxsplit=1) for line in open(f"{args.dir}/utt2spk").read().splitlines())

    def one(utt):
        wav = load_wav(utt2wav[utt].strip(), 16000)
        return utt, fe._extract_spk_embedding(wav)[0]

    with ThreadPoolExecutor(max_workers=args.num_thread) as ex:
        utt2embedding = dict(ex.map(one, utt2wav))

    spk2embedding = {}
    for utt, emb in utt2embedding.items():
        spk2embedding.setdefault(utt2spk[utt].strip(), []).append(emb)
    spk2embedding = {k: np.mean(v, axis=0) for k, v in spk2embedding.items()}

    with open(f"{args.dir}/utt2embedding.pkl", "wb") as f:
        pickle.dump(utt2embedding, f)
    with open(f"{args.dir}/spk2embedding.pkl", "wb") as f:
        pickle.dump(spk2embedding, f)
    print(f"wrote {len(utt2embedding)} utt embeddings, {len(spk2embedding)} spk embeddings")


if __name__ == "__main__":
    main()
