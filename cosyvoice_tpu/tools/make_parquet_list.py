"""Pack utterances into parquet shards (replaces tools/make_parquet_list.py:26-56)."""

import argparse
import os
import pickle

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_dir", required=True)
    parser.add_argument("--des_dir", required=True)
    parser.add_argument("--num_utts_per_parquet", type=int, default=1000)
    parser.add_argument("--sample_rate", type=int, default=24000)
    parser.add_argument("--dpo", action="store_true",
                        help="attach reject_speech_token from <src_dir>_reject/utt2speech_token.pkl "
                        "(reference tools/make_parquet_list.py:49,103)")
    args = parser.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cosyvoice_tpu.utils.audio_io import load_wav

    d = args.src_dir
    utt2wav = dict(line.split(maxsplit=1) for line in open(f"{d}/wav.scp").read().splitlines())
    utt2text = dict(line.split(maxsplit=1) for line in open(f"{d}/text").read().splitlines())
    with open(f"{d}/utt2embedding.pkl", "rb") as f:
        utt2embedding = pickle.load(f)
    with open(f"{d}/utt2speech_token.pkl", "rb") as f:
        utt2token = pickle.load(f)
    utt2instruct = None
    if os.path.exists(f"{d}/instruct"):
        utt2instruct = dict(line.split(maxsplit=1) for line in open(f"{d}/instruct").read().splitlines())
    utt2reject = {}
    if args.dpo:
        with open(f"{d}_reject/utt2speech_token.pkl", "rb") as f:
            utt2reject = pickle.load(f)

    os.makedirs(args.des_dir, exist_ok=True)
    utts = [u for u in utt2wav if u in utt2text and u in utt2embedding and u in utt2token]
    if utt2instruct is not None:  # partial instruct files must not KeyError mid-shard
        utts = [u for u in utts if u in utt2instruct]
    if args.dpo:
        utts = [u for u in utts if u in utt2reject]
    paths = []
    for shard_i in range(0, len(utts), args.num_utts_per_parquet):
        shard = utts[shard_i : shard_i + args.num_utts_per_parquet]
        rows = {"utt": [], "text": [], "audio": [], "sample_rate": [], "utt_embedding": [], "speech_token": []}
        if utt2instruct is not None:
            rows["instruct"] = []
        if args.dpo:
            rows["reject_speech_token"] = []
        for u in shard:
            wav = load_wav(utt2wav[u].strip(), args.sample_rate)[0]
            rows["utt"].append(u)
            rows["text"].append(utt2text[u].strip())
            rows["audio"].append(wav.tolist())
            rows["sample_rate"].append(args.sample_rate)
            rows["utt_embedding"].append(np.asarray(utt2embedding[u], np.float32).tolist())
            rows["speech_token"].append(list(utt2token[u]))
            if utt2instruct is not None:
                rows["instruct"].append(utt2instruct[u].strip())
            if args.dpo:
                rows["reject_speech_token"].append(list(utt2reject[u]))
        path = os.path.join(args.des_dir, f"parquet_{shard_i // args.num_utts_per_parquet:09d}.tar.parquet")
        pq.write_table(pa.table(rows), path)
        paths.append(path)
        print(f"wrote {path} ({len(shard)} utts)")

    with open(os.path.join(args.des_dir, "data.list"), "w") as f:
        f.write("\n".join(paths) + "\n")


if __name__ == "__main__":
    main()
