"""LibriTTS → kaldi-style data dir (wav.scp / text / utt2spk / spk2utt).

The reference recipe's data-prep stage (examples/libritts/cosyvoice2/local/
prepare_data.py): LibriTTS stores wavs as <spk>/<chapter>/<utt>.wav with a
sidecar <utt>.normalized.txt transcript; speaker id is the first '_' field
of the utt name.

Usage: python prepare_data.py --src_dir LibriTTS/train-clean-100 --des_dir data/train-clean-100
"""

import argparse
import glob
import logging
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_dir", required=True)
    parser.add_argument("--des_dir", required=True)
    parser.add_argument("--instruct", default="", help="optional instruct text applied to every utt")
    args = parser.parse_args()

    os.makedirs(args.des_dir, exist_ok=True)
    utt2wav, utt2text, utt2spk, spk2utt = {}, {}, {}, {}
    for wav in sorted(glob.glob(os.path.join(args.src_dir, "*", "*", "*.wav"))):
        txt = wav.replace(".wav", ".normalized.txt")
        if not os.path.exists(txt):
            logging.warning("missing transcript for %s", wav)
            continue
        with open(txt) as f:
            content = f.read().strip().replace("\n", " ")
        utt = os.path.splitext(os.path.basename(wav))[0]
        spk = utt.split("_")[0]
        utt2wav[utt] = wav
        utt2text[utt] = content
        utt2spk[utt] = spk
        spk2utt.setdefault(spk, []).append(utt)

    def write_map(name, mapping, join=" "):
        with open(os.path.join(args.des_dir, name), "w") as f:
            for k, v in mapping.items():
                f.write(f"{k} {v if isinstance(v, str) else join.join(v)}\n")

    write_map("wav.scp", utt2wav)
    write_map("text", utt2text)
    write_map("utt2spk", utt2spk)
    write_map("spk2utt", spk2utt)
    if args.instruct:
        write_map("instruct", {k: args.instruct for k in utt2text})
    print(f"{args.des_dir}: {len(utt2wav)} utts, {len(spk2utt)} speakers")


if __name__ == "__main__":
    main()
