"""MAGICDATA-read (zh) → kaldi-style data dir.

The reference recipe's zh data-prep (examples/magicdata-read/cosyvoice/local/
prepare_data.py): transcripts live in one TRANS.txt TSV (header line, then
wav \t speaker \t text rows, wavs under <src_dir>/<spk>/<wav>), with [FIL]/
[SPK] noise markers stripped.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_dir", required=True)
    parser.add_argument("--des_dir", required=True)
    args = parser.parse_args()

    os.makedirs(args.des_dir, exist_ok=True)
    utt2wav, utt2text, utt2spk, spk2utt = {}, {}, {}, {}
    with open(os.path.join(args.src_dir, "TRANS.txt")) as f:
        rows = [line.split("\t") for line in f.read().splitlines()[1:]]
    for wav, spk, content in rows:
        wav, spk = wav.strip(), spk.strip()
        content = content.strip().replace("[FIL]", "").replace("[SPK]", "")
        path = os.path.join(args.src_dir, spk, wav)
        if not os.path.exists(path):
            continue
        utt = os.path.splitext(os.path.basename(wav))[0]
        utt2wav[utt] = path
        utt2text[utt] = content
        utt2spk[utt] = spk
        spk2utt.setdefault(spk, []).append(utt)

    for name, mapping in (("wav.scp", utt2wav), ("text", utt2text), ("utt2spk", utt2spk)):
        with open(os.path.join(args.des_dir, name), "w") as f:
            for k, v in mapping.items():
                f.write(f"{k} {v}\n")
    with open(os.path.join(args.des_dir, "spk2utt"), "w") as f:
        for k, v in spk2utt.items():
            f.write(f"{k} {' '.join(v)}\n")
    print(f"{args.des_dir}: {len(utt2wav)} utts, {len(spk2utt)} speakers")


if __name__ == "__main__":
    main()
