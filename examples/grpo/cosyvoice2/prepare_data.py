"""Build the GRPO prompt jsonl from kaldi-style `text` files (the reference
recipe's prepare_data.py role: one {"text": ...} prompt per training
utterance for the RL rollouts).

Usage: python prepare_data.py --text data/train/text [data/dev/text ...] --out prompts.jsonl
"""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", nargs="+", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--max_chars", type=int, default=200)
    args = parser.parse_args()

    n = 0
    with open(args.out, "w") as out:
        for path in args.text:
            for line in open(path):
                parts = line.strip().split(maxsplit=1)
                if len(parts) != 2 or len(parts[1]) > args.max_chars:
                    continue
                out.write(json.dumps({"utt": parts[0], "text": parts[1]}, ensure_ascii=False) + "\n")
                n += 1
    print(f"{args.out}: {n} prompts")


if __name__ == "__main__":
    main()
