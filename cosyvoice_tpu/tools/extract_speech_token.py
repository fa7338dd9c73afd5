"""Extract S3 speech tokens for a wav.scp (replaces tools/extract_speech_token.py:26-49)."""

import argparse
import pickle


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", required=True)
    parser.add_argument("--model_dir", default="", help="model dir with converted "
                        "speech_tokenizer.msgpack + config.json frontend.s3 section "
                        "(the reference's --onnx_path speech_tokenizer_v2.onnx role)")
    args = parser.parse_args()

    from cosyvoice_tpu.runtime.api import load_frontend
    from cosyvoice_tpu.utils.audio_io import load_wav

    fe = load_frontend(args.model_dir)
    utt2wav = dict(line.split(maxsplit=1) for line in open(f"{args.dir}/wav.scp").read().splitlines())
    utt2token = {}
    for utt, path in utt2wav.items():
        wav = load_wav(path.strip(), 16000)
        if wav.shape[1] / 16000 > 30:
            print(f"skip {utt}: longer than 30s")
            continue
        utt2token[utt] = fe._extract_speech_token(wav).tolist()
    with open(f"{args.dir}/utt2speech_token.pkl", "wb") as f:
        pickle.dump(utt2token, f)
    print(f"wrote {len(utt2token)} token sequences")


if __name__ == "__main__":
    main()
