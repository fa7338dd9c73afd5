"""Generate DPO reject samples by re-synthesizing each utterance with the
reference (SFT) model — the role of the reference recipe's
examples/libritts/cosyvoice2/local/prepare_reject_sample.py: zero-shot
re-synthesis of each utt's text with the utt itself as the prompt; the
generated audio becomes the rejected sample (extract its speech tokens with
tools.extract_speech_token into data/<x>_reject afterwards).

Usage: python prepare_reject_sample.py --src_dir data/train-clean-100 \
    --des_dir data/train-clean-100_reject --ref_model pretrained/CosyVoice2-0.5B
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_dir", required=True)
    parser.add_argument("--des_dir", required=True)
    parser.add_argument("--ref_model", required=True)
    args = parser.parse_args()

    from cosyvoice_tpu.runtime.api import AutoModel
    from cosyvoice_tpu.utils.audio_io import load_wav, save_wav

    model = AutoModel(args.ref_model)
    utt2wav = dict(line.split(maxsplit=1) for line in open(f"{args.src_dir}/wav.scp").read().splitlines())
    utt2text = dict(line.split(maxsplit=1) for line in open(f"{args.src_dir}/text").read().splitlines())

    os.makedirs(os.path.join(args.des_dir, "wav"), exist_ok=True)
    with open(os.path.join(args.des_dir, "wav.scp"), "w") as scp:
        for utt, wav_path in utt2wav.items():
            if utt not in utt2text:
                continue
            prompt_16k = load_wav(wav_path.strip(), 16000)
            chunks = [
                out["tts_speech"]
                for out in model.inference_zero_shot(
                    utt2text[utt].strip(), utt2text[utt].strip(), prompt_16k, stream=False, text_frontend=False
                )
            ]
            speech = np.concatenate(chunks, axis=-1)
            out_path = os.path.abspath(os.path.join(args.des_dir, "wav", f"{utt}.wav"))
            save_wav(out_path, speech, model.sample_rate)
            scp.write(f"{utt} {out_path}\n")
    # text/utt2spk mirror the source dir (tokens come from the generated wavs)
    for name in ("text", "utt2spk", "spk2utt"):
        src = os.path.join(args.src_dir, name)
        if os.path.exists(src):
            with open(src) as f, open(os.path.join(args.des_dir, name), "w") as g:
                g.write(f.read())


if __name__ == "__main__":
    main()
