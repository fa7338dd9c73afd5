"""Quality evaluation: CER and speaker similarity over a tts_text.json set —
the in-repo counterpart of the reference's external SEED eval
(README.md:62-81 reports test-zh CER / SS; the GRPO recipe computes WER via
scripts/compute_wer.sh with SenseVoice).

For each (utt, texts) in tts_text.json (the recipe format,
examples/libritts/cosyvoice2/tts_text.json) and a prompt wav.scp + text:
 - synthesize with inference_zero_shot
 - speaker similarity = cosine(CAM++ x-vector(prompt), x-vector(synth)) —
   fully in-repo (models/campplus.py), the SS metric column
 - CER vs the input text via a pluggable ASR hook (--asr module:function,
   ``fn(wav, sr) -> str``); skipped when no ASR is given

Prints one JSON line: {"n": ..., "speaker_similarity": mean, "cer": mean|null}.

Usage:
  python -m cosyvoice_tpu.tools.eval_quality --model_dir DIR \
      --tts_text tts_text.json --prompt_scp data/test/wav.scp \
      --prompt_text data/test/text [--asr mypkg.asr:transcribe] [--out_dir wavs]
"""

import argparse
import importlib
import json
import os

import numpy as np


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default="")
    parser.add_argument("--tts_text", required=True)
    parser.add_argument("--prompt_scp", required=True, help="utt -> prompt wav path")
    parser.add_argument("--prompt_text", required=True, help="utt -> prompt transcript")
    parser.add_argument("--asr", default="", help="module:function -> fn(wav, sr) -> str")
    parser.add_argument("--out_dir", default="", help="optionally save synthesized wavs")
    parser.add_argument("--max_utts", type=int, default=0)
    parser.add_argument(
        "--ref_scp", default="",
        help="'{utt}_{i} wav-path' ground-truth wavs per tts text; enables the "
        "hermetic proxies: token_recovery (re-tokenize the synth audio with the "
        "model's own S3 tokenizer, compare against the ground truth's tokens) "
        "and mel_corr (Pearson correlation of the log-mels)",
    )
    args = parser.parse_args()

    from cosyvoice_tpu.runtime.api import AutoModel
    from cosyvoice_tpu.serving.reward_server import cer
    from cosyvoice_tpu.utils.audio_io import load_wav, save_wav

    asr_fn = None
    if args.asr:
        mod, _, fn = args.asr.partition(":")
        asr_fn = getattr(importlib.import_module(mod), fn or "transcribe")

    model = AutoModel(args.model_dir)
    tts_text = json.load(open(args.tts_text))
    utt2wav = dict(line.split(maxsplit=1) for line in open(args.prompt_scp).read().splitlines())
    utt2text = dict(line.split(maxsplit=1) for line in open(args.prompt_text).read().splitlines())
    ref_scp = (
        dict(line.split(maxsplit=1) for line in open(args.ref_scp).read().splitlines())
        if args.ref_scp
        else {}
    )
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    sims, cers, recov, mcorr, n = [], [], [], [], 0
    for utt, texts in tts_text.items():
        if utt not in utt2wav or utt not in utt2text:
            continue
        prompt_16k = load_wav(utt2wav[utt].strip(), 16000)
        prompt_emb = model.frontend._extract_spk_embedding(prompt_16k)[0]
        for i, text in enumerate(texts):
            chunks = [
                out["tts_speech"]
                for out in model.inference_zero_shot(text, utt2text[utt].strip(), prompt_16k, stream=False)
            ]
            wav = np.concatenate(chunks, axis=-1)
            if args.out_dir:
                save_wav(os.path.join(args.out_dir, f"{utt}_{i}.wav"), wav, model.sample_rate)
            # resample synth to 16k for the x-vector front-end
            from scipy.signal import resample_poly

            synth_16k = resample_poly(wav.reshape(-1), 16000, model.sample_rate).astype(np.float32)
            synth_emb = model.frontend._extract_spk_embedding(synth_16k.reshape(1, -1))[0]
            sims.append(
                float(
                    np.dot(prompt_emb, synth_emb)
                    / (np.linalg.norm(prompt_emb) * np.linalg.norm(synth_emb) + 1e-9)
                )
            )
            if asr_fn is not None:
                hyp = asr_fn(wav.reshape(-1), model.sample_rate)
                cers.append(cer(hyp, text))
            ref_path = ref_scp.get(f"{utt}_{i}", "").strip()
            if ref_path:
                ref_24k = load_wav(ref_path, model.sample_rate)
                ref_16k = resample_poly(ref_24k.reshape(-1), 16000, model.sample_rate).astype(np.float32)
                # (a) speech-token recovery: the model's own S3 tokenizer must
                # read the SAME codes off the synthesized audio as off the
                # ground truth (the strongest hermetic intelligibility proxy)
                t_syn = model.frontend._extract_speech_token(synth_16k.reshape(1, -1))
                t_ref = model.frontend._extract_speech_token(ref_16k.reshape(1, -1))
                L = min(len(t_syn), len(t_ref))
                recov.append(float(np.mean(t_syn[:L] == t_ref[:L])) if L else 0.0)
                # (b) log-mel Pearson correlation over the overlapping frames
                m_syn = model.frontend._extract_speech_feat(wav.reshape(1, -1))[0]
                m_ref = model.frontend._extract_speech_feat(ref_24k)[0]
                F = min(m_syn.shape[0], m_ref.shape[0])
                a, b = m_syn[:F].reshape(-1), m_ref[:F].reshape(-1)
                a, b = a - a.mean(), b - b.mean()
                mcorr.append(float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)))
            n += 1
            if args.max_utts and n >= args.max_utts:
                break
        if args.max_utts and n >= args.max_utts:
            break

    print(json.dumps({
        "n": n,
        "speaker_similarity": float(np.mean(sims)) if sims else None,
        "cer": float(np.mean(cers)) if cers else None,
        "token_recovery": float(np.mean(recov)) if recov else None,
        "mel_corr": float(np.mean(mcorr)) if mcorr else None,
    }))


if __name__ == "__main__":
    main()
