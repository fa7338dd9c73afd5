"""Stage-isolation diagnostics for the hermetic quality pipeline.

Runs AFTER examples/hermetic/run.py has populated a --work dir, and answers
"which stage breaks the round trip?" by scoring each link separately:

  A. LM token fidelity: engine-sampled (RAS) and greedy (top_k=1) decode vs
     the ground-truth segment-B speech tokens (exact frame match + lengths).
  B. t2w round trip: synthesize from GROUND-TRUTH tokens (LM bypassed),
     re-tokenize with the model's own S3 tokenizer, score recovery + CER.
  C. vocoder-only round trip: HiFT on the ground-truth mel (flow bypassed),
     re-tokenize + CER.
  D. full path (LM -> flow -> HiFT): the pipeline the quality numbers score.

Usage: python -m examples.hermetic.diag --work /tmp/hermetic_r4 [--n 6]
"""

import argparse
import dataclasses
import json
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--n", type=int, default=6)
    args = ap.parse_args()
    sys.path.insert(0, REPO)

    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()

    from scipy.signal import resample_poly

    from cosyvoice_tpu.runtime.api import AutoModel
    from cosyvoice_tpu.serving.reward_server import cer
    from cosyvoice_tpu.utils.audio_io import load_wav
    from examples.hermetic import template_asr

    work = os.path.abspath(args.work)
    model_dir = os.path.join(work, "model")
    data_dir = os.path.join(work, "data")
    eval_dir = os.path.join(data_dir, "eval")
    os.environ["HERMETIC_DIR"] = data_dir

    model = AutoModel(model_dir)
    eng = model.engine
    fe = model.frontend
    sr = model.sample_rate

    meta = json.load(open(os.path.join(data_dir, "meta.json")))
    tok_all = pickle.load(open(os.path.join(data_dir, "utt2speech_token.pkl"), "rb"))
    utt2prompt = dict(
        line.split(maxsplit=1) for line in open(os.path.join(eval_dir, "wav.scp")).read().splitlines()
    )
    ref_scp = dict(
        line.split(maxsplit=1) for line in open(os.path.join(eval_dir, "ref.scp")).read().splitlines()
    )

    def retok(wav_24k):
        w16 = resample_poly(np.asarray(wav_24k).reshape(-1), 16000, sr).astype(np.float32)
        return fe._extract_speech_token(w16.reshape(1, -1))

    def score(wav, t_ref, text):
        t_syn = retok(wav)
        L = min(len(t_syn), len(t_ref))
        rec = float(np.mean(np.asarray(t_syn[:L]) == np.asarray(t_ref[:L]))) if L else 0.0
        hyp = template_asr.transcribe(np.asarray(wav).reshape(-1), sr)
        return rec, cer(hyp, text), hyp, len(t_syn)

    rows = []
    for k, (utt, prompt_path) in enumerate(utt2prompt.items()):
        if k >= args.n:
            break
        m = meta[utt]
        text_b = m["text_b"]
        gt = np.asarray(tok_all[utt], np.int32)
        gt_b = gt[len(gt) // 2 :]  # per-segment extraction: second half is seg B
        prompt_16k = load_wav(prompt_path.strip(), 16000)
        ref_24k = load_wav(ref_scp[f"{utt}_0"].strip(), sr)
        t_ref = retok(ref_24k)  # re-tokenized GT audio (what eval compares to)

        # shared frontend assembly (zero-shot mode)
        mi = fe.frontend_zero_shot(text_b, m["text_a"], prompt_16k)

        # --- A. LM fidelity ---
        import jax

        from cosyvoice_tpu.models.llm import TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT

        out = {}
        lm, lp = eng.lm, eng.lm_params
        c = lm.cfg
        text_ids = np.concatenate([mi["prompt_text_tokens"], mi["text_tokens"]]).astype(np.int32)
        ids = np.concatenate(
            [[c.sos_id], text_ids, [c.task_id], mi["llm_prompt_speech_token"]]
        ).astype(np.int32)
        types = np.concatenate([
            [TYPE_SPECIAL], np.full(len(text_ids), TYPE_TEXT), [TYPE_SPECIAL],
            np.full(len(mi["llm_prompt_speech_token"]), TYPE_SPEECH),
        ]).astype(np.int32)
        mn, mx = 2 * len(mi["text_tokens"]), 20 * len(mi["text_tokens"])
        toks = []
        for blk in lm.generate(lp, ids, types, jax.random.PRNGKey(1986), mn, mx):
            toks.extend(blk.tolist())
        out["ras_toks"] = np.asarray(toks, np.int32)

        g_lm = type(lm)(dataclasses.replace(c, top_k=1, top_p=1e-6, tau_r=2.0))
        toks = []
        for blk in g_lm.generate(lp, ids, types, jax.random.PRNGKey(0), mn, mx):
            toks.extend(blk.tolist())
        out["greedy_toks"] = np.asarray(toks, np.int32)

        def tokmatch(t):
            L = min(len(t), len(gt_b))
            return float(np.mean(t[:L] == gt_b[:L])) if L else 0.0

        # --- B/C/D waveforms ---
        from cosyvoice_tpu.runtime.engine import SessionState

        wav_gt_tok = eng.token2wav(
            SessionState(), gt_b, mi["flow_prompt_speech_token"], mi["prompt_speech_feat"],
            mi["flow_embedding"], token_offset=0, stream=False, finalize=True,
        )
        # C: vocoder on ground-truth mel
        mel_ref = fe._extract_speech_feat(ref_24k)  # [1, T, 80]
        import jax.numpy as jnp

        wav_gt_mel = np.asarray(eng._vocode(np.asarray(mel_ref), np.zeros((1, 0), np.float32),
                                            jax.random.PRNGKey(3))[0])
        # D: full path
        chunks = [o["tts_speech"] for o in model.inference_zero_shot(
            text_b, m["text_a"], prompt_16k, stream=False)]
        wav_full = np.concatenate(chunks, axis=-1)

        rB = score(wav_gt_tok, t_ref, text_b)
        rC = score(wav_gt_mel, t_ref, text_b)
        rD = score(wav_full, t_ref, text_b)
        gt_vs_tref = float(np.mean(gt_b[: min(len(gt_b), len(t_ref))] ==
                                   np.asarray(t_ref[: min(len(gt_b), len(t_ref))])))
        rows.append({
            "utt": utt,
            "text_b": text_b,
            "len_gt_b": len(gt_b), "len_t_ref": len(t_ref),
            "gtB_vs_reftok": round(gt_vs_tref, 3),
            "ras_len": len(out["ras_toks"]), "ras_match": round(tokmatch(out["ras_toks"]), 3),
            "greedy_len": len(out["greedy_toks"]), "greedy_match": round(tokmatch(out["greedy_toks"]), 3),
            "B_gt_tok": {"recov": round(rB[0], 3), "cer": round(rB[1], 3), "hyp": rB[2], "n_tok": rB[3]},
            "C_gt_mel": {"recov": round(rC[0], 3), "cer": round(rC[1], 3), "hyp": rC[2], "n_tok": rC[3]},
            "D_full": {"recov": round(rD[0], 3), "cer": round(rD[1], 3), "hyp": rD[2], "n_tok": rD[3]},
        })
        print(json.dumps(rows[-1]), flush=True)

    def agg(fn):
        return round(float(np.mean([fn(r) for r in rows])), 3)

    print(json.dumps({
        "n": len(rows),
        "gtB_vs_reftok": agg(lambda r: r["gtB_vs_reftok"]),
        "ras_match": agg(lambda r: r["ras_match"]),
        "greedy_match": agg(lambda r: r["greedy_match"]),
        "B_recov": agg(lambda r: r["B_gt_tok"]["recov"]), "B_cer": agg(lambda r: r["B_gt_tok"]["cer"]),
        "C_recov": agg(lambda r: r["C_gt_mel"]["recov"]), "C_cer": agg(lambda r: r["C_gt_mel"]["cer"]),
        "D_recov": agg(lambda r: r["D_full"]["recov"]), "D_cer": agg(lambda r: r["D_full"]["cer"]),
    }))


if __name__ == "__main__":
    main()
