"""Synthetic overfit corpus for hermetic quality evaluation.

The reference's quality contract is SEED-eval CER / speaker-similarity over
released checkpoints (/root/reference/README.md:62-81). Real checkpoints do
not exist in this image, so this corpus provides the hermetic stand-in: a
procedurally generated "language" whose ground truth is exact —

 - 8 spoken "words", each a 0.24 s harmonic tone with a word-specific pitch
   and formant boost (trivially separable on a mel spectrogram);
 - 2 "speakers" (different f0 register and spectral tilt) so CAM++ x-vector
   similarity measures something real;
 - every utterance is textA + textB composed of two 4-word segments, with
   the training text being the byte-exact concatenation "textA" + "textB"
   (segments end in "." and join with no space, so the byte-fallback
   tokenizer guarantees encode(textA+textB) == encode(textA)+encode(textB)
   and zero-shot eval input [sos][prompt_text+text][task][prompt tokens] is
   EXACTLY a training-sequence prefix);
 - speech tokens are extracted PER SEGMENT and concatenated, so the eval
   prompt's S3 tokens (computed from the segment-A wav alone) match the
   training prefix bit-for-bit.

Ground truth per eval item: segment-B wav -> reference speech tokens, mel,
and text for token-recovery / mel-correlation / CER scoring.
"""

import json
import os
import pickle

import numpy as np

SR = 24000
UNIT_SEC = 0.24
UNITS = ["ba", "du", "ki", "mo", "ta", "re", "su", "no"]
SEG_WORDS = 4
N_SPK = 2
MEL_HOP = 480  # 50 fps at 24 kHz -> 12 mel frames per unit
UNIT_FRAMES = int(UNIT_SEC * SR / MEL_HOP)


def unit_wave(unit: int, spk: int) -> np.ndarray:
    """One word's waveform: harmonic complex, word-specific f0 + formant."""
    n = int(UNIT_SEC * SR)
    t = np.arange(n) / SR
    f0 = 110.0 * (2.0 ** (unit / 5.0)) * (1.0 if spk == 0 else 1.3)
    tilt = 1.3 if spk == 0 else 0.9
    boost_h = 2 + (unit % 4)  # word-specific "formant" harmonic
    rng = np.random.default_rng(1000 + unit)  # fixed per-unit phases
    x = np.zeros(n)
    for h in range(1, 9):
        amp = h ** (-tilt) * (3.0 if h == boost_h else 1.0)
        x += amp * np.sin(2 * np.pi * h * f0 * t + rng.uniform(0, 2 * np.pi))
    # 10 ms raised-cosine edges kill clicks at unit boundaries
    edge = int(0.01 * SR)
    env = np.ones(n)
    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(edge) / edge)
    env[:edge], env[-edge:] = ramp, ramp[::-1]
    x *= env
    return (0.3 * x / np.max(np.abs(x))).astype(np.float32)


def segment(words, spk: int) -> np.ndarray:
    return np.concatenate([unit_wave(int(w), spk) for w in words])


def seg_text(words) -> str:
    return " ".join(UNITS[int(w)] for w in words) + "."


def make_corpus(out_dir: str, n_utts: int = 32, seed: int = 0):
    """Writes wavs + kaldi-style files + eval files + ASR mel templates.

    Layout:
      out_dir/wavs/utt{i}.wav            full utterance (segA+segB)
      out_dir/wavs/utt{i}_A.wav, _B.wav  the two segments
      out_dir/{wav.scp,text,utt2spk}     training metadata
      out_dir/eval/{wav.scp,text,tts_text.json,ref.scp}
      out_dir/templates.npz              per-(speaker,unit) mel templates
    """
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(out_dir, "wavs")
    eval_dir = os.path.join(out_dir, "eval")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(eval_dir, exist_ok=True)

    from cosyvoice_tpu.utils.audio_io import save_wav

    scp, texts, utt2spk = [], [], []
    e_scp, e_text, e_ref, e_tts = [], [], [], {}
    meta = {}
    for i in range(n_utts):
        spk = i % N_SPK
        utt = f"utt{i:03d}"
        wa = rng.integers(0, len(UNITS), SEG_WORDS)
        wb = rng.integers(0, len(UNITS), SEG_WORDS)
        seg_a, seg_b = segment(wa, spk), segment(wb, spk)
        pa, pb, pf = (os.path.join(wav_dir, f"{utt}{s}.wav") for s in ("_A", "_B", ""))
        save_wav(pa, seg_a, SR)
        save_wav(pb, seg_b, SR)
        save_wav(pf, np.concatenate([seg_a, seg_b]), SR)
        ta, tb = seg_text(wa), seg_text(wb)
        scp.append(f"{utt} {pf}")
        texts.append(f"{utt} {ta}{tb}")  # byte-exact concat (no joiner space)
        utt2spk.append(f"{utt} spk{spk}")
        e_scp.append(f"{utt} {pa}")
        e_text.append(f"{utt} {ta}")
        e_tts[utt] = [tb]
        e_ref.append(f"{utt}_0 {pb}")
        meta[utt] = {"spk": spk, "text_a": ta, "text_b": tb}

    for name, lines in (("wav.scp", scp), ("text", texts), ("utt2spk", utt2spk)):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    for name, lines in (("wav.scp", e_scp), ("text", e_text), ("ref.scp", e_ref)):
        with open(os.path.join(eval_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(os.path.join(eval_dir, "tts_text.json"), "w") as f:
        json.dump(e_tts, f, indent=1)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)

    # mel templates for the hermetic template ASR: mel of each (spk, unit)
    from cosyvoice_tpu.ops.mel import mel_spectrogram

    temps = []
    for spk in range(N_SPK):
        for u in range(len(UNITS)):
            m = np.asarray(mel_spectrogram(unit_wave(u, spk)[None], sr=SR))[0]  # [80, T]
            temps.append(m[:, :UNIT_FRAMES].T)  # [UNIT_FRAMES, 80]
    np.savez(
        os.path.join(out_dir, "templates.npz"),
        templates=np.stack(temps),  # [N_SPK*len(UNITS), UNIT_FRAMES, 80]
        units=np.array([u for _ in range(N_SPK) for u in range(len(UNITS))]),
        unit_frames=UNIT_FRAMES,
    )
    return out_dir


def _augment_variants(w: np.ndarray, rng: np.random.Generator):
    """Distortion family approximating vocoder artifacts: the re-tokenization
    metric (eval_quality token_recovery) feeds SYNTHESIZED audio back through
    the S3 tokenizer, so its codes must be invariant to gain changes, noise
    floors and spectral tilt — the supervised head alone cannot buy that
    invariance if the encoder only ever saw clean tones."""
    out = [w]
    out.append((0.2 * w).astype(np.float32))  # quiet (whisper-mel floor shifts)
    snr = 10 ** (rng.uniform(15.0, 25.0) / 20.0)
    noise = rng.standard_normal(len(w)).astype(np.float32) * (np.std(w) / snr)
    out.append((w + noise).astype(np.float32))
    tilt = np.empty_like(w)  # +6 dB/oct-ish: x[n] - 0.5 x[n-1]
    tilt[0] = w[0]
    tilt[1:] = w[1:] - 0.5 * w[:-1]
    out.append(tilt.astype(np.float32))
    lp = np.empty_like(w)  # gentle lowpass: y[n] = 0.6 y[n-1] + 0.4 x[n]
    acc = 0.0
    for i in range(len(w)):  # short wavs; host-side loop is fine
        acc = 0.6 * acc + 0.4 * w[i]
        lp[i] = acc
    out.append(lp.astype(np.float32))
    return out


def train_tokenizer(fe, wavs_16k, frame_labels, steps: int = 500, lr: float = 3e-3,
                    seed: int = 0, augment: bool = True):
    """Supervised S3-tokenizer training, in place — the hermetic counterpart
    of the ASR supervision the reference tokenizer received (speech_tokenizer
    v2 is distilled from a supervised ASR encoder).

    A RANDOM-init tokenizer collapses the FSQ code space (measured: 3 codes
    carry 83% of corpus frames and the 8 corpus words map to near-identical
    sequences), destroying the content channel the hermetic quality metrics
    depend on; a linear LDA re-fit of fsq_proj alone cannot undo the encoder's
    attention mixing (21/48 in-context word id). So train the REAL
    S3Tokenizer trunk end-to-end with a per-frame word-classification head on
    the noise-regularized tanh(fsq_proj) bottleneck: after training, the
    rounded FSQ codes carry word identity by construction. The head is
    discarded; every downstream consumer keeps the production S3 graph.

    wavs_16k: float32 [L] arrays @16 kHz; frame_labels: per-wav int arrays at
    the 25 Hz token rate (-1 = unsupervised frame, e.g. word boundaries).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from cosyvoice_tpu.ops.mel import whisper_log_mel

    mod = fe.speech_tokenizer
    c = mod.cfg
    aug_rng = np.random.default_rng(4242)
    mels, labs = [], []
    for w16, fl in zip(wavs_16k, frame_labels):
        w = np.asarray(w16, np.float32).reshape(-1)
        for var in (_augment_variants(w, aug_rng) if augment else [w]):
            mel = jnp.swapaxes(
                whisper_log_mel(jnp.asarray(var).reshape(1, -1), n_mels=c.n_mels), 1, 2
            )
            mels.append(np.asarray(mel[0], np.float32))
            labs.append(np.asarray(fl, np.int32))
    T = max(m.shape[0] for m in mels)
    n_cls = int(max(l.max() for l in labs)) + 1
    T_tok = (T + 1) // 2
    if c.token_rate_div > 1:
        T_tok = (T_tok + c.token_rate_div - 1) // c.token_rate_div
    X = np.zeros((len(mels), T, c.n_mels), np.float32)
    Y = np.full((len(mels), T_tok), -1, np.int32)
    L = np.zeros((len(mels),), np.int32)
    for i, (m, l) in enumerate(zip(mels, labs)):
        X[i, : m.shape[0]] = m
        L[i] = m.shape[0]
        Y[i, : min(T_tok, len(l))] = l[:T_tok]

    half = jnp.asarray((np.asarray(c.fsq_levels) - 1) / 2.0, jnp.float32)
    key = jax.random.PRNGKey(seed)
    k_head, key = jax.random.split(key)
    params = {
        "s3": fe.speech_tokenizer_params["params"],
        "head": {
            "w": 0.1 * jax.random.normal(k_head, (len(c.fsq_levels), n_cls), jnp.float32),
            "b": jnp.zeros((n_cls,), jnp.float32),
        },
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    Xj, Yj, Lj = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(L)

    def loss_fn(p, rng):
        _, inter = mod.apply({"params": p["s3"]}, Xj, Lj, capture_intermediates=True)
        proj = inter["intermediates"]["fsq_proj"]["__call__"][0]  # [B, T_tok, k]
        z = jnp.tanh(proj)
        # quantization-aware regularization: half-a-bin uniform noise in the
        # FSQ-scaled space so classes separate beyond the rounding width
        z = z + jax.random.uniform(rng, z.shape, minval=-0.5, maxval=0.5) / half
        logits = z @ p["head"]["w"] + p["head"]["b"]
        mask = (Yj >= 0).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, jnp.maximum(Yj, 0))
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def step(p, o, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, rng)
        updates, o = opt.update(g, o)
        return optax.apply_updates(p, updates), o, loss

    loss = None
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    fe.speech_tokenizer_params = {"params": params["s3"]}
    return float(loss)


def prep_features(data_dir: str, model_dir: str):
    """utt2embedding.pkl + utt2speech_token.pkl with the model dir's frontend.

    Embeddings: CAM++ of the full utterance at 16 kHz (what
    tools/extract_embedding.py computes). Speech tokens: PER-SEGMENT S3
    tokenization concatenated — the eval-time prompt (segment A alone)
    reproduces the training prefix exactly; whole-utterance tokenization
    would let segment-B attention shift segment-A codes.
    """
    from scipy.signal import resample_poly

    from cosyvoice_tpu.runtime.api import load_frontend
    from cosyvoice_tpu.utils.audio_io import load_wav

    fe = load_frontend(model_dir)
    utt2wav = dict(
        line.split(maxsplit=1) for line in open(f"{data_dir}/wav.scp").read().splitlines()
    )
    emb, tok = {}, {}
    for utt, path in utt2wav.items():
        path = path.strip()
        full_16k = load_wav(path, 16000)
        emb[utt] = np.asarray(fe._extract_spk_embedding(full_16k)[0], np.float32)
        seg_toks = []
        for seg in ("_A", "_B"):
            seg_16k = load_wav(path.replace(".wav", f"{seg}.wav"), 16000)
            seg_toks.append(fe._extract_speech_token(seg_16k))
        tok[utt] = np.concatenate(seg_toks).astype(np.int32)
    with open(f"{data_dir}/utt2embedding.pkl", "wb") as f:
        pickle.dump(emb, f)
    with open(f"{data_dir}/utt2speech_token.pkl", "wb") as f:
        pickle.dump({k: v.tolist() for k, v in tok.items()}, f)
    return emb, tok
