"""Hermetic template ASR: nearest-mel-template word decoder.

The corpus words are harmonic tones with distinct pitch/formant, so a
synthesized utterance is transcribed by slicing its mel spectrogram into
fixed 0.24 s word slots and nearest-neighbor matching each slot against the
per-(speaker, unit) templates written by corpus.make_corpus. This plays the
SenseVoice role of the reference's WER harness
(examples/grpo/cosyvoice2/scripts/compute_wer.sh) without any external model.

Plug into tools.eval_quality via --asr examples.hermetic.template_asr:transcribe
with HERMETIC_DIR pointing at the corpus dir (for templates.npz).
"""

import os

import numpy as np

_CACHE = {}


def _templates():
    d = os.environ["HERMETIC_DIR"]
    if d not in _CACHE:
        z = np.load(os.path.join(d, "templates.npz"))
        t = z["templates"]  # [K, F, 80]
        flat = t.reshape(t.shape[0], -1)
        _CACHE[d] = (
            flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-9),
            z["units"],
            int(z["unit_frames"]),
        )
    return _CACHE[d]


def transcribe(wav: np.ndarray, sr: int) -> str:
    from examples.hermetic.corpus import UNITS
    from cosyvoice_tpu.ops.mel import mel_spectrogram

    temps, units, F = _templates()
    mel = np.asarray(mel_spectrogram(np.asarray(wav, np.float32).reshape(1, -1), sr=sr))[0].T  # [T, 80]
    n_slots = max(1, int(round(mel.shape[0] / F)))
    words = []
    for s in range(n_slots):
        sl = mel[s * F : (s + 1) * F]
        if sl.shape[0] < F:  # pad the ragged tail with the mel floor
            sl = np.pad(sl, ((0, F - sl.shape[0]), (0, 0)), constant_values=sl.min())
        v = sl.reshape(-1)
        v = v / (np.linalg.norm(v) + 1e-9)
        words.append(UNITS[int(units[int(np.argmax(temps @ v))])])
    return " ".join(words) + "."
