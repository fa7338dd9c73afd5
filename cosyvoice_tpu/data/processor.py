"""Host-side streaming data processors (parquet -> padded numpy batches).

Behavioral port of the reference IterableDataset chain
(cosyvoice/dataset/processor.py:31-431): parquet_opener -> tokenize ->
filter -> resample -> compute_fbank (+f0/whisper_fbank/truncate for GAN) ->
parse_embedding -> shuffle -> sort -> dynamic/static batch -> padding.

Everything is a generator over sample dicts; composition happens in
`Dataset` (data/dataset.py). Features are produced with the XLA ops in
cosyvoice_tpu.ops, so the trainer sees exactly the numerics the models
expect.
"""

import random
from typing import Iterable, Iterator, List

import numpy as np

from cosyvoice_tpu.train.losses import IGNORE_ID


def parquet_opener(sources: Iterable[dict]) -> Iterator[dict]:
    """sources yield {'src': path}; emits one dict per row (processor.py:31-52)."""
    import pyarrow.parquet as pq

    for s in sources:
        try:
            table = pq.read_table(s["src"]).to_pydict()
            keys = list(table.keys())
            n = len(table[keys[0]])
            for i in range(n):
                row = {**{k: table[k][i] for k in keys}, **{k: v for k, v in s.items() if k != "src"}}
                if "audio" in row:  # parquet round-trips arrays as lists
                    row["audio"] = np.asarray(row["audio"], np.float32)
                yield row
        except Exception as e:  # noqa: BLE001 — skip bad shards, keep training
            print(f"parquet_opener: failed to open {s['src']}: {e}")


def tokenize(data, tokenizer, allowed_special="all"):
    for sample in data:
        sample["text_token"] = np.asarray(tokenizer.encode(sample["text"], allowed_special=allowed_special), np.int32)
        yield sample


def filter_samples(
    data, max_length=40960, min_length=0, token_max_length=200, token_min_length=1,
    min_output_input_ratio=0.0005, max_output_input_ratio=1.0,
):
    """Length filters in 10ms frames / tokens (processor.py:89-136)."""
    for sample in data:
        dur_frames = sample["audio"].shape[-1] / sample["sample_rate"] * 100
        if not (min_length <= dur_frames <= max_length):
            continue
        nt = len(sample["text_token"])
        if not (token_min_length <= nt <= token_max_length):
            continue
        ratio = nt / dur_frames
        if not (min_output_input_ratio <= ratio <= max_output_input_ratio):
            continue
        yield sample


def resample(data, resample_rate=24000, min_sample_rate=16000):
    from scipy.signal import resample_poly
    from fractions import Fraction

    for sample in data:
        sr = sample["sample_rate"]
        if sr < min_sample_rate:
            continue
        if sr != resample_rate:
            frac = Fraction(resample_rate, sr).limit_denominator(1000)
            sample["audio"] = resample_poly(sample["audio"], frac.numerator, frac.denominator).astype(np.float32)
            sample["sample_rate"] = resample_rate
        peak = np.abs(sample["audio"]).max()
        if peak > 1.0:
            sample["audio"] = sample["audio"] / peak
        yield sample


def truncate(data, truncate_length=24480):
    """Random fixed-length crop for GAN training (processor.py:166-183)."""
    for sample in data:
        wav = sample["audio"]
        if wav.shape[-1] >= truncate_length:
            start = random.randint(0, wav.shape[-1] - truncate_length)
            sample["audio"] = wav[..., start : start + truncate_length]
        else:
            sample["audio"] = np.pad(wav, (0, truncate_length - wav.shape[-1]))
        yield sample


def compute_fbank(data, sample_rate=24000, hop=480, num_frames=0):
    from cosyvoice_tpu.ops.mel import mel_spectrogram

    for sample in data:
        wav = sample["audio"].reshape(1, -1)
        usable = (wav.shape[1] // hop) * hop
        mel = np.asarray(mel_spectrogram(wav[:, :usable], sr=sample_rate, hop=hop))
        sample["speech_feat"] = np.swapaxes(mel[0], 0, 1)  # [T, 80]
        if num_frames and sample["speech_feat"].shape[0] > num_frames:
            sample["speech_feat"] = sample["speech_feat"][:num_frames]
        yield sample


def compute_whisper_fbank(data, num_frames=0):
    """128-mel whisper features for online speech-token extraction."""
    from cosyvoice_tpu.ops.mel import whisper_log_mel

    for sample in data:
        wav16 = sample.get("audio_16k")
        if wav16 is None:
            from fractions import Fraction
            from scipy.signal import resample_poly

            frac = Fraction(16000, sample["sample_rate"]).limit_denominator(1000)
            wav16 = resample_poly(sample["audio"], frac.numerator, frac.denominator).astype(np.float32)
        mel = np.asarray(whisper_log_mel(wav16.reshape(1, -1)))[0]
        sample["whisper_feat"] = np.swapaxes(mel, 0, 1)
        yield sample


def compute_f0(data, sample_rate=24000, hop_size=480):
    """F0 per mel frame via native YIN (csrc/f0_yin.cc) — the pyworld
    harvest/dio+stonemask role in the reference pipeline
    (processor.py:200-222), interpolated to the mel length like the
    reference's F.interpolate postprocess (:221)."""
    from cosyvoice_tpu.ops.f0 import extract_f0

    for sample in data:
        n_frames = sample["speech_feat"].shape[0]
        sample["pitch_feat"] = extract_f0(sample["audio"], sample_rate, hop_size, n_frames)
        yield sample


def parse_embedding(data, normalize=True):
    for sample in data:
        emb = np.asarray(sample["utt_embedding"], np.float32)
        if normalize:
            emb = emb / (np.linalg.norm(emb) + 1e-12)
        sample["embedding"] = emb
        yield sample


def shuffle(data, shuffle_size=1000):
    buf: List[dict] = []
    for sample in data:
        buf.append(sample)
        if len(buf) >= shuffle_size:
            random.shuffle(buf)
            yield from buf
            buf = []
    random.shuffle(buf)
    yield from buf


def sort_by_len(data, sort_size=500):
    buf: List[dict] = []
    for sample in data:
        buf.append(sample)
        if len(buf) >= sort_size:
            buf.sort(key=lambda s: s["speech_feat"].shape[0])
            yield from buf
            buf = []
    buf.sort(key=lambda s: s["speech_feat"].shape[0])
    yield from buf


def batch(data, batch_type="dynamic", batch_size=16, max_frames_in_batch=2000):
    """static: fixed count; dynamic: frame-budget packing (processor.py:340-378)."""
    buf, frames = [], 0
    for sample in data:
        if batch_type == "static":
            buf.append(sample)
            if len(buf) >= batch_size:
                yield buf
                buf = []
        else:
            # budget the PADDED batch size (longest * count), the quantity
            # that actually bounds device memory / compiled shapes
            # (reference processor.py:340-366); data arrives length-sorted
            # so the longest is the max of buf + candidate
            n = sample["speech_feat"].shape[0]
            longest = max(frames, n)  # frames tracks the longest so far
            if buf and longest * (len(buf) + 1) > max_frames_in_batch:
                yield buf
                buf, frames = [], 0
            buf.append(sample)
            frames = max(frames, n)
    if buf:
        yield buf


def _pad2d(arrs, pad_value=0.0):
    T = max(a.shape[0] for a in arrs)
    out = np.full((len(arrs), T) + arrs[0].shape[1:], pad_value, arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
    return out


def padding(data, gan: bool = False, dpo: bool = False):
    """Collate a list-of-samples batch into padded numpy arrays
    (processor.py:380-431)."""
    for samples in data:
        out = {
            "utts": [s.get("utt", "") for s in samples],
            "text_token": _pad2d([s["text_token"] for s in samples]),
            "text_token_len": np.asarray([len(s["text_token"]) for s in samples], np.int32),
            "speech_feat": _pad2d([s["speech_feat"] for s in samples]),
            "speech_feat_len": np.asarray([s["speech_feat"].shape[0] for s in samples], np.int32),
            "embedding": np.stack([s["embedding"] for s in samples]),
        }
        if "speech_token" in samples[0]:
            toks = [np.asarray(s["speech_token"], np.int32) for s in samples]
            out["speech_token"] = _pad2d(toks)
            out["speech_token_len"] = np.asarray([len(t) for t in toks], np.int32)
        if "whisper_feat" in samples[0]:
            out["whisper_feat"] = _pad2d([s["whisper_feat"] for s in samples])
            out["whisper_feat_len"] = np.asarray([s["whisper_feat"].shape[0] for s in samples], np.int32)
        if gan:
            out["speech"] = _pad2d([s["audio"].reshape(-1, 1) for s in samples])[..., 0]
            out["pitch_feat"] = _pad2d([s["pitch_feat"].reshape(-1, 1) for s in samples])[..., 0]
        if dpo and "reject_speech_token" in samples[0]:
            rts = [np.asarray(s["reject_speech_token"], np.int32) for s in samples]
            out["reject_speech_token"] = _pad2d(rts)
            out["reject_speech_token_len"] = np.asarray([len(t) for t in rts], np.int32)
        yield out
