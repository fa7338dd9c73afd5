"""Hermetic quality evidence: overfit the tiny v2 stack, score the synthesis.

The reference's quality bar is SEED CER / speaker similarity over released
checkpoints (/root/reference/README.md:62-81) — unavailable in-image, so
this is the hermetic proxy: train S3 tokenizer + LM + flow + HiFT through
the production bin/train.py recipes on the synthetic corpus
(examples/hermetic/corpus.py), synthesize zero-shot through the public
engine, and score CER (template ASR), S3 speech-token recovery, log-mel
correlation, and CAM++ x-vector similarity.

This test runs examples/hermetic/run.py at its DEFAULT (full) configuration
with --check, i.e. the exact command that produces the repo-root
QUALITY_r*.json artifacts — the asserted thresholds are run.py's own bar
(cer <= 0.6, recovery >= 0.3, mel_corr >= 0.5, ss >= 0.5), not a separate
miniature calibration. The pipeline is seeded end-to-end; the round-4
artifact measured cer 0.39 / recovery 0.45 / mel_corr 0.87 / ss 0.95 over
16 eval utterances, leaving wide margins. ~37 min on a 1-core host.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_hermetic_quality_pipeline(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "examples.hermetic.run", "--work", str(tmp_path),
         "--check", "--out_json", str(tmp_path / "quality.json")],
        cwd=REPO, capture_output=True, text=True, timeout=5400,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-4000:]
    m = json.loads((tmp_path / "quality.json").read_text())
    assert m["thresholds_passed"] is True, m
    assert m["n"] >= 16, m
