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
QUALITY_r*.json artifacts — the asserted thresholds are run.py's own
default bar (cer <= 0.5, recovery >= 0.25, mel_corr >= 0.8, ss >= 0.5 —
evidence-backed with margin; the aspirational stretch bar 0.25/0.6/0.9 is
recorded per-metric in the artifact). The pipeline is seeded end-to-end;
the round-4 artifact measured cer 0.39 / recovery 0.45 / mel_corr 0.87 /
ss 0.95, the round-5 double-budget run 0.28 / 0.33 / 0.896 / 0.95, over
16 eval utterances. ~40-60 min on a 1-core host.
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
