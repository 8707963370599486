"""CI-scale EHR quality oracle: composed torch EHRModel vs flax
(EHRModel_token.py:36-247 semantics; full harness in
scripts/run_ehr_oracle.py, results in docs/PARITY_REPORT.json)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.run_ehr_oracle import forward_parity, quality_experiment

torch = pytest.importorskip("torch")


def test_ehr_forward_parity():
    """Converted weights, identical batch -> same patientEncoder forward."""
    r = forward_parity(0, n=64)
    assert r["emb_max_abs_err"] < 1e-5, r
    assert r["logits_max_abs_err"] < 1e-5, r


def test_ehr_quality_parity():
    """Same converted init + batch order + reference recipe both sides:
    without dropout the torch and flax trajectories must coincide — the
    task is actually learned (AUPRC >> chance) and final AUPRC matches."""
    r = quality_experiment(0, epochs=14, dropout=0.0, n=240, lr=3e-3)
    assert r["torch_aupr"] > 0.8, r      # learnable task, actually learned
    assert r["flax_aupr"] > 0.8, r
    assert r["aupr_abs_diff"] < 0.02, r  # trajectories coincide
