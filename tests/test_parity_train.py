"""Training-DYNAMICS parity vs the composed torch reference, CI scale.

Runs scripts/run_parity_train.py's harness at mini shape: identical
converted weights + identical batches on both sides, then

- step-0: the assembled objective (train_MedTok.py:215-238 — codebook
  VQ+commit through three quantization paths with STE, shared InfoNCE-beta
  *align, specific InfoNCE+lambda*orth) agrees in VALUE and in its full
  BACKWARD pass (per-parameter-group gradients, torch autograd vs jax.grad
  through the real trainer loss_fn);
- N-step trajectory: Adam(lr 1e-4, betas (0.9, 0.95)) + global-norm clip 1.0
  (train_MedTok.py:106, 242-244) stays loss- and parameter-identical.

The production-scale sweep (50 steps, B=64, full 21000-row codebook) is
scripts/run_parity_train.py -> docs/PARITY_REPORT.json "train_dynamics".
"""

import importlib.util
import sys
from pathlib import Path

import pytest

from medtok_tpu.models.torch_oracle import reference_available

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def harness():
    path = Path(__file__).resolve().parents[1] / "scripts/run_parity_train.py"
    spec = importlib.util.spec_from_file_location("run_parity_train", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_parity_train"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def report(harness):
    from medtok_tpu.config import TextEncoderConfig

    torch.set_num_threads(1)
    mini_bert = TextEncoderConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    return harness.run(
        steps=6, batch=16, codebook_size=2100, num_kg_nodes=3000,
        text_len=16, max_nodes=8, max_edges=16, bert=mini_bert,
    )


def test_step0_loss_value_parity(report):
    assert report["step0"]["loss_abs_err"] < 1e-5
    for k, v in report["step0"]["metric_abs_err"].items():
        assert v < 1e-4, f"metric {k} abs err {v}"


def test_step0_gradient_parity(report):
    for group, err in report["step0"]["grad_err_by_group"].items():
        assert err["rel_l2_err"] < 1e-4, f"grad group {group}: {err}"


def test_frozen_bert_grads_are_zero(report):
    # flax stop_gradient (tokenizer_model.py:59) must zero the frozen text
    # encoder exactly, matching requires_grad=False (tokenizer.py:80-81)
    assert report["step0"]["flax_frozen_bert_grad_max"] == 0.0


def test_trajectory_loss_parity(report):
    t = report["trajectory"]
    assert t["loss_max_rel_delta"] < 1e-4, t
    assert t["loss_max_abs_delta"] < 1e-3, t


def test_trajectory_param_drift_parity(report):
    for group, err in report["trajectory"]["param_drift_err_by_group"].items():
        if group.startswith("text_model"):
            assert err["max_abs_err"] == 0.0, f"frozen {group} moved: {err}"
        else:
            assert err["rel_l2_err"] < 1e-4, f"param group {group}: {err}"
