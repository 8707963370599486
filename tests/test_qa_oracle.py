"""CI-scale QA quality oracle: flax soft-prompted Llama vs the composed
pure-torch twin (qa/torch_oracle.py) — greedy decode token parity, accuracy
parity through the full parse chain, and finetune-dynamics parity (step-0
grads + short AdamW loss trajectory).

Full-scale run: scripts/run_qa_oracle.py -> docs/PARITY_REPORT.json
(qa_decode / qa_accuracy / qa_finetune_dynamics blocks).
Reference surfaces: review.py:31-88, MedTok_QA_inference.py:94-218,
MedTok_fintune_llama3.py:43-154.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import run_qa_oracle as oracle  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    return oracle.build_pair(seed=0)


def test_greedy_decode_and_accuracy_parity(pair):
    ft, params, twin = pair
    decode, acc = oracle.decode_leg(ft, params, twin, n_rows=6, T=12)
    assert decode["rows_token_equal"] == decode["rows"], decode
    assert decode["token_mismatches"] == 0
    assert decode["first_step_logits_max_abs_err"] < 1e-4
    assert acc["predictions_equal"] and acc["accuracy_equal"], acc


def test_finetune_dynamics_parity(pair):
    ft, params, twin = pair
    dyn = oracle.dynamics_leg(ft, params, twin, steps=8)
    assert dyn["grad_step0_max_rel_err"] < 1e-4, dyn["grad_step0_per_leaf"]
    assert dyn["loss_traj_max_abs_diff"] < 1e-4, dyn
    assert abs(dyn["loss_step0_flax"] - dyn["loss_step0_torch"]) < 1e-5


def test_medmcqa_real_slice():
    """VERDICT r4 item 4, CI scale: real MedMCQA questions (vendored slice
    of the reference's own dataset) through the real surface — byte-level
    BPE tokenizer.json, Llama-3 chat template, right-aligned packing with
    the rows' own medical_codes, greedy decode, BPE detokenize,
    parse_answer cascade. Token ids, predictions, and accuracy must match
    the torch twin exactly on every row the reference itself can decode
    (its review.py:63 NaNs on zero-code rows; ours stays finite)."""
    pytest.importorskip("tokenizers")
    res = oracle.medmcqa_leg(n_rows=16, T=4, batch_size=8)
    assert res["encode_parity_all_prompts"]
    assert res["decode"]["rows_token_equal"] == res["decode"]["rows"], res
    assert res["decode"]["token_mismatches"] == 0
    assert res["first_step_logits_max_abs_err"] < 1e-4
    assert res["predictions_equal"] and res["accuracy_equal"], res
    zc = res["zero_code_rows"]
    if zc["count"]:
        assert zc["flax_logits_all_finite"]
        assert zc["reference_twin_logits_all_nan"]
