"""Parity harness: compare two export artifact sets per quantization path.

The behavioral-parity surface of the rebuild is the eval export
(inference.py outputs; SURVEY.md section 3.2): identical token IDs and
close embeddings for every code. This tool diffs two exports (e.g. the
PyTorch reference's vs ours, or TPU vs CPU) and reports mismatch rates PER
PATH — text-specific / graph-specific / shared-text / shared-graph (the 4
rows of tokens_all[N, 4, k]) — the per-path breakdown SURVEY.md's "exact
token-ID parity" plan calls for.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

PATHS = ("text_specific", "graph_specific", "shared_text", "shared_graph")


def compare_exports(
    a_dir: str | Path,
    b_dir: str | Path,
    *,
    embedding_rtol: float = 1e-3,
    embedding_atol: float = 1e-4,
) -> dict:
    """Returns a report dict; print with json.dumps(..., indent=2)."""
    a_dir, b_dir = Path(a_dir), Path(b_dir)
    report: dict = {}

    ta = np.load(a_dir / "tokens_all.npy")
    tb = np.load(b_dir / "tokens_all.npy")
    assert ta.shape == tb.shape, f"token shapes differ: {ta.shape} vs {tb.shape}"
    n = ta.shape[0]
    report["num_codes"] = int(n)

    per_path = {}
    for p, name in enumerate(PATHS):
        mism_rows = np.any(ta[:, p, :] != tb[:, p, :], axis=-1)
        per_path[name] = {
            "row_mismatch_rate": float(mism_rows.mean()),
            "mismatched_codes": int(mism_rows.sum()),
            "first_mismatches": np.where(mism_rows)[0][:10].tolist(),
        }
    report["token_id_parity"] = per_path
    report["token_exact_match"] = bool(np.array_equal(ta, tb))

    for name in ("embeddings_all", "weights_all"):
        fa, fb = a_dir / f"{name}.npy", b_dir / f"{name}.npy"
        if not (fa.exists() and fb.exists()):
            continue
        ea, eb = np.load(fa), np.load(fb)
        err = np.abs(ea - eb)
        denom = np.maximum(np.abs(eb), embedding_atol / embedding_rtol)
        report[name] = {
            "max_abs_err": float(err.max()),
            "mean_abs_err": float(err.mean()),
            "rows_outside_tol": int(
                np.sum(np.any(err > embedding_atol + embedding_rtol * np.abs(eb),
                              axis=tuple(range(1, ea.ndim))))
            ),
        }
    return report


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("a", help="first export dir (e.g. reference)")
    p.add_argument("b", help="second export dir (e.g. rebuild)")
    args = p.parse_args(argv)
    print(json.dumps(compare_exports(args.a, args.b), indent=2))


if __name__ == "__main__":
    main()
