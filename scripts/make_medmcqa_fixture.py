"""Vendor a deterministic 200-row slice of the reference MedMCQA dataset
as a test fixture (VERDICT r4 item 4).

The reference QA pipeline is defined on
/root/reference/Dataset/MedicalQA/medmcqa_dataset.json
(MedTok_fintune_llama3.py:45, MedTok_QA_inference.py:91): a list of
{"input": [question_text, answer_letter], "medical_codes": [int, ...]}
rows. The slice is an even stride over the full 4,183-row file so it keeps
the real length/code-count distribution (short and long questions, 0-20+
medical codes per row), and is committed so the oracle runs without the
reference mounted.
"""

from __future__ import annotations

import json
from pathlib import Path

SRC = Path("/root/reference/Dataset/MedicalQA/medmcqa_dataset.json")
DST = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / \
    "medmcqa_200.json"
N = 200


def main() -> None:
    rows = json.loads(SRC.read_text())
    stride = len(rows) // N
    sliced = [rows[i * stride] for i in range(N)]
    assert len(sliced) == N
    # sanity: schema of every vendored row
    for r in sliced:
        q, label = r["input"]
        assert isinstance(q, str) and label in "ABCD"
        assert all(isinstance(c, int) for c in r["medical_codes"])
    DST.parent.mkdir(parents=True, exist_ok=True)
    DST.write_text(json.dumps(sliced, indent=0))
    print(f"wrote {DST} ({N} rows, stride {stride}, "
          f"{DST.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
