"""Clinical code-system mappings (NDC -> ATC-5 etc.).

The reference delegates NDC->ATC mapping to pyhealth's InnerMap, which
downloads its crosswalk tables at runtime (load_data.py:90-92) — unavailable
offline. This module loads a user-provided crosswalk file instead and feeds
the parsers' ``ndc_to_atc`` argument.

Accepted formats:
- CSV with columns (ndc, atc) — extra columns ignored, case-insensitive
- two-column headerless CSV/TSV
- JSON object {ndc: atc}
"""

from __future__ import annotations

import json
from pathlib import Path


def load_code_map(path: str | Path) -> dict[str, str]:
    p = Path(path)
    if p.suffix == ".json":
        return {str(k): str(v) for k, v in json.loads(p.read_text()).items()}

    import pandas as pd

    sep = "\t" if p.suffix in (".tsv", ".txt") else ","
    df = pd.read_csv(p, sep=sep, dtype=str)
    cols = {c.lower(): c for c in df.columns}
    if "ndc" in cols and "atc" in cols:
        src, dst = cols["ndc"], cols["atc"]
    elif len(df.columns) >= 2:
        src, dst = df.columns[0], df.columns[1]
    else:
        raise ValueError(f"{path}: need (ndc, atc) columns or 2 columns")
    df = df.dropna(subset=[src, dst])
    return dict(zip(df[src].astype(str), df[dst].astype(str)))


def to_atc_level(code: str, level: int = 5) -> str:
    """Truncate an ATC code to a level boundary (pyhealth target_kwargs
    {'level': 5} semantics; level 5 = 7 chars, 4 = 5, 3 = 4, 2 = 3, 1 = 1)."""
    lengths = {1: 1, 2: 3, 3: 4, 4: 5, 5: 7}
    return code[: lengths[level]]
