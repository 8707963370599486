"""Synthetic MIMIC-III-schema EHR fixtures (no PHI; tests + demos).

Plays the role of pyhealth's hosted mimiciii-demo fixture in the reference's
smoke block (mimic3.py:451-465), which is unreachable offline.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def synthetic_mimic3(
    root: str | Path,
    vocab_codes: list[str],
    *,
    num_patients: int = 30,
    seed: int = 0,
) -> None:
    """Write PATIENTS/ADMISSIONS/ICUSTAYS/DIAGNOSES_ICD/PROCEDURES_ICD/
    PRESCRIPTIONS CSVs under ``root`` with codes drawn from ``vocab_codes``
    (plus a few unmappable ones)."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    patients, admissions, icustays = [], [], []
    diagnoses, procedures, prescriptions = [], [], []
    hadm = 1000
    genders = ["M", "F"]
    eths = ["WHITE", "BLACK", "ASIAN", "HISPANIC"]
    for pid in range(num_patients):
        birth_year = int(rng.integers(1930, 1990))
        patients.append({
            "SUBJECT_ID": pid,
            "GENDER": genders[int(rng.integers(2))],
            "DOB": f"{birth_year}-01-15 00:00:00",
            "DOD_HOSP": "",
        })
        n_visits = int(rng.integers(2, 6))
        t = np.datetime64("2130-01-01") + rng.integers(0, 1000)
        for v in range(n_visits):
            hadm += 1
            stay = int(rng.integers(1, 20))
            admit = t
            disch = t + stay
            t = disch + int(rng.integers(1, 120))
            admissions.append({
                "SUBJECT_ID": pid, "HADM_ID": hadm,
                "ADMITTIME": f"{admit} 10:00:00",
                "DISCHTIME": f"{disch} 15:00:00",
                "HOSPITAL_EXPIRE_FLAG": int(rng.random() < 0.15),
                "ETHNICITY": eths[int(rng.integers(len(eths)))],
            })
            for _ in range(int(rng.integers(1, 3))):
                icustays.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "ICUSTAY_ID": int(rng.integers(1e6)),
                })
            for _ in range(int(rng.integers(1, 5))):
                diagnoses.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "ICD9_CODE": str(rng.choice(vocab_codes)),
                })
            for _ in range(int(rng.integers(1, 4))):
                procedures.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "ICD9_CODE": str(rng.choice(vocab_codes)),
                })
            for _ in range(int(rng.integers(1, 4))):
                code = (str(rng.choice(vocab_codes))
                        if rng.random() > 0.2 else f"UNMAPPED{rng.integers(100)}")
                prescriptions.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm, "NDC": code,
                })

    pd.DataFrame(patients).to_csv(root / "PATIENTS.csv", index=False)
    pd.DataFrame(admissions).to_csv(root / "ADMISSIONS.csv", index=False)
    pd.DataFrame(icustays).to_csv(root / "ICUSTAYS.csv", index=False)
    pd.DataFrame(diagnoses).to_csv(root / "DIAGNOSES_ICD.csv", index=False)
    pd.DataFrame(procedures).to_csv(root / "PROCEDURES_ICD.csv", index=False)
    pd.DataFrame(prescriptions).to_csv(root / "PRESCRIPTIONS.csv", index=False)
