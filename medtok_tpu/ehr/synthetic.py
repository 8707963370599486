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


def synthetic_mimic4(
    root: str | Path,
    vocab_codes: list[str],
    *,
    num_patients: int = 20,
    seed: int = 0,
) -> None:
    """MIMIC-IV lowercase schema: patients (anchor_age/anchor_year),
    admissions (race), diagnoses_icd/procedures_icd (icd_version),
    prescriptions (ndc)."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    patients, admissions = [], []
    diagnoses, procedures, prescriptions = [], [], []
    hadm = 5000
    for pid in range(num_patients):
        anchor_year = int(rng.integers(2110, 2150))
        patients.append({
            "subject_id": pid, "gender": "MF"[int(rng.integers(2))],
            "anchor_age": int(rng.integers(20, 85)),
            "anchor_year": anchor_year, "anchor_year_group": "2110 - 2130",
            "dod": "",
        })
        t = np.datetime64(f"{anchor_year}-01-01") + rng.integers(0, 300)
        for _ in range(int(rng.integers(2, 5))):
            hadm += 1
            stay = int(rng.integers(1, 15))
            admissions.append({
                "subject_id": pid, "hadm_id": hadm,
                "admittime": f"{t} 08:00:00",
                "dischtime": f"{t + stay} 17:00:00",
                "hospital_expire_flag": int(rng.random() < 0.1),
                "race": ["WHITE", "BLACK", "ASIAN"][int(rng.integers(3))],
            })
            t = t + stay + int(rng.integers(1, 90))
            for _ in range(int(rng.integers(1, 4))):
                diagnoses.append({
                    "subject_id": pid, "hadm_id": hadm,
                    "icd_code": str(rng.choice(vocab_codes)),
                    "icd_version": int(rng.choice([9, 10])),
                })
            for _ in range(int(rng.integers(1, 3))):
                procedures.append({
                    "subject_id": pid, "hadm_id": hadm,
                    "icd_code": str(rng.choice(vocab_codes)),
                    "icd_version": int(rng.choice([9, 10])),
                })
            for _ in range(int(rng.integers(1, 3))):
                prescriptions.append({
                    "subject_id": pid, "hadm_id": hadm,
                    "ndc": str(rng.choice(vocab_codes)),
                })
    pd.DataFrame(patients).to_csv(root / "patients.csv", index=False)
    pd.DataFrame(admissions).to_csv(root / "admissions.csv", index=False)
    pd.DataFrame(diagnoses).to_csv(root / "diagnoses_icd.csv", index=False)
    pd.DataFrame(procedures).to_csv(root / "procedures_icd.csv", index=False)
    pd.DataFrame(prescriptions).to_csv(root / "prescriptions.csv", index=False)


def synthetic_ehrshot(
    root: str | Path,
    vocab_codes: list[str],
    *,
    num_patients: int = 20,
    seed: int = 0,
) -> None:
    """EHRShot schema: patients/admissions (start/end, Gender/Race, dob) +
    diagnoses/procedures/prescriptions with code_val columns."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    patients, admissions = [], []
    tables = {"diagnoses": [], "procedures": [], "prescriptions": []}
    vid = 9000
    for pid in range(num_patients):
        patients.append({
            "patient_id": pid,
            "dob": f"{int(rng.integers(1940, 2000))}-06-01",
            "Gender": "MF"[int(rng.integers(2))],
            "Race": ["WHITE", "BLACK"][int(rng.integers(2))],
            "dod": "",
        })
        t = np.datetime64("2015-01-01") + rng.integers(0, 1000)
        for _ in range(int(rng.integers(2, 5))):
            vid += 1
            stay = int(rng.integers(1, 10))
            admissions.append({
                "patient_id": pid, "visit_id": vid,
                "start": f"{t} 09:00:00", "end": f"{t + stay} 12:00:00",
            })
            t = t + stay + int(rng.integers(1, 60))
            for table in tables:
                for _ in range(int(rng.integers(1, 3))):
                    tables[table].append({
                        "patient_id": pid, "visit_id": vid,
                        "code_val": str(rng.choice(vocab_codes)),
                        "icd_version": 10,
                    })
    pd.DataFrame(patients).to_csv(root / "patients.csv", index=False)
    pd.DataFrame(admissions).to_csv(root / "admissions.csv", index=False)
    for table, rows in tables.items():
        pd.DataFrame(rows).to_csv(root / f"{table}.csv", index=False)
