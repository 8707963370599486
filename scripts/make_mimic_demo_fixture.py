"""Generate the vendored MIMIC-III demo-scale fixture (tests/fixtures/mimic3_demo).

Plays the role of pyhealth's hosted mimiciii-demo (the reference's only
"fixture", /root/reference/MedTok_EHR_Tutorial/mimic3.py:451-465 — a public
demo dataset standing in for PHI-restricted MIMIC), which is unreachable
offline. Unlike ehr/synthetic.py's clean generators, this set carries the
real-data quirks the demo exhibits, so the parsers -> tasks -> featurizer
chain is exercised against them:

- NaT discharges (empty DISCHTIME) and in-hospital deaths (DOD_HOSP set,
  HOSPITAL_EXPIRE_FLAG=1 on the final stay);
- EXACT duplicate diagnosis rows (real MIMIC repeats codes across SEQ_NUMs);
- ICD codes that resolve only via the vocab's string-range fallback
  (load_data.py:257-265), e.g. V30x against a "V30-V39" vocab row;
- unmapped codes (-1 sentinel), single-visit patients (dropped by
  visit_num_th=2), visits with empty tables, shuffled CSV row order;
- AMI onset codes so new_disease finds positives (load_data.py:123) and the
  five drugrec ATC candidates via an NDC->ATC mapping CSV (load_data.py:932);
- a matching all_codes_mappings.parquet vocab (dotted med_codes + range
  rows) and a 24-way phenotype_index.pkl.

Deterministic (seeded); outputs are committed, re-run only to regenerate.
"""

from __future__ import annotations

import gzip
import pickle
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from medtok_tpu.ehr.tasks import AMI_CODES, DRUG_CANDIDATES  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "tests/fixtures/mimic3_demo"
NUM_PATIENTS = 120
SEED = 20260819


def build_vocab(rng) -> pd.DataFrame:
    """all_codes_mappings.parquet-schema vocab: dotted ICD9 diagnoses,
    procedures, ATC drugs, plus string-range rows."""
    codes: list[str] = []
    # common ICD-9 diagnoses (dotted, as the real vocab stores them)
    codes += ["250.00", "401.9", "427.31", "428.0", "414.01", "584.9",
              "599.0", "486", "038.9", "518.81", "285.9", "272.4", "305.1",
              "496", "276.2", "995.92", "507.0", "285.1", "244.9", "530.81"]
    # AMI onset codes (undotted in tasks.AMI_CODES; store dotted forms)
    codes += ["410.01", "410.11", "410.91", "I21.0", "I21.9"]
    # procedures (ICD9PROC)
    codes += ["38.93", "96.04", "96.6", "99.04", "96.71", "88.56", "39.61",
              "89.64", "99.15", "36.15"]
    # drugrec ATC candidates + other ATCs
    codes += DRUG_CANDIDATES
    codes += ["N02BE01", "A02BC01", "C09AA05", "B05XA03", "N05BA06"]
    # range rows: the fallback targets (real vocab carries ICD chapter ranges)
    codes += ["V30-V39", "800-829", "E930-E949"]
    # filler so the vocab is demo-scale
    filler = [f"{rng.integers(100, 999)}.{rng.integers(10, 99)}"
              for _ in range(140)]
    codes += sorted(set(filler) - set(codes))
    rows = []
    for i, c in enumerate(codes):
        n = int(rng.integers(1, 9))
        rows.append({
            "med_code": c,
            "desc": f"description of medical code {c}",
            "pkg_index_list": rng.choice(130000, size=n, replace=False).tolist(),
        })
    return pd.DataFrame(rows)


def main() -> None:
    rng = np.random.default_rng(SEED)
    OUT.mkdir(parents=True, exist_ok=True)
    vocab = build_vocab(rng)
    vocab.to_parquet(OUT / "codes.parquet")
    undotted = vocab["med_code"].str.replace(".", "", regex=False)

    # event code pools (undotted, as real MIMIC-III CSVs store them)
    diag_pool = [c for c in undotted if "-" not in c and not c[0].isalpha()
                 and len(c) >= 3][:30]
    ami_pool = [c for c in AMI_CODES if c in set(undotted)]
    assert ami_pool, "vocab must contain AMI codes"
    proc_pool = ["3893", "9604", "966", "9904", "9671", "8856", "3961",
                 "8964", "9915", "3615"]
    # range-fallback-only codes: NOT in the vocab, inside its range rows
    range_pool = ["V302", "V371", "8024", "E9331"]
    unmapped_pool = ["99999", "XXX1", "73300"]
    # NDC -> ATC mapping: candidates + extras
    atc_pool = DRUG_CANDIDATES + ["N02BE01", "A02BC01", "C09AA05"]
    ndc_pool = [f"{50000000000 + i}" for i in range(len(atc_pool))]
    pd.DataFrame({"ndc": ndc_pool, "atc": atc_pool}).to_csv(
        OUT / "ndc_to_atc.csv", index=False
    )

    patients, admissions, icustays = [], [], []
    diagnoses, procedures, prescriptions, labevents = [], [], [], []
    genders = ["M", "F"]
    eths = ["WHITE", "BLACK/AFRICAN AMERICAN", "ASIAN", "HISPANIC OR LATINO",
            "UNKNOWN/NOT SPECIFIED"]
    hadm = 100000
    for pid in range(10000, 10000 + NUM_PATIENTS):
        birth_year = int(rng.integers(2030, 2120))  # MIMIC-shifted years
        dies = rng.random() < 0.12
        single_visit = rng.random() < 0.10
        n_visits = 1 if single_visit else int(rng.integers(2, 7))
        t = (np.datetime64(f"{birth_year + 40}-01-01")
             + int(rng.integers(0, 2000)))
        dod = ""
        for v in range(n_visits):
            hadm += 1
            stay = int(rng.integers(1, 25))
            admit, disch = t, t + stay
            # readmission positives need <=15-day gaps sometimes
            gap = int(rng.integers(2, 14)) if rng.random() < 0.35 else \
                int(rng.integers(20, 200))
            t = disch + gap
            last = v == n_visits - 1
            expire = int(dies and last)
            if expire:
                dod = f"{disch} 12:00:00"
            nat_discharge = (not expire) and rng.random() < 0.05
            admissions.append({
                "ROW_ID": len(admissions) + 1,
                "SUBJECT_ID": pid, "HADM_ID": hadm,
                "ADMITTIME": f"{admit} {int(rng.integers(0, 24)):02d}:11:00",
                "DISCHTIME": "" if nat_discharge else f"{disch} 15:45:00",
                "HOSPITAL_EXPIRE_FLAG": expire,
                "ETHNICITY": str(rng.choice(eths)),
            })
            for _ in range(int(rng.integers(1, 3))):
                icustays.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "ICUSTAY_ID": int(rng.integers(2_000_000)),
                })
            # diagnoses: mapped + AMI (sparse) + range-fallback + unmapped
            if rng.random() > 0.06:  # a few visits have NO diagnoses
                n_dx = int(rng.integers(2, 9))
                for s in range(n_dx):
                    r = rng.random()
                    if r < 0.04:
                        code = str(rng.choice(ami_pool))
                    elif r < 0.10:
                        code = str(rng.choice(range_pool))
                    elif r < 0.14:
                        code = str(rng.choice(unmapped_pool))
                    else:
                        code = str(rng.choice(diag_pool))
                    diagnoses.append({
                        "SUBJECT_ID": pid, "HADM_ID": hadm,
                        "SEQ_NUM": s + 1, "ICD9_CODE": code,
                    })
                    if rng.random() < 0.08:  # EXACT duplicate row
                        diagnoses.append(diagnoses[-1].copy())
            for s in range(int(rng.integers(1, 4))):
                procedures.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "SEQ_NUM": s + 1,
                    "ICD9_CODE": str(rng.choice(proc_pool)),
                })
            for _ in range(int(rng.integers(1, 5))):
                prescriptions.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "NDC": str(rng.choice(ndc_pool)) if rng.random() > 0.15
                    else f"{rng.integers(10**10, 10**11)}",
                })
            for _ in range(int(rng.integers(0, 3))):
                labevents.append({
                    "SUBJECT_ID": pid, "HADM_ID": hadm,
                    "ITEMID": int(rng.integers(50800, 51500)),
                })
        patients.append({
            "ROW_ID": len(patients) + 1,
            "SUBJECT_ID": pid,
            "GENDER": str(rng.choice(genders)),
            "DOB": f"{birth_year}-{int(rng.integers(1, 13)):02d}-15 00:00:00",
            "DOD_HOSP": dod,
        })

    def dump(name: str, rows: list[dict], shuffle: bool = True):
        df = pd.DataFrame(rows)
        if shuffle:  # real CSVs are not patient-ordered
            df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
        with gzip.open(OUT / f"{name}.csv.gz", "wt", compresslevel=9) as f:
            df.to_csv(f, index=False)

    dump("PATIENTS", patients)
    dump("ADMISSIONS", admissions)
    dump("ICUSTAYS", icustays)
    dump("DIAGNOSES_ICD", diagnoses)
    dump("PROCEDURES_ICD", procedures)
    dump("PRESCRIPTIONS", prescriptions)
    dump("LABEVENTS", labevents)

    # 24-way phenotype index over nodes that actually appear in pkg lists
    nodes = [int(n) for lst in vocab["pkg_index_list"].iloc[:40] for n in lst]
    phen = {i: nodes[i] for i in range(24)}
    with open(OUT / "phenotype_index.pkl", "wb") as f:
        pickle.dump(phen, f)

    sizes = {p.name: p.stat().st_size for p in sorted(OUT.iterdir())}
    print(f"wrote {OUT}:")
    for k, v in sizes.items():
        print(f"  {k}: {v/1024:.1f} KiB")
    print(f"patients={len(patients)} admissions={len(admissions)} "
          f"diagnoses={len(diagnoses)} (incl. duplicates) "
          f"prescriptions={len(prescriptions)}")


if __name__ == "__main__":
    main()
