"""Parse-throughput benchmark for the EHR parsers (VERDICT r3 item 6).

Generates a synthetic MIMIC-III-schema CSV set at a configurable scale
(default 5K patients, ~40 events/patient ≈ 200K event rows — small enough to
run in CI-adjacent time, large enough that per-row Python overhead dominates
exactly as it would on real MIMIC-IV), then times ``MIMIC3Dataset`` +
the 6-task builder chain and prints one JSON line:

    {"ehr_parse_patients_per_sec": N, "patients": P, "event_rows": E, ...}

The reference parallelizes its per-patient loop with pandarallel process
pools (/root/reference/MedTok_EHR_Tutorial/mimic3.py:143); this box has one
core, so the win here must come from vectorization, not processes.
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_scale_fixture(root: Path, num_patients: int, seed: int = 0,
                       events_per_visit: int = 12) -> dict:
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)

    n_visits_per = rng.integers(1, 6, size=num_patients)
    total_visits = int(n_visits_per.sum())

    subj = np.repeat(np.arange(num_patients) + 10_000, n_visits_per)
    hadm = np.arange(total_visits) + 100_000

    # PATIENTS
    pids = np.arange(num_patients) + 10_000
    dob_year = rng.integers(1930, 2000, size=num_patients)
    patients = pd.DataFrame({
        "SUBJECT_ID": pids,
        "GENDER": rng.choice(["M", "F"], size=num_patients),
        "DOB": [f"{y}-{m:02d}-{d:02d} 00:00:00" for y, m, d in zip(
            dob_year, rng.integers(1, 13, num_patients),
            rng.integers(1, 29, num_patients))],
        "DOD_HOSP": [None] * num_patients,
    })

    # ADMISSIONS: sequential stays; ~1% NaT discharges (real-MIMIC quirk)
    base = pd.Timestamp("2130-01-01").value // 10**9
    enc = base + rng.integers(0, 3600 * 24 * 365 * 10, size=total_visits)
    enc.sort()
    stay = rng.integers(3600 * 6, 3600 * 24 * 30, size=total_visits)
    dis = enc + stay
    admittime = pd.to_datetime(enc, unit="s").strftime("%Y-%m-%d %H:%M:%S")
    dischtime = pd.Series(
        pd.to_datetime(dis, unit="s").strftime("%Y-%m-%d %H:%M:%S"))
    dischtime[rng.random(total_visits) < 0.01] = ""
    admissions = pd.DataFrame({
        "SUBJECT_ID": subj, "HADM_ID": hadm,
        "ADMITTIME": admittime, "DISCHTIME": dischtime,
        "HOSPITAL_EXPIRE_FLAG": rng.integers(0, 2, total_visits),
        "ETHNICITY": rng.choice(["WHITE", "BLACK", "ASIAN", "OTHER"],
                                total_visits),
    })

    # event tables
    def event_table(code_pool: np.ndarray, per_visit: int) -> pd.DataFrame:
        n = rng.integers(1, per_visit + 1, size=total_visits)
        s = np.repeat(subj, n)
        h = np.repeat(hadm, n)
        codes = rng.choice(code_pool, size=int(n.sum()))
        return pd.DataFrame({"SUBJECT_ID": s, "HADM_ID": h,
                             "ICD9_CODE": codes})

    icd9 = np.array([f"{i:04d}" for i in rng.integers(1, 9999, 2000)])
    proc = np.array([f"{i:03d}" for i in rng.integers(1, 999, 500)])
    ndc = np.array([f"{i:011d}" for i in rng.integers(1, 10**10, 800)])

    diagnoses = event_table(icd9, events_per_visit)
    procedures = event_table(proc, max(2, events_per_visit // 3))
    prescriptions = event_table(ndc, events_per_visit)[
        ["SUBJECT_ID", "HADM_ID", "ICD9_CODE"]].rename(
        columns={"ICD9_CODE": "NDC"})

    icustays = pd.DataFrame({
        "SUBJECT_ID": subj, "HADM_ID": hadm,
        "ICUSTAY_ID": hadm + 7_000_000,
    })

    for name, df in [("PATIENTS", patients), ("ADMISSIONS", admissions),
                     ("DIAGNOSES_ICD", diagnoses),
                     ("PROCEDURES_ICD", procedures),
                     ("PRESCRIPTIONS", prescriptions),
                     ("ICUSTAYS", icustays)]:
        with gzip.open(root / f"{name}.csv.gz", "wt") as f:
            df.to_csv(f, index=False)

    return {"patients": num_patients, "visits": total_visits,
            "event_rows": int(len(diagnoses) + len(procedures)
                              + len(prescriptions))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=5000)
    ap.add_argument("--root", default="/tmp/ehr_parse_bench")
    ap.add_argument("--tasks", action="store_true",
                    help="also time the 6-task builder chain")
    args = ap.parse_args()

    root = Path(args.root)
    meta = make_scale_fixture(root, args.patients)

    from medtok_tpu.ehr.parsers import MIMIC3Dataset

    t0 = time.perf_counter()
    ds = MIMIC3Dataset(root)
    parse_s = time.perf_counter() - t0

    out = dict(meta)
    out["parse_s"] = round(parse_s, 3)
    out["ehr_parse_patients_per_sec"] = round(meta["patients"] / parse_s, 1)
    out["ehr_parse_event_rows_per_sec"] = round(
        meta["event_rows"] / parse_s, 1)

    if args.tasks:
        from medtok_tpu.ehr.tasks import CodeMapper, PatientEHRTasks
        codes = pd.DataFrame({"med_code": [f"{i:04d}" for i in range(2000)]})
        codes.to_parquet(root / "codes.parquet")
        mapper = CodeMapper(root / "codes.parquet")
        t0 = time.perf_counter()
        tasks = PatientEHRTasks(ds.patients, mapper)
        n = sum(len(tasks.build(task) or [])
                for task in ("mortality", "readmission", "lenofstay"))
        out["tasks_s"] = round(time.perf_counter() - t0, 3)
        out["task_samples"] = n

    print(json.dumps(out))


if __name__ == "__main__":
    main()
