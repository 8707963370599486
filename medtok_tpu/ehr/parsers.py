"""EHR dataset parsers: MIMIC-III / MIMIC-IV / EHRShot CSVs -> Patients.

pyhealth-free equivalents of the reference parsers
(/root/reference/MedTok_EHR_Tutorial/mimic3.py:13-448, mimic4.py:13-448,
ehrshot.py:11-273). Column/vocabulary facts reproduced:

- MIMIC-III: PATIENTS (SUBJECT_ID, GENDER, DOB, DOD_HOSP) x ADMISSIONS
  (HADM_ID, ADMITTIME, DISCHTIME, HOSPITAL_EXPIRE_FLAG, ETHNICITY) x
  ICUSTAYS (per-visit count -> visit.attr_dict['icustays_num']);
  DIAGNOSES_ICD (ICD9CM), PROCEDURES_ICD (ICD9PROC), PRESCRIPTIONS (NDC).
- MIMIC-IV: patients (gender, anchor_age/anchor_year -> birth year approx,
  mimic4.py:118-125), admissions (race as ethnicity), diagnoses_icd /
  procedures_icd with icd_version-mixed vocabularies, prescriptions (ndc).
- EHRShot: patients/admissions (start/end, Gender/Race, dob) +
  diagnoses/procedures/prescriptions with code_val columns (ATC drugs).

NDC->ATC-5 mapping (the reference delegates to pyhealth InnerMap, which
downloads mapping tables — unavailable offline): pass ``ndc_to_atc`` as a
{ndc: atc5} dict (e.g. loaded from a user-provided CSV); unmapped codes pass
through unchanged.

Throughput: the reference parallelizes its per-patient loop with pandarallel
process pools (mimic3.py:143). This rebuild instead vectorizes the hot paths
— column-wise ``pd.to_datetime`` (one call per column instead of one per
value), ``drop_duplicates`` visit extraction instead of nested Python
``groupby`` loops, and zip-over-lists event ingestion instead of
``DataFrame.iterrows`` — which is the right shape for a one-core-per-chip
TPU host and measured ~30x faster than the loop forms
(scripts/bench_ehr_parse.py). Ordering semantics of the original
groupby-based construction are preserved exactly: patients in sorted
SUBJECT_ID order, visits in sorted HADM_ID order per patient with
first-occurrence field values, events in file order.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Callable

import pandas as pd

from medtok_tpu.ehr.data import Event, Patient, Visit


def strptime(s) -> datetime | None:
    """Lenient timestamp parse (pyhealth.datasets.utils.strptime contract)."""
    if s is None or (isinstance(s, float) and pd.isna(s)):
        return None
    s = str(s)
    if not s or s == "nan" or s == "NaT":
        return None
    try:
        return pd.to_datetime(s).to_pydatetime()
    except (ValueError, TypeError):
        return None


def _ts_list(ser: pd.Series) -> list[datetime | None]:
    """Column-vectorized strptime: one ``pd.to_datetime`` call for the whole
    column (NaT/unparseable -> None), matching strptime() per-value output."""
    dt = pd.to_datetime(ser, errors="coerce", format="mixed")
    out = dt.dt.to_pydatetime()  # object ndarray of datetime / NaT
    return [None if pd.isna(t) else t for t in out]


def _apply_code_map(code: str, mapping: dict[str, str] | None) -> str:
    if mapping is None:
        return code
    return mapping.get(code, code)


def _read(root: Path, name: str, **kw) -> pd.DataFrame:
    """Read {root}/{name}.csv or .csv.gz."""
    for suffix in (".csv", ".csv.gz"):
        p = root / f"{name}{suffix}"
        if p.exists():
            return pd.read_csv(p, low_memory=False, **kw)
    raise FileNotFoundError(f"{root}/{name}.csv[.gz]")


def _build_patients(
    df: pd.DataFrame,
    *,
    subject_col: str,
    visit_col: str,
    encounter_col: str,
    discharge_col: str,
    status_col: str | None,
    ethnicity_col: str,
    birth_of: Callable[[pd.DataFrame], list[datetime | None]],
    death_of: Callable[[pd.DataFrame], list[datetime | None]],
    gender_col: str,
    icu_counts: dict[str, int] | None = None,
) -> dict[str, Patient]:
    """Shared vectorized patient/visit construction.

    ``birth_of``/``death_of`` map the per-patient first-rows frame to lists
    of datetimes (column-wise ``_ts_list``, not per-value strptime).

    Semantics mirror the original nested-groupby construction:
    - patient demographics from the subject's FIRST row in ``df`` order
      (ethnicity varies per admission; groupby took ``.values[0]``),
    - visits in sorted ``visit_col`` order per patient, with visit fields
      from the visit's first row in ``df`` order (duplicate-row quirk),
    - patients in sorted ``subject_col`` order.
    """
    # per-patient firsts, original order (== p_info[...].values[0])
    pat_first = df.drop_duplicates(subject_col, keep="first")
    patients: dict[str, Patient] = {}
    births = birth_of(pat_first)
    deaths = death_of(pat_first)
    genders = pat_first[gender_col].tolist()
    ethnicities = pat_first[ethnicity_col].tolist()
    for i, p_id in enumerate(pat_first[subject_col].tolist()):
        patients[p_id] = Patient(
            patient_id=p_id,
            birth_datetime=births[i],
            death_datetime=deaths[i],
            gender=genders[i],
            ethnicity=ethnicities[i],
        )

    # per-visit firsts in file order, then stable-sorted by (subject, visit)
    # == nested groupby's sorted-HADM_ID insertion order
    vis = df.drop_duplicates([subject_col, visit_col], keep="first")
    vis = vis.sort_values([subject_col, visit_col], kind="stable")
    p_ids = vis[subject_col].tolist()
    v_ids = vis[visit_col].astype(str).tolist()
    enc = _ts_list(vis[encounter_col])
    dis = _ts_list(vis[discharge_col])
    status = vis[status_col].tolist() if status_col else [None] * len(vis)
    for i in range(len(v_ids)):
        v_id = v_ids[i]
        patients[p_ids[i]].add_visit(Visit(
            visit_id=v_id,
            patient_id=p_ids[i],
            encounter_time=enc[i],
            discharge_time=dis[i],
            discharge_status=status[i],
            attr_dict={
                "icustays_num": icu_counts.get(v_id, 1) if icu_counts
                else 1
            },
        ))
    # emit dict in sorted-subject order (== sorted groupby iteration)
    return {k: patients[k] for k in sorted(patients)}


def _ingest_events(
    patients: dict[str, Patient],
    df: pd.DataFrame,
    *,
    table: str,
    subject_col: str,
    visit_col: str,
    code_col: str,
    vocab,  # str | pd.Series aligned with df
    code_map: dict[str, str] | None = None,
) -> None:
    """Vectorized _add_events: pull columns to lists once, then one tight
    zip loop (file order preserved; ~30x faster than iterrows)."""
    p_ids = df[subject_col].astype(str).tolist()
    v_ids = df[visit_col].astype(str).tolist()
    codes = df[code_col].astype(str)
    if code_map is not None:
        codes = codes.map(lambda c: code_map.get(c, c))
    codes = codes.tolist()
    vocabs = vocab.tolist() if isinstance(vocab, pd.Series) else None
    get = patients.get
    for i in range(len(p_ids)):
        p_id = p_ids[i]
        patient = get(p_id)
        if patient is None:
            continue
        patient.add_event(Event(
            code=codes[i], table=table,
            vocabulary=vocabs[i] if vocabs is not None else vocab,
            visit_id=v_ids[i], patient_id=p_id,
        ))


class MIMIC3Dataset:
    """MIMIC-III CSVs -> {patient_id: Patient}."""

    def __init__(
        self,
        root: str | Path,
        tables: tuple[str, ...] = ("DIAGNOSES_ICD", "PROCEDURES_ICD", "PRESCRIPTIONS"),
        *,
        ndc_to_atc: dict[str, str] | None = None,
        dev: bool = False,
    ):
        self.root = Path(root)
        self.dev = dev
        self.ndc_to_atc = ndc_to_atc
        self.patients = self._parse_basic()
        parsers: dict[str, Callable] = {
            "DIAGNOSES_ICD": self._parse_diagnoses,
            "PROCEDURES_ICD": self._parse_procedures,
            "PRESCRIPTIONS": self._parse_prescriptions,
            "LABEVENTS": self._parse_labevents,
            "ICUSTAYS": self._parse_icustay_events,
        }
        for t in tables:
            parsers[t]()

    def _parse_basic(self) -> dict[str, Patient]:
        pat = _read(self.root, "PATIENTS", dtype={"SUBJECT_ID": str})
        adm = _read(self.root, "ADMISSIONS", dtype={"SUBJECT_ID": str, "HADM_ID": str})
        df = pd.merge(pat, adm, on="SUBJECT_ID", how="inner")
        try:
            icu = _read(self.root, "ICUSTAYS", dtype={"SUBJECT_ID": str, "HADM_ID": str})
            icu_counts = icu.groupby("HADM_ID").size().to_dict()
        except FileNotFoundError:
            icu_counts = {}
        if self.dev:
            keep = df["SUBJECT_ID"].drop_duplicates().head(1000)
            df = df[df["SUBJECT_ID"].isin(keep)]
        if "DOD_HOSP" not in df:
            df["DOD_HOSP"] = None
        return _build_patients(
            df,
            subject_col="SUBJECT_ID", visit_col="HADM_ID",
            encounter_col="ADMITTIME", discharge_col="DISCHTIME",
            status_col="HOSPITAL_EXPIRE_FLAG", ethnicity_col="ETHNICITY",
            gender_col="GENDER",
            birth_of=lambda d: _ts_list(d["DOB"]),
            death_of=lambda d: _ts_list(d["DOD_HOSP"]),
            icu_counts=icu_counts,
        )

    def _add_events(self, df, table, vocab, code_col, map_fn=None):
        # kept for API compatibility with subclass/test monkeypatching;
        # delegates to the vectorized path (map_fn applied column-wise)
        codes = df[code_col].astype(str)
        if map_fn is not None:
            df = df.assign(**{code_col: codes.map(map_fn)})
        _ingest_events(
            self.patients, df, table=table, subject_col="SUBJECT_ID",
            visit_col="HADM_ID", code_col=code_col, vocab=vocab,
        )

    def _parse_diagnoses(self):
        df = _read(self.root, "DIAGNOSES_ICD",
                   dtype={"SUBJECT_ID": str, "HADM_ID": str, "ICD9_CODE": str})
        df = df.dropna(subset=["SUBJECT_ID", "HADM_ID", "ICD9_CODE"])
        self._add_events(df, "DIAGNOSES_ICD", "ICD9CM", "ICD9_CODE")

    def _parse_procedures(self):
        df = _read(self.root, "PROCEDURES_ICD",
                   dtype={"SUBJECT_ID": str, "HADM_ID": str, "ICD9_CODE": str})
        df = df.dropna(subset=["SUBJECT_ID", "HADM_ID", "ICD9_CODE"])
        self._add_events(df, "PROCEDURES_ICD", "ICD9PROC", "ICD9_CODE")

    def _parse_prescriptions(self):
        df = _read(self.root, "PRESCRIPTIONS",
                   dtype={"SUBJECT_ID": str, "HADM_ID": str, "NDC": str})
        df = df.dropna(subset=["SUBJECT_ID", "HADM_ID", "NDC"])
        _ingest_events(
            self.patients, df, table="PRESCRIPTIONS",
            subject_col="SUBJECT_ID", visit_col="HADM_ID", code_col="NDC",
            vocab="ATC" if self.ndc_to_atc else "NDC",
            code_map=self.ndc_to_atc,
        )

    def _parse_labevents(self):
        """LABEVENTS -> MIMIC3_ITEMID events (mimic3.py:294-340)."""
        df = _read(self.root, "LABEVENTS",
                   dtype={"SUBJECT_ID": str, "HADM_ID": str, "ITEMID": str})
        df = df.dropna(subset=["SUBJECT_ID", "HADM_ID", "ITEMID"])
        self._add_events(df, "LABEVENTS", "MIMIC3_ITEMID", "ITEMID")

    def _parse_icustay_events(self):
        """ICUSTAYS -> icustay events (mimic3.py:393-448; the per-visit
        icustays_num attr is populated in _parse_basic regardless)."""
        df = _read(self.root, "ICUSTAYS",
                   dtype={"SUBJECT_ID": str, "HADM_ID": str, "ICUSTAY_ID": str})
        df = df.dropna(subset=["SUBJECT_ID", "HADM_ID", "ICUSTAY_ID"])
        self._add_events(df, "ICUSTAYS", "icustay", "ICUSTAY_ID")


class MIMIC4Dataset:
    """MIMIC-IV CSVs -> {patient_id: Patient} (lowercase schema)."""

    def __init__(
        self,
        root: str | Path,
        tables: tuple[str, ...] = ("diagnoses_icd", "procedures_icd", "prescriptions"),
        *,
        ndc_to_atc: dict[str, str] | None = None,
        dev: bool = False,
    ):
        self.root = Path(root)
        self.dev = dev
        self.ndc_to_atc = ndc_to_atc
        self.patients = self._parse_basic()
        parsers: dict[str, Callable] = {
            "diagnoses_icd": self._parse_diagnoses,
            "procedures_icd": self._parse_procedures,
            "prescriptions": self._parse_prescriptions,
        }
        for t in tables:
            parsers[t]()

    def _parse_basic(self) -> dict[str, Patient]:
        pat = _read(self.root, "patients", dtype={"subject_id": str})
        adm = _read(self.root, "admissions", dtype={"subject_id": str, "hadm_id": str})
        df = pd.merge(pat, adm, on="subject_id", how="inner")
        df = df.sort_values(["subject_id", "admittime", "dischtime"],
                            ascending=True, kind="stable")
        if self.dev:
            keep = df["subject_id"].drop_duplicates().head(1000)
            df = df[df["subject_id"].isin(keep)]
        if "dod" not in df:
            df["dod"] = None
        return _build_patients(
            df,
            subject_col="subject_id", visit_col="hadm_id",
            encounter_col="admittime", discharge_col="dischtime",
            status_col="hospital_expire_flag", ethnicity_col="race",
            gender_col="gender",
            # no exact birth datetime in MIMIC-IV: anchor_year - anchor_age
            # (mimic4.py:118-125)
            birth_of=lambda d: _ts_list(
                (d["anchor_year"].astype(int)
                 - d["anchor_age"].astype(int)).astype(str)),
            death_of=lambda d: _ts_list(d["dod"]),
        )

    def _parse_diagnoses(self):
        df = _read(self.root, "diagnoses_icd",
                   dtype={"subject_id": str, "hadm_id": str, "icd_code": str})
        df = df.dropna(subset=["subject_id", "hadm_id", "icd_code", "icd_version"])
        vocab = "ICD" + df["icd_version"].astype(int).astype(str) + "CM"
        _ingest_events(
            self.patients, df, table="diagnoses_icd",
            subject_col="subject_id", visit_col="hadm_id",
            code_col="icd_code", vocab=vocab,
        )

    def _parse_procedures(self):
        df = _read(self.root, "procedures_icd",
                   dtype={"subject_id": str, "hadm_id": str, "icd_code": str})
        df = df.dropna(subset=["subject_id", "hadm_id", "icd_code", "icd_version"])
        vocab = "ICD" + df["icd_version"].astype(int).astype(str) + "PROC"
        _ingest_events(
            self.patients, df, table="procedures_icd",
            subject_col="subject_id", visit_col="hadm_id",
            code_col="icd_code", vocab=vocab,
        )

    def _parse_prescriptions(self):
        df = _read(self.root, "prescriptions",
                   dtype={"subject_id": str, "hadm_id": str, "ndc": str})
        df = df.dropna(subset=["subject_id", "hadm_id", "ndc"])
        _ingest_events(
            self.patients, df, table="prescriptions",
            subject_col="subject_id", visit_col="hadm_id", code_col="ndc",
            vocab="ATC" if self.ndc_to_atc else "NDC",
            code_map=self.ndc_to_atc,
        )


class EHRShotDataset:
    """EHRShot CSVs -> {patient_id: Patient} (patients/admissions/diagnoses/
    procedures/prescriptions with start/end times and code_val columns)."""

    def __init__(
        self,
        root: str | Path,
        tables: tuple[str, ...] = ("diagnoses", "procedures", "prescriptions"),
        *,
        ndc_to_atc: dict[str, str] | None = None,
        dev: bool = False,
    ):
        self.root = Path(root)
        self.dev = dev
        self.ndc_to_atc = ndc_to_atc
        self.patients = self._parse_basic()
        for t in tables:
            self._parse_codes(t)

    def _parse_basic(self) -> dict[str, Patient]:
        pat = _read(self.root, "patients", dtype={"patient_id": str})
        adm = _read(self.root, "admissions", dtype={"patient_id": str, "visit_id": str})
        df = pd.merge(pat, adm, on="patient_id", how="inner")
        df = df.sort_values(["patient_id", "start", "end"], ascending=True,
                            kind="stable")
        if self.dev:
            keep = df["patient_id"].drop_duplicates().head(1000)
            df = df[df["patient_id"].isin(keep)]
        if "dod" not in df:
            df["dod"] = None
        return _build_patients(
            df,
            subject_col="patient_id", visit_col="visit_id",
            encounter_col="start", discharge_col="end",
            status_col=None, ethnicity_col="Race", gender_col="Gender",
            birth_of=lambda d: _ts_list(d["dob"].astype(str)),
            death_of=lambda d: _ts_list(d["dod"]),
        )

    def _parse_codes(self, table: str):
        df = _read(self.root, table,
                   dtype={"patient_id": str, "visit_id": str, "code_val": str})
        df = df.dropna(subset=["patient_id", "visit_id", "code_val"])
        df = df.sort_values(["patient_id", "visit_id", "code_val"],
                            ascending=True, kind="stable")
        is_drug = table == "prescriptions"
        if is_drug:
            vocab = "ATC"
        elif "icd_version" in df:
            vocab = df["icd_version"].astype(str)
        else:
            vocab = ""
        _ingest_events(
            self.patients, df, table=table,
            subject_col="patient_id", visit_col="visit_id",
            code_col="code_val", vocab=vocab,
            code_map=self.ndc_to_atc if is_drug else None,
        )
