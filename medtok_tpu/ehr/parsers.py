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
        patients: dict[str, Patient] = {}
        for (p_id,), p_info in df.groupby(["SUBJECT_ID"]):
            patient = Patient(
                patient_id=p_id,
                birth_datetime=strptime(p_info["DOB"].values[0]),
                death_datetime=strptime(p_info.get("DOD_HOSP", pd.Series([None])).values[0]),
                gender=p_info["GENDER"].values[0],
                ethnicity=p_info["ETHNICITY"].values[0],
            )
            for v_id, v_info in p_info.groupby("HADM_ID"):
                visit = Visit(
                    visit_id=str(v_id),
                    patient_id=p_id,
                    encounter_time=strptime(v_info["ADMITTIME"].values[0]),
                    discharge_time=strptime(v_info["DISCHTIME"].values[0]),
                    discharge_status=v_info["HOSPITAL_EXPIRE_FLAG"].values[0],
                    attr_dict={"icustays_num": icu_counts.get(str(v_id), 1)},
                )
                patient.add_visit(visit)
            patients[p_id] = patient
        return patients

    def _add_events(self, df, table, vocab, code_col, map_fn=None):
        for _, row in df.iterrows():
            p_id = str(row["SUBJECT_ID"])
            v_id = str(row["HADM_ID"])
            if p_id not in self.patients:
                continue
            code = str(row[code_col])
            if map_fn is not None:
                code = map_fn(code)
            self.patients[p_id].add_event(
                Event(code=code, table=table, vocabulary=vocab,
                      visit_id=v_id, patient_id=p_id)
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
        self._add_events(
            df, "PRESCRIPTIONS", "ATC" if self.ndc_to_atc else "NDC", "NDC",
            map_fn=lambda c: _apply_code_map(c, self.ndc_to_atc),
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
        df = df.sort_values(["subject_id", "admittime", "dischtime"], ascending=True)
        if self.dev:
            keep = df["subject_id"].drop_duplicates().head(1000)
            df = df[df["subject_id"].isin(keep)]
        patients: dict[str, Patient] = {}
        for (p_id,), p_info in df.groupby(["subject_id"]):
            # no exact birth datetime in MIMIC-IV: anchor_year - anchor_age
            # (mimic4.py:118-125)
            birth_year = int(p_info["anchor_year"].values[0]) - int(
                p_info["anchor_age"].values[0]
            )
            patient = Patient(
                patient_id=p_id,
                birth_datetime=strptime(str(birth_year)),
                death_datetime=strptime(p_info.get("dod", pd.Series([None])).values[0]),
                gender=p_info["gender"].values[0],
                ethnicity=p_info["race"].values[0],
            )
            for v_id, v_info in p_info.groupby("hadm_id"):
                patient.add_visit(Visit(
                    visit_id=str(v_id),
                    patient_id=p_id,
                    encounter_time=strptime(v_info["admittime"].values[0]),
                    discharge_time=strptime(v_info["dischtime"].values[0]),
                    discharge_status=v_info["hospital_expire_flag"].values[0],
                    attr_dict={"icustays_num": 1},
                ))
            patients[p_id] = patient
        return patients

    def _add_events(self, df, table, vocab_fn, code_col, map_fn=None):
        for _, row in df.iterrows():
            p_id = str(row["subject_id"])
            v_id = str(row["hadm_id"])
            if p_id not in self.patients:
                continue
            code = str(row[code_col])
            if map_fn is not None:
                code = map_fn(code)
            self.patients[p_id].add_event(
                Event(code=code, table=table, vocabulary=vocab_fn(row),
                      visit_id=v_id, patient_id=p_id)
            )

    def _parse_diagnoses(self):
        df = _read(self.root, "diagnoses_icd",
                   dtype={"subject_id": str, "hadm_id": str, "icd_code": str})
        df = df.dropna(subset=["subject_id", "hadm_id", "icd_code", "icd_version"])
        self._add_events(
            df, "diagnoses_icd",
            lambda r: f"ICD{int(r['icd_version'])}CM", "icd_code",
        )

    def _parse_procedures(self):
        df = _read(self.root, "procedures_icd",
                   dtype={"subject_id": str, "hadm_id": str, "icd_code": str})
        df = df.dropna(subset=["subject_id", "hadm_id", "icd_code", "icd_version"])
        self._add_events(
            df, "procedures_icd",
            lambda r: f"ICD{int(r['icd_version'])}PROC", "icd_code",
        )

    def _parse_prescriptions(self):
        df = _read(self.root, "prescriptions",
                   dtype={"subject_id": str, "hadm_id": str, "ndc": str})
        df = df.dropna(subset=["subject_id", "hadm_id", "ndc"])
        self._add_events(
            df, "prescriptions",
            lambda r: "ATC" if self.ndc_to_atc else "NDC", "ndc",
            map_fn=lambda c: _apply_code_map(c, self.ndc_to_atc),
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
        df = df.sort_values(["patient_id", "start", "end"], ascending=True)
        if self.dev:
            keep = df["patient_id"].drop_duplicates().head(1000)
            df = df[df["patient_id"].isin(keep)]
        patients: dict[str, Patient] = {}
        for (p_id,), p_info in df.groupby(["patient_id"]):
            patient = Patient(
                patient_id=p_id,
                birth_datetime=strptime(str(p_info["dob"].values[0])),
                death_datetime=strptime(
                    p_info.get("dod", pd.Series([None])).values[0]
                ),
                gender=p_info["Gender"].values[0],
                ethnicity=p_info["Race"].values[0],
            )
            for v_id, v_info in p_info.groupby("visit_id"):
                patient.add_visit(Visit(
                    visit_id=str(v_id),
                    patient_id=p_id,
                    encounter_time=strptime(v_info["start"].values[0]),
                    discharge_time=strptime(v_info["end"].values[0]),
                    attr_dict={"icustays_num": 1},
                ))
            patients[p_id] = patient
        return patients

    def _parse_codes(self, table: str):
        df = _read(self.root, table,
                   dtype={"patient_id": str, "visit_id": str, "code_val": str})
        df = df.dropna(subset=["patient_id", "visit_id", "code_val"])
        df = df.sort_values(["patient_id", "visit_id", "code_val"], ascending=True)
        is_drug = table == "prescriptions"
        for _, row in df.iterrows():
            p_id = str(row["patient_id"])
            if p_id not in self.patients:
                continue
            code = str(row["code_val"])
            if is_drug:
                code = _apply_code_map(code, self.ndc_to_atc)
            self.patients[p_id].add_event(Event(
                code=code, table=table,
                vocabulary="ATC" if is_drug else str(row.get("icd_version", "")),
                visit_id=str(row["visit_id"]), patient_id=p_id,
            ))
