from medtok_tpu.ehr.data import Event, Patient, Visit  # noqa: F401
from medtok_tpu.ehr.parsers import (  # noqa: F401
    EHRShotDataset,
    MIMIC3Dataset,
    MIMIC4Dataset,
)
from medtok_tpu.ehr.tasks import CodeMapper, PatientEHRTasks, build_labels  # noqa: F401
