from medtok_tpu.data.types import CodeBatch, TokenizedCodes  # noqa: F401
