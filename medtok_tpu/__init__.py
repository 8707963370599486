"""medtok_tpu — TPU-native multimodal medical-code tokenizer framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
mims-harvard/MedTok (reference mounted at /root/reference)."""

__version__ = "0.1.0"

from medtok_tpu.config import MedTokConfig, ModelConfig, TrainConfig  # noqa: F401
