"""Load the PyTorch reference quantizer as a live parity oracle.

The north-star parity claim is "exact token IDs vs the PyTorch reference"
(BASELINE.json). torch + einops are installed in this environment, so the
reference ``VectorQuantizer`` / ``CrossAttention``
(/root/reference/MedTok/vector_quantization_soft_one_new.py:17-271) can be
imported directly and run side-by-side with :class:`SoftVQQuantizer` after a
weight conversion. This module provides:

- :func:`load_reference_vq_module` — imports the reference file without
  executing the package ``__init__`` (which needs dgl, absent here);
- :func:`convert_torch_mha` — splits torch ``nn.MultiheadAttention``'s packed
  ``in_proj_weight``/``in_proj_bias`` into flax q/k/v/out Dense params;
- :func:`convert_torch_quantizer` — full reference-VQ state_dict -> the
  SoftVQQuantizer param pytree.

Everything here is torch-optional: importing this module does not import
torch; the reference tree is only touched read-only.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
_VQ_FILE = "MedTok/vector_quantization_soft_one_new.py"


def reference_available(root: Path | str = REFERENCE_ROOT) -> bool:
    return (Path(root) / _VQ_FILE).exists()


def load_reference_vq_module(root: Path | str = REFERENCE_ROOT):
    """Import the reference quantizer module by file path.

    ``MedTok/__init__.py`` imports dgl (not installed), so a stub package
    entry with only ``__path__`` is registered first; the submodule import
    ``from MedTok.norm_ema_quantizer import ...`` then resolves through the
    package path without running the ``__init__`` body.
    """
    root = Path(root)
    name = "MedTok.vector_quantization_soft_one_new"
    if name in sys.modules:
        return sys.modules[name]
    if "MedTok" not in sys.modules:
        pkg = types.ModuleType("MedTok")
        pkg.__path__ = [str(root / "MedTok")]
        sys.modules["MedTok"] = pkg
    spec = importlib.util.spec_from_file_location(name, root / _VQ_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def convert_torch_mha(sd: dict, prefix: str) -> dict:
    """torch ``nn.MultiheadAttention`` params -> flax MultiheadAttention.

    torch packs q/k/v input projections row-wise into
    ``in_proj_weight [3E, E]`` / ``in_proj_bias [3E]``; flax Dense kernels are
    the transpose of torch Linear weights.
    """
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    e = w.shape[1]
    assert w.shape[0] == 3 * e, f"packed in_proj must be [3E, E], got {w.shape}"
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": w[i * e:(i + 1) * e].T.copy(),
            "bias": b[i * e:(i + 1) * e].copy(),
        }
    out["out_proj"] = {
        "kernel": _np(sd[f"{prefix}.out_proj.weight"]).T.copy(),
        "bias": _np(sd[f"{prefix}.out_proj.bias"]).copy(),
    }
    return out


def _linear(sd: dict, prefix: str) -> dict:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def convert_torch_encoder_layer(sd: dict, prefix: str = "") -> dict:
    """torch ``nn.TransformerEncoderLayer`` (post-norm, ReLU — the EHR
    encoder's building block, EHRModel_token.py:236) -> our
    ehr.model.TransformerEncoderLayer params."""
    p = prefix + "." if prefix else ""

    def norm(name):
        return {
            "scale": _np(sd[f"{p}{name}.weight"]).copy(),
            "bias": _np(sd[f"{p}{name}.bias"]).copy(),
        }

    return {
        "self_attn": convert_torch_mha(sd, f"{p}self_attn"),
        "norm1": norm("norm1"),
        "norm2": norm("norm2"),
        "linear1": _linear(sd, f"{p}linear1"),
        "linear2": _linear(sd, f"{p}linear2"),
    }


def convert_torch_quantizer(sd: dict, *, num_layers: int = 2) -> dict:
    """Reference ``VectorQuantizer.state_dict()`` -> SoftVQQuantizer params.

    Layout mirrors vector_quantization_soft_one_new.py:90-118: one codebook
    ``nn.Embedding(n_e, e_dim)``, a 2-layer shared bidirectional
    CrossAttention stack, and proj_text/proj_graph Linears.
    """
    cross = {}
    for i in range(num_layers):
        tp = f"cross_attn.model.{i}"
        cross[f"layer_{i}"] = {
            "multihead_attn": convert_torch_mha(sd, f"{tp}.multihead_attn"),
            "layer_norm": {
                "scale": _np(sd[f"{tp}.layer_norm.weight"]).copy(),
                "bias": _np(sd[f"{tp}.layer_norm.bias"]).copy(),
            },
        }
    return {
        "codebook": _np(sd["codebook.weight"]).copy(),
        "cross_attn": cross,
        "proj_text": _linear(sd, "proj_text"),
        "proj_graph": _linear(sd, "proj_graph"),
    }
