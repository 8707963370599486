"""Vestigial augmentation utilities carried for reference completeness.

The reference ships two helper files that no entry point imports
(/root/reference/MedTok/utils/drop_path.py:4-33 — timm-style stochastic
depth — and /root/reference/MedTok/utils/data.py:4-22 — the ADM
center-crop). They are dead code there (SURVEY.md section 2.8) but part of
the public utils surface, so the TPU rebuild provides functional
equivalents: ``drop_path`` as a pure function over an explicit PRNG key
(the JAX idiom for the reference's in-place ``bernoulli_`` draw) and
``center_crop_arr`` as a pure-numpy pipeline (area-box halvings, bicubic
resize, center crop) with no PIL dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["drop_path", "center_crop_arr"]


def drop_path(
    x: jax.Array,
    key: jax.Array,
    drop_prob: float = 0.0,
    *,
    train: bool = True,
    scale_by_keep: bool = True,
) -> jax.Array:
    """Per-sample stochastic depth (drop_path.py:4-22).

    Zeroes entire samples (leading axis) with probability ``drop_prob`` and,
    like the reference, rescales survivors by 1/keep_prob so the expectation
    is unchanged. Identity when ``drop_prob == 0`` or ``train`` is False.
    """
    if drop_prob == 0.0 or not train:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(key, keep_prob, shape).astype(x.dtype)
    if keep_prob > 0.0 and scale_by_keep:
        keep = keep / keep_prob
    return x * keep


def _resize_box_half(arr: np.ndarray) -> np.ndarray:
    """Halve both spatial dims by 2x2 box averaging (PIL Image.BOX at //2)."""
    h, w = arr.shape[0] // 2 * 2, arr.shape[1] // 2 * 2
    a = arr[:h, :w].astype(np.float64)
    return (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2]) / 4.0


def _cubic_kernel(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (PIL BICUBIC uses a = -0.5)."""
    t = np.abs(t)
    return np.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )


def _resize_bicubic_axis(arr: np.ndarray, new_len: int, axis: int) -> np.ndarray:
    old_len = arr.shape[axis]
    if old_len == new_len:
        return arr
    scale = old_len / new_len
    centers = (np.arange(new_len) + 0.5) * scale - 0.5
    base = np.floor(centers).astype(np.int64)
    out_shape = list(arr.shape)
    out_shape[axis] = new_len
    out = np.zeros(out_shape, np.float64)
    wsum = np.zeros(new_len, np.float64)
    moved = np.moveaxis(arr.astype(np.float64), axis, 0)
    acc = np.zeros((new_len,) + moved.shape[1:], np.float64)
    for off in (-1, 0, 1, 2):
        idx = np.clip(base + off, 0, old_len - 1)
        w = _cubic_kernel(centers - (base + off))
        acc += w.reshape((-1,) + (1,) * (moved.ndim - 1)) * moved[idx]
        wsum += w
    acc /= wsum.reshape((-1,) + (1,) * (moved.ndim - 1))
    out = np.moveaxis(acc, 0, axis)
    return out


def center_crop_arr(arr: np.ndarray, image_size: int) -> np.ndarray:
    """ADM center crop (data.py:4-22) on a [H, W] or [H, W, C] numpy array.

    Repeated 2x box downsampling while min side >= 2*image_size, one bicubic
    resize so min side == image_size, then a centered square crop. Returns
    the same dtype as the input (rounded for integer inputs).
    """
    if image_size <= 0:
        raise ValueError("image_size must be positive")
    out = arr
    while min(out.shape[0], out.shape[1]) >= 2 * image_size:
        out = _resize_box_half(out)
    scale = image_size / min(out.shape[0], out.shape[1])
    nh, nw = round(out.shape[0] * scale), round(out.shape[1] * scale)
    out = _resize_bicubic_axis(_resize_bicubic_axis(out, nh, 0), nw, 1)
    cy = (out.shape[0] - image_size) // 2
    cx = (out.shape[1] - image_size) // 2
    out = out[cy:cy + image_size, cx:cx + image_size]
    if np.issubdtype(arr.dtype, np.integer):
        info = np.iinfo(arr.dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(arr.dtype)
    return out.astype(arr.dtype)
