"""Tests for the vestigial augmentation utils (reference utils/drop_path.py,
utils/data.py — dead code there, SURVEY.md section 2.8, carried for surface
completeness)."""

import jax
import jax.numpy as jnp
import numpy as np

from medtok_tpu.utils.augment import center_crop_arr, drop_path


def test_drop_path_identity_eval_and_p0():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4, 3)))
    key = jax.random.PRNGKey(1)
    np.testing.assert_array_equal(drop_path(x, key, 0.0, train=True), x)
    np.testing.assert_array_equal(drop_path(x, key, 0.5, train=False), x)


def test_drop_path_per_sample_zeroing_and_rescale():
    # whole samples are either zeroed or scaled by exactly 1/keep_prob
    # (reference drop_path.py:16-21: bernoulli over the leading axis only)
    x = jnp.ones((512, 3, 2))
    out = np.asarray(drop_path(x, jax.random.PRNGKey(2), 0.3))
    per_sample = out.reshape(512, -1)
    is_zero = np.all(per_sample == 0.0, axis=1)
    is_scaled = np.all(np.isclose(per_sample, 1.0 / 0.7), axis=1)
    assert np.all(is_zero | is_scaled)
    # E[survivors] = keep_prob; 512 draws keep this in a loose band
    assert 0.55 < is_scaled.mean() < 0.85


def test_drop_path_no_rescale_flag():
    x = jnp.ones((256, 2))
    out = np.asarray(
        drop_path(x, jax.random.PRNGKey(3), 0.5, scale_by_keep=False)
    )
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_center_crop_shape_and_dtype():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (480, 640, 3)).astype(np.uint8)
    out = center_crop_arr(img, 64)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.uint8


def test_center_crop_exact_on_flat_image():
    # a constant image survives box/bicubic resampling exactly (kernel
    # weights are normalized), so the crop is constant too
    img = np.full((300, 500), 7.0, np.float32)
    out = center_crop_arr(img, 32)
    assert out.shape == (32, 32)
    np.testing.assert_allclose(out, 7.0, atol=1e-6)


def test_center_crop_centered():
    # bright centered square stays centered through the pipeline
    img = np.zeros((256, 256), np.float32)
    img[96:160, 96:160] = 1.0
    out = center_crop_arr(img, 64)
    # center pixel bright, corners dark
    assert out[32, 32] > 0.9
    assert out[0, 0] < 0.1 and out[-1, -1] < 0.1
