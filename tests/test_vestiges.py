"""Tests for the reference's vestigial utils rebuilt TPU-native: drop_path
(MedTok/utils/drop_path.py), ADM center-crop (MedTok/utils/data.py), and the
ZeRO config/sharding generator (MedTok/utils/deepspeed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medtok_tpu.ops.drop_path import DropPath, drop_path
from medtok_tpu.parallel.mesh import DP_AXIS, make_mesh
from medtok_tpu.utils.image import center_crop_arr
from medtok_tpu.utils.zero import (
    apply_zero,
    create_zero_config,
    dp_shard_spec,
    zero_plan,
)


class TestDropPath:
    def test_eval_identity(self):
        x = jnp.arange(24.0).reshape(4, 3, 2)
        rng = jax.random.PRNGKey(0)
        assert (drop_path(rng, x, 0.5, deterministic=True) == x).all()
        assert (drop_path(rng, x, 0.0) == x).all()

    def test_whole_sample_dropped_and_rescaled(self):
        # drop_path.py:17-21: per-SAMPLE bernoulli mask broadcast over all
        # non-batch dims, survivors scaled by 1/keep_prob.
        x = jnp.ones((512, 3, 2))
        out = drop_path(jax.random.PRNGKey(1), x, 0.5)
        per_sample = np.asarray(out.reshape(512, -1))
        # each sample is uniformly 0 or uniformly 2.0
        assert set(np.unique(per_sample).tolist()) <= {0.0, 2.0}
        assert (per_sample == per_sample[:, :1]).all()
        frac_kept = (per_sample[:, 0] > 0).mean()
        assert 0.35 < frac_kept < 0.65
        # expectation preserved by the rescale
        assert abs(float(out.mean()) - 1.0) < 0.15

    def test_no_rescale(self):
        x = jnp.ones((256, 4))
        out = drop_path(jax.random.PRNGKey(2), x, 0.25, scale_by_keep=False)
        assert set(np.unique(np.asarray(out)).tolist()) <= {0.0, 1.0}

    def test_module_rng_stream(self):
        m = DropPath(drop_prob=0.5)
        x = jnp.ones((64, 8))
        out = m.apply({}, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(3)})
        assert set(np.unique(np.asarray(out)).tolist()) <= {0.0, 2.0}
        assert (m.apply({}, x, deterministic=True) == x).all()

    def test_invalid_prob(self):
        with pytest.raises(ValueError):
            drop_path(jax.random.PRNGKey(0), jnp.ones((2, 2)), 1.0)


class TestCenterCrop:
    def test_shape_and_dtype(self):
        img = np.random.default_rng(0).integers(
            0, 256, size=(277, 413, 3), dtype=np.uint8
        )
        out = center_crop_arr(img, 64)
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.uint8

    def test_constant_preserved(self):
        img = np.full((300, 500, 3), 127, dtype=np.uint8)
        out = center_crop_arr(img, 64)
        assert np.abs(out.astype(int) - 127).max() <= 1

    def test_crop_is_centered(self):
        # bright square at the center of a dark image must survive the crop
        img = np.zeros((256, 384), dtype=np.float32)
        img[120:136, 184:200] = 1.0
        out = center_crop_arr(img, 64)
        assert out.shape == (64, 64)
        assert out.max() > 0.5
        # and the hot region sits in the middle of the crop
        cy, cx = np.unravel_index(np.argmax(out), out.shape)
        assert 16 <= cy <= 48 and 16 <= cx <= 48

    def test_matches_pil_reference_loosely(self):
        # data.py:4-22 via PIL, compared at an even-dims shape where the
        # BOX-halving loop is exact.
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(256, 320, 3), dtype=np.uint8)
        size = 64
        pil = Image.fromarray(img)
        while min(*pil.size) >= 2 * size:
            pil = pil.resize(
                tuple(x // 2 for x in pil.size), resample=Image.BOX
            )
        scale = size / min(*pil.size)
        pil = pil.resize(
            tuple(round(x * scale) for x in pil.size),
            resample=Image.BICUBIC,
        )
        ref = np.array(pil)
        cy = (ref.shape[0] - size) // 2
        cx = (ref.shape[1] - size) // 2
        ref = ref[cy : cy + size, cx : cx + size]

        out = center_crop_arr(img, size)
        # cubic kernels differ slightly (jax Keys cubic vs PIL bicubic);
        # agreement should still be near-exact on natural-noise content.
        err = np.abs(out.astype(int) - ref.astype(int))
        assert np.mean(err) < 4.0
        assert np.percentile(err, 95) < 12


class TestZero:
    def test_config_dict_shape(self):
        cfg = create_zero_config(
            global_batch_size=256, lr=3e-4, clip_grad=1.0, zero_stage=2,
            weight_decay=0.01,
        )
        assert cfg["train_batch_size"] == 256
        assert cfg["optimizer"]["params"]["betas"] == [0.9, 0.999]
        assert cfg["optimizer"]["adam_w_mode"] is True
        assert cfg["gradient_clipping"] == 1.0
        z = cfg["zero_optimization"]
        assert z == {
            "stage": 2,
            "shard_optimizer_state": True,
            "reduce_scatter_gradients": True,
            "shard_parameters": False,
        }

    def test_fp16_rejected(self):
        with pytest.raises(ValueError, match="fp16"):
            create_zero_config(global_batch_size=8, mixed_precision="fp16")

    def test_dp_shard_spec_picks_largest_divisible(self):
        assert dp_shard_spec((16, 64), 8) == jax.sharding.PartitionSpec(
            None, DP_AXIS
        )
        assert dp_shard_spec((3, 5), 8) == jax.sharding.PartitionSpec()
        assert dp_shard_spec((), 8) == jax.sharding.PartitionSpec()

    @staticmethod
    def _tiny_params():
        k = jax.random.PRNGKey(0)
        return {
            "w": jax.random.normal(k, (32, 16)),
            "b": jnp.zeros((16,)),
            "odd": jnp.ones((5,)),  # not divisible by 8 -> replicated
        }

    def test_stage3_shards_params_and_step_matches_replicated(self):
        mesh = make_mesh(dp=8, tp=1)
        params = self._tiny_params()
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)

        p3, o3 = apply_zero(3, mesh, params, opt_state)
        # params actually sharded: per-device addressable rows shrink 8x
        w_shard = p3["w"].addressable_shards[0].data
        assert w_shard.shape == (4, 16)
        assert p3["odd"].addressable_shards[0].data.shape == (5,)

        x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
        y = jax.random.normal(jax.random.PRNGKey(2), (64, 16))

        def step(params, opt_state):
            def loss(p):
                return jnp.mean((x @ p["w"] + p["b"] + p["odd"].sum() - y) ** 2)

            g = jax.grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        ref_p, _ = jax.jit(step)(params, opt_state)
        got_p, _ = jax.jit(step)(p3, o3)
        np.testing.assert_allclose(
            np.asarray(got_p["w"]), np.asarray(ref_p["w"]), rtol=1e-5,
            atol=1e-6,
        )

    def test_stage1_shards_opt_state_only(self):
        mesh = make_mesh(dp=8, tp=1)
        params = self._tiny_params()
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)
        plan = zero_plan(1, mesh, params, opt_state)
        specs = jax.tree.map(lambda s: s.spec, plan["params"])
        assert all(
            s == jax.sharding.PartitionSpec()
            for s in jax.tree.leaves(specs)
        )
        # adam mu/nu for 'w' sharded over dp
        mu_spec = jax.tree.map(lambda s: s.spec, plan["opt_state"])
        flat = jax.tree.leaves(
            mu_spec, is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec)
        )
        assert any(DP_AXIS in (ax or ()) for s in flat for ax in s)
