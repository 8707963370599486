"""Tensor-parallel codebook sweep: sharded top-k == single-device, and a
(dp x tp) 2-D-mesh train step agreeing with the dp-only step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from medtok_tpu.ops import vq
from tests.test_model import tiny_config


def test_distance_topk_tp_matches_single_device():
    rng = np.random.default_rng(0)
    B, N, D, k = 16, 64, 8, 5
    z = vq.l2_normalize(jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)))
    e = vq.l2_normalize(jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)))

    ref_vals, ref_idx = vq.topk_smallest(vq.squared_distance(z, e), k)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("dp", "tp"))
    f = jax.jit(jax.shard_map(
        lambda z, e: vq.distance_topk_tp(z, e, k, "tp"),
        mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
        check_vma=False,
    ))
    vals, idx = f(z, e)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-4, atol=1e-5)


def test_distance_topk_tp_region_restriction():
    rng = np.random.default_rng(1)
    B, N, D, k = 8, 24, 4, 3
    z = vq.l2_normalize(jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)))
    e = vq.l2_normalize(jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)))
    lo, hi = 16, 24  # graph region = last third

    ref_vals, ref_idx = vq.topk_smallest(vq.squared_distance(z, e[lo:hi]), k)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("dp", "tp"))
    f = jax.jit(jax.shard_map(
        lambda z, e: vq.distance_topk_tp(z, e, k, "tp", region=(lo, hi)),
        mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
        check_vma=False,
    ))
    vals, idx = f(z, e)
    np.testing.assert_array_equal(np.asarray(idx) - lo, np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-4, atol=1e-5)


def test_2d_mesh_train_step_matches_dp_only():
    from medtok_tpu.config import DataConfig, MedTokConfig, TrainConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.parallel.mesh import DP_AXIS, TP_AXIS, make_mesh, shard_batch

    mcfg = tiny_config()
    cfg = MedTokConfig(model=mcfg, data=DataConfig(),
                       train=TrainConfig(global_batch_size=8, ema=False))
    rng = np.random.default_rng(2)
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=8, text_len=16, max_nodes=8, max_edges_per_graph=8,
        text_vocab=1000, num_kg_nodes=500,
    ))

    from medtok_tpu.train.trainer import create_train_state, make_train_step

    # dp-only step on 4 devices
    mesh1 = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    model1 = MultimodalTokenizer(mcfg, dp_axis=DP_AXIS)
    state1 = create_train_state(cfg, model1, batch)
    step1 = make_train_step(cfg, model1, mesh1, donate=False)
    s1, m1 = step1(state1, shard_batch(mesh1, batch))

    # (dp=4, tp=2) on 8 devices — tp shards only the codebook sweep
    mesh2 = make_mesh(dp=4, tp=2, devices=jax.devices())
    model2 = MultimodalTokenizer(mcfg, dp_axis=DP_AXIS, tp_axis=TP_AXIS)
    state2 = create_train_state(cfg, model2, batch)
    step2 = make_train_step(cfg, model2, mesh2, donate=False)
    s2, m2 = step2(state2, shard_batch(mesh2, batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    p1 = jax.device_get(s1.params)
    p2 = jax.device_get(s2.params)
    d = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p1, p2)
    assert max(jax.tree.leaves(d)) < 1e-4


