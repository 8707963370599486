"""Packed-text TRAIN step (TrainConfig.packed_text) vs the standard step:
loss/metrics/grad equality single-device and over the 8-device dp mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.config import MedTokConfig, TrainConfig
from medtok_tpu.data.packing import pack_code_batch
from medtok_tpu.data.synthetic import random_code_batch
from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
from medtok_tpu.parallel.mesh import DP_AXIS, make_mesh, shard_batch
from medtok_tpu.train.trainer import (
    _loss_fn,
    create_train_state,
    make_train_step,
)
from tests.test_model import tiny_config


def _setup(B=8, Lt=16, seed=0):
    mcfg = tiny_config(cross_attn_dropout=0.0)
    rng = np.random.default_rng(seed)
    batch = random_code_batch(
        rng, batch=B, text_len=Lt, max_nodes=8, max_edges_per_graph=12,
        text_vocab=1000, num_kg_nodes=500,
    )
    # variable-length contiguous texts (collate-realistic)
    ids = np.zeros((B, Lt), np.int32)
    am = np.zeros((B, Lt), np.int32)
    for b in range(B):
        n = int(rng.integers(3, Lt + 1))
        ids[b, :n] = rng.integers(1, 1000, n)
        am[b, :n] = 1
    batch = batch._replace(input_ids=jnp.asarray(ids),
                           attention_mask=jnp.asarray(am))
    return mcfg, jax.tree.map(jnp.asarray, batch), ids, am


def test_packed_loss_and_grads_match_unpacked():
    mcfg, batch, ids, am = _setup()
    cfg = MedTokConfig(model=mcfg, train=TrainConfig(global_batch_size=8))
    model = MultimodalTokenizer(mcfg)
    state = create_train_state(cfg, model, batch)
    packed = jax.tree.map(jnp.asarray, pack_code_batch(
        ids, am, shards=1, rows_per_shard=4, row_len=32
    ))
    rng = jax.random.PRNGKey(3)

    loss_u, (met_u, _) = _loss_fn(state.params, state.usage, model, batch,
                                  rng, cfg)
    loss_p, (met_p, _) = _loss_fn(state.params, state.usage, model, batch,
                                  rng, cfg, packed)
    np.testing.assert_allclose(float(loss_u), float(loss_p), rtol=1e-5)
    for k in met_u:
        np.testing.assert_allclose(float(met_u[k]), float(met_p[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

    gu = jax.grad(lambda p: _loss_fn(p, state.usage, model, batch, rng,
                                     cfg)[0])(state.params)
    gp = jax.grad(lambda p: _loss_fn(p, state.usage, model, batch, rng, cfg,
                                     packed)[0])(state.params)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gu), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(gp), key=key),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(ka))


def test_packed_train_step_8dev_matches_unpacked_8dev():
    """Over the SAME 8-device dp mesh (InfoNCE negatives are shard-local by
    design, so dp=8 vs dp=1 losses differ regardless of packing), the
    packed step — shard-local rows + gather — must equal the unpacked one."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mcfg, batch, ids, am = _setup(B=16)
    cfg = MedTokConfig(
        model=mcfg,
        train=TrainConfig(global_batch_size=16, packed_text=True),
    )
    mesh8 = make_mesh(dp=8, tp=1)
    model8 = MultimodalTokenizer(mcfg, dp_axis=DP_AXIS)
    state8 = create_train_state(cfg, model8, batch)

    step_u = make_train_step(cfg, model8, mesh8, donate=False, packed=False)
    _, m_u = step_u(state8, shard_batch(mesh8, batch))

    step_p = make_train_step(cfg, model8, mesh8, donate=False, packed=True)
    p8 = jax.tree.map(jnp.asarray, pack_code_batch(
        ids, am, shards=8, rows_per_shard=2, row_len=32
    ))
    _, m_p = step_p(state8, shard_batch(mesh8, batch),
                    shard_batch(mesh8, p8))
    np.testing.assert_allclose(float(m_u["loss"]), float(m_p["loss"]),
                               rtol=1e-5)
    for k in m_u:
        np.testing.assert_allclose(float(m_u[k]), float(m_p[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)


def test_trainer_fit_packed_runs_and_descends():
    """Trainer.fit with packed_text=True: auto row budget, loss finite and
    step counter advances."""
    from medtok_tpu.train.trainer import Trainer

    mcfg, batch, ids, am = _setup(B=8)
    cfg = MedTokConfig(
        model=mcfg,
        train=TrainConfig(global_batch_size=8, mesh_dp=1, packed_text=True,
                          packed_row_len=32, log_every=1),
    )
    losses = []
    trainer = Trainer(cfg, log_fn=lambda s, m: losses.append(m["loss"]))
    state = trainer.init_state(batch)
    state = trainer.fit(state, [batch] * 4, max_steps=4)
    assert int(state.step) == 4
    assert np.isfinite(losses).all()
