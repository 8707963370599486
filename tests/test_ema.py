"""EMA quantizer family: torch-formula goldens + the distributed invariant
(per-shard stats psum'd over 8 CPU devices == single-device full batch)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from medtok_tpu.ops import ema as ema_ops


def torch_norm_ema_step(weight, z_flat, decay=0.99, beta=0.25):
    """Reference training update (norm_ema_quantizer.py:175-212) in torch."""
    w = torch.as_tensor(weight, dtype=torch.float64)
    z = F.normalize(torch.as_tensor(z_flat, dtype=torch.float64), dim=-1)
    d = z.pow(2).sum(1, keepdim=True) + w.pow(2).sum(1) - 2 * z @ w.t()
    idx = torch.argmin(d, dim=1)
    z_q = w[idx]
    enc = F.one_hot(idx, w.shape[0]).double()
    bins = enc.sum(0)
    zero = bins == 0
    bins_c = bins.masked_fill(zero, 1.0)
    embed_sum = z.t() @ enc
    emb_n = F.normalize((embed_sum / bins_c.unsqueeze(0)).t(), dim=-1)
    emb_n = torch.where(zero[:, None], w, emb_n)
    new_w = F.normalize(w * decay + emb_n * (1 - decay), dim=-1)
    loss = beta * torch.mean((z_q - z) ** 2)
    return idx.numpy(), new_w.numpy(), loss.item(), bins.numpy()


def test_norm_ema_quantize_matches_torch():
    rng = np.random.default_rng(0)
    C, D, N = 32, 16, 64
    w = rng.normal(size=(C, D)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    z = rng.normal(size=(N, D)).astype(np.float32)

    state = ema_ops.EmbeddingEMAState(
        weight=jnp.asarray(w), cluster_size=jnp.zeros(C),
        embed_avg=jnp.asarray(w), initted=jnp.asarray(True),
    )
    out = ema_ops.norm_ema_quantize(
        jnp.asarray(z), state, jnp.zeros(C), decay=0.99, train=True
    )
    ref_idx, ref_w, ref_loss, ref_bins = torch_norm_ema_step(w, z)
    np.testing.assert_array_equal(np.asarray(out.indices), ref_idx)
    np.testing.assert_allclose(np.asarray(out.state.weight), ref_w,
                               rtol=1e-4, atol=1e-5)
    assert float(out.loss) == pytest.approx(ref_loss, rel=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.cluster_size), 0.01 * ref_bins, rtol=1e-5
    )


def test_sharded_ema_equals_single_device():
    """psum'd per-shard stats == full-batch stats (SURVEY.md section 5.8:
    'numerically identical because the update is a pure function of the
    summed statistics')."""
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(1)
    C, D, N = 16, 8, 32
    w = rng.normal(size=(C, D)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    z = rng.normal(size=(N, D)).astype(np.float32)

    state = ema_ops.EmbeddingEMAState(
        weight=jnp.asarray(w), cluster_size=jnp.zeros(C),
        embed_avg=jnp.asarray(w), initted=jnp.asarray(True),
    )
    single = ema_ops.norm_ema_quantize(jnp.asarray(z), state, jnp.zeros(C))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("dp",))

    def sharded_fn(z, state, cs):
        out = ema_ops.norm_ema_quantize(z, state, cs, axis_name="dp")
        return out.state.weight, out.cluster_size, out.indices

    f = jax.jit(jax.shard_map(
        sharded_fn, mesh=mesh,
        in_specs=(P("dp"), P(), P()),
        out_specs=(P(), P(), P("dp")),
        check_vma=False,
    ))
    w8, cs8, idx8 = f(jnp.asarray(z), state, jnp.zeros(C))
    np.testing.assert_allclose(np.asarray(w8), np.asarray(single.state.weight),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs8), np.asarray(single.cluster_size),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx8), np.asarray(single.indices))


def test_kmeans_properties():
    rng = np.random.default_rng(2)
    # 3 well-separated blobs
    centers = np.asarray([[10, 0], [-10, 0], [0, 10]], np.float32)
    pts = np.concatenate([
        centers[i] + rng.normal(0, 0.1, size=(20, 2)).astype(np.float32)
        for i in range(3)
    ])
    means, bins = ema_ops.kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 3)
    assert float(bins.sum()) == 60
    # every blob center is near some mean
    for c in centers:
        dmin = np.min(np.linalg.norm(np.asarray(means) - c, axis=1))
        assert dmin < 1.0


def test_weight_update_laplace_smoothing():
    C, D = 4, 2
    state = ema_ops.EmbeddingEMAState(
        weight=jnp.zeros((C, D)),
        cluster_size=jnp.asarray([2.0, 0.0, 1.0, 1.0]),
        embed_avg=jnp.ones((C, D)),
        initted=jnp.asarray(True),
    )
    out = ema_ops.weight_update(state, eps=1e-5)
    # torch golden
    c = torch.tensor([2.0, 0.0, 1.0, 1.0])
    n = c.sum()
    smoothed = (c + 1e-5) / (n + 4 * 1e-5) * n
    ref = (torch.ones(4, 2) / smoothed.unsqueeze(1)).numpy()
    np.testing.assert_allclose(np.asarray(out.weight), ref, rtol=1e-5)


def test_lookup_quantize():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(8, 4)).astype(np.float32)
    state = ema_ops.EmbeddingEMAState(
        weight=jnp.asarray(w), cluster_size=jnp.zeros(8),
        embed_avg=jnp.asarray(w), initted=jnp.asarray(True),
    )
    idx = jnp.asarray([1, 3, 5])
    z_q, loss = ema_ops.lookup_quantize(state, idx)
    np.testing.assert_allclose(np.asarray(z_q), w[[1, 3, 5]])
    assert float(loss) == 0.0
    z = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    _, loss2 = ema_ops.lookup_quantize(state, idx, z, beta=0.25)
    ref = 0.25 * np.mean((w[[1, 3, 5]] - np.asarray(z)) ** 2)
    assert float(loss2) == pytest.approx(ref, rel=1e-5)


def test_revival_quantize_runs_and_revives():
    rng = np.random.default_rng(4)
    C, D, N = 8, 4, 32
    w = rng.normal(size=(C, D)).astype(np.float32)
    state = ema_ops.EmbeddingEMAState(
        weight=jnp.asarray(w / np.linalg.norm(w, axis=-1, keepdims=True)),
        cluster_size=jnp.zeros(C), embed_avg=jnp.asarray(w),
        initted=jnp.asarray(True),
    )
    pool = ema_ops.feature_pool_init(jax.random.PRNGKey(0), C, D)
    z = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    for anchor in ("closest", "random", "probrandom"):
        out = ema_ops.revival_quantize(
            jax.random.PRNGKey(1), z, state, jnp.zeros(C), pool,
            anchor=anchor, contras_loss=True,
        )
        assert out.z_q.shape == z.shape
        assert np.isfinite(float(out.loss))
        assert np.isfinite(float(out.contra_loss))
        assert out.indices.shape == (N,)
        # codebook moved (EMA + revival)
        assert float(jnp.abs(out.state.weight - state.weight).max()) > 0


def test_maybe_kmeans_init_is_lazy():
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.normal(size=(40, 4)).astype(np.float32))
    s0 = ema_ops.embedding_ema_init(jax.random.PRNGKey(0), 8, 4, kmeans_init=True)
    assert not bool(s0.initted)
    s1 = ema_ops.maybe_kmeans_init(jax.random.PRNGKey(1), s0, data)
    assert bool(s1.initted)
    assert float(jnp.abs(s1.weight).sum()) > 0
    # second call is a no-op on the weight
    s2 = ema_ops.maybe_kmeans_init(jax.random.PRNGKey(2), s1, data * 2)
    np.testing.assert_allclose(np.asarray(s2.weight), np.asarray(s1.weight))
