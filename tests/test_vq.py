"""Unit tests for the VQ core (SURVEY.md section 4a: golden outputs computed
with the PyTorch formulas, plus hand-computed tiny cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from medtok_tpu.ops import vq


def torch_soft_topk(z, codebook, k=5, l2_norm=True):
    """The reference formulas (vector_quantization_soft_one_new.py:147-165),
    re-implemented in torch as a golden."""
    z = torch.as_tensor(np.asarray(z), dtype=torch.float64)
    e = torch.as_tensor(np.asarray(codebook), dtype=torch.float64)
    if l2_norm:
        z_n = F.normalize(z, p=2, dim=-1)
        e_n = F.normalize(e, p=2, dim=-1)
    else:
        z_n, e_n = z, e
    d = (
        torch.sum(z_n**2, dim=1, keepdim=True)
        + torch.sum(e_n**2, dim=1)
        - 2 * torch.einsum("bd,dn->bn", z_n, e_n.T)
    )
    values, idx = torch.topk(d, k=k, largest=False)
    w = torch.softmax(-values, dim=1)
    z_q = (w.unsqueeze(-1) * e_n[idx]).sum(dim=1)
    return d.numpy(), values.numpy(), idx.numpy(), w.numpy(), z_q.numpy()


def test_squared_distance_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 64)).astype(np.float32)
    e = rng.normal(size=(210, 64)).astype(np.float32)
    d_jax = np.asarray(vq.squared_distance(jnp.asarray(x), jnp.asarray(e)))
    d_ref, *_ = torch_soft_topk(x, e, l2_norm=False)
    # fp64 golden distance is on raw inputs when l2_norm=False
    np.testing.assert_allclose(d_jax, d_ref, rtol=1e-4, atol=1e-4)


def test_soft_topk_quantize_matches_torch_golden():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(32, 64)).astype(np.float32)
    e = rng.normal(size=(512, 64)).astype(np.float32)
    out = vq.soft_topk_quantize(jnp.asarray(z), jnp.asarray(e), k=5, train=False)
    _, vals, idx, w, z_q = torch_soft_topk(z, e, k=5)
    np.testing.assert_array_equal(np.asarray(out.indices), idx)
    np.testing.assert_allclose(np.asarray(out.weights), w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.z_q_raw), z_q, rtol=1e-4, atol=1e-5)
    # eval: losses are zero (vq...py:174-178)
    assert float(out.vq_loss) == 0.0 and float(out.commit_loss) == 0.0


def test_topk_tie_break_lowest_index_first():
    # duplicate codewords -> tied distances; torch.topk picks lower index first
    e = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.5, 0.5]], np.float32)
    d = vq.squared_distance(
        vq.l2_normalize(jnp.asarray([[1.0, 0.0]])), vq.l2_normalize(jnp.asarray(e))
    )
    _, idx = vq.topk_smallest(d, 3)
    assert idx[0, 0] == 0 and idx[0, 1] == 2  # ties: index 0 before 2


def test_hand_computed_tiny_case():
    # codebook rows along axes; z = e_0 exactly -> d = [0, 2] after l2norm
    e = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    z = jnp.asarray([[2.0, 0.0]])  # normalizes to [1, 0]
    out = vq.soft_topk_quantize(z, e, k=2, train=False)
    d0, d1 = 0.0, 2.0
    w = np.exp([-d0, -d1]) / np.exp([-d0, -d1]).sum()
    np.testing.assert_allclose(np.asarray(out.weights[0]), w, rtol=1e-5)
    expected = w[0] * np.array([1, 0]) + w[1] * np.array([0, 1])
    np.testing.assert_allclose(np.asarray(out.z_q_raw[0]), expected, rtol=1e-5)


def test_losses_match_torch_formulas():
    rng = np.random.default_rng(2)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    e = rng.normal(size=(64, 16)).astype(np.float32)
    beta = 0.25
    out = vq.soft_topk_quantize(jnp.asarray(z), jnp.asarray(e), k=5, beta=beta, train=True)
    *_, z_q = torch_soft_topk(z, e, k=5)
    vq_ref = np.mean((z - z_q) ** 2)
    np.testing.assert_allclose(float(out.vq_loss), vq_ref, rtol=1e-4)
    np.testing.assert_allclose(float(out.commit_loss), beta * vq_ref, rtol=1e-4)


def test_straight_through_gradient():
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))

    def f(z):
        return jnp.sum(vq.soft_topk_quantize(z, e, train=False).z_q)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(z), rtol=1e-6)


def test_region_slice():
    e = jnp.arange(21 * 2, dtype=jnp.float32).reshape(21, 2)
    t = vq.region_slice(e, "text")
    g = vq.region_slice(e, "graph")
    assert t.shape[0] == 7 and g.shape[0] == 7
    np.testing.assert_array_equal(np.asarray(t), np.asarray(e[:7]))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(e[14:]))


def test_usage_fifo_matches_torch_unique_semantics():
    n_e = 50
    buf = jnp.zeros((12,), jnp.int32)
    counts = vq.usage_counts_init(n_e, 12)
    new = jnp.asarray([[3, 7], [7, 9]], jnp.int32)
    buf2, counts2, usage = vq.usage_update(buf, counts, new, n_e)
    ref = torch.zeros(12, dtype=torch.long)
    flat = torch.tensor([3, 7, 7, 9])
    ref[:-4] = ref[4:].clone()
    ref[-4:] = flat
    np.testing.assert_array_equal(np.asarray(buf2), ref.numpy())
    assert usage == pytest.approx(len(torch.unique(ref)) / n_e)
    # second update shifts the FIFO; counts stay in sync with buffer content
    buf3, counts3, usage3 = vq.usage_update(
        buf2, counts2, jnp.asarray([[1, 2, 3, 4]], jnp.int32), n_e
    )
    assert np.asarray(buf3)[-4:].tolist() == [1, 2, 3, 4]
    assert np.asarray(buf3)[-8:-4].tolist() == [3, 7, 7, 9]
    bincount = np.bincount(np.asarray(buf3), minlength=n_e)
    np.testing.assert_array_equal(np.asarray(counts3), bincount)
    assert usage3 == pytest.approx(len(np.unique(np.asarray(buf3))) / n_e)


def test_usage_fifo_long_run_counts_consistent():
    """After enough updates to wrap the FIFO several times, the incremental
    counts must still equal the buffer's true histogram."""
    rng = np.random.default_rng(0)
    n_e, size = 30, 16
    buf = jnp.zeros((size,), jnp.int32)
    counts = vq.usage_counts_init(n_e, size)
    for _ in range(20):
        new = jnp.asarray(rng.integers(0, n_e, size=(1, 5)), jnp.int32)
        buf, counts, usage = vq.usage_update(buf, counts, new, n_e)
    hist = np.bincount(np.asarray(buf), minlength=n_e)
    np.testing.assert_array_equal(np.asarray(counts), hist)
    assert usage == pytest.approx(len(np.unique(np.asarray(buf))) / n_e)


# ------------------------------------------------- grouped / two-pass -----

def _torch_topk_smallest(d, k):
    td = torch.as_tensor(np.asarray(d))
    v, i = torch.topk(td, k=k, largest=False)
    return v.numpy(), i.numpy()


def test_grouped_topk_exact_random():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3000)).astype(np.float32)
    v, i = jax.jit(lambda x: vq.topk_smallest_grouped(x, 5, group=256))(d)
    tv, ti = _torch_topk_smallest(d, 5)
    np.testing.assert_array_equal(np.asarray(i), ti)
    np.testing.assert_allclose(np.asarray(v), tv, rtol=0, atol=0)


def test_grouped_topk_exact_adversarial_ties():
    """All-equal values: winners are the k lowest indices; massive tie groups
    straddling group boundaries must not defeat the at-most-k-groups
    argument."""
    d = np.zeros((8, 2048), np.float32)
    v, i = vq.topk_smallest_grouped(jnp.asarray(d), 5, group=128)
    np.testing.assert_array_equal(np.asarray(i), np.tile(np.arange(5), (8, 1)))

    # two-level ties: value tied across many groups, plus a strictly smaller
    # singleton far from index 0
    d2 = np.ones((4, 2048), np.float32)
    d2[:, 1999] = 0.5
    v2, i2 = vq.topk_smallest_grouped(jnp.asarray(d2), 3, group=100)
    np.testing.assert_array_equal(
        np.asarray(i2), np.tile([1999, 0, 1], (4, 1)))


def test_grouped_topk_exact_vs_topk_fuzz():
    """Grouped must equal lax.top_k EXACTLY (lowest-index-first on ties) —
    torch's intra-tie order is unstable, so vs torch assert set equality +
    identical values (the parity harness's token_set_match standard)."""
    rng = np.random.default_rng(3)
    for trial in range(5):
        # quantized values force frequent exact ties
        d = rng.integers(0, 50, size=(32, 1234)).astype(np.float32)
        tv, ti = _torch_topk_smallest(d, 5)
        for group in (64, 512, 2048):
            v, i = vq.topk_smallest_grouped(jnp.asarray(d), 5, group=group)
            rv, ri = vq.topk_smallest(jnp.asarray(d), 5)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
            np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
            np.testing.assert_array_equal(np.asarray(v), tv)
            np.testing.assert_array_equal(
                np.sort(np.asarray(i), axis=1), np.sort(ti, axis=1))


def test_distance_topk_backends_agree():
    rng = np.random.default_rng(7)
    z = vq.l2_normalize(jnp.asarray(
        rng.normal(size=(128, 64)).astype(np.float32)))
    e = vq.l2_normalize(jnp.asarray(
        rng.normal(size=(2100, 64)).astype(np.float32)))
    v_ref, i_ref = vq.distance_topk(z, e, 5, backend="xla")
    for backend in ("grouped", "two_pass"):
        v, i = vq.distance_topk(z, e, 5, backend=backend)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref)), backend
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(v_ref), atol=2e-6), backend


def test_grouped_backend_gradients_match_xla():
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))

    def loss(backend):
        def f(z, e):
            zn, en = vq.l2_normalize(z), vq.l2_normalize(e)
            v, _ = vq.distance_topk(zn, en, 5, backend=backend)
            return jnp.sum(jax.nn.softmax(-v, axis=-1) * v)
        return jax.grad(f, argnums=(0, 1))(z, e)

    gz0, ge0 = loss("xla")
    gz1, ge1 = loss("grouped")
    np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge0), atol=1e-5)
