"""Soft top-k vector-quantization primitives (pure JAX, fp32 distance math).

Semantics mirror the reference VectorQuantizer
(/root/reference/MedTok/vector_quantization_soft_one_new.py:120-217):

- squared-L2 distance ``d = |x|^2 + |e|^2 - 2 x e^T`` (get_distance, :120-125)
- top-k=5 *smallest* distances with lowest-index tie-break (torch.topk
  largest=False semantics, :157-159)
- assignment weights ``softmax(-d_topk)`` (:158-160)
- quantized vector = weight-averaged *normalized* codewords (:164-165)
- VQ + beta*commit losses with stop-gradient on each side (:169-178, 207-212)
- straight-through estimator ``z + sg(z_q - z)`` (:181-182, 214)
- region-restricted quantization: text uses codebook rows [0, n/3), graph uses
  rows [n - n/3, n) (:194-200). Returned indices are region-local, matching
  the reference (which indexes the *sliced* codebook).

All distance/softmax math runs in float32 regardless of the compute dtype —
top-k ordering must be deterministic for token-ID parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Matches torch.nn.functional.normalize(p=2): x / max(|x|, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def squared_distance(x: jax.Array, e: jax.Array) -> jax.Array:
    """Pairwise squared-L2 distance, fp32 accumulation.

    x: [B, D], e: [N, D] -> [B, N].
    Mirrors get_distance (vector_quantization_soft_one_new.py:120-125).
    """
    x = x.astype(jnp.float32)
    e = e.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # [B, 1]
    e_sq = jnp.sum(e * e, axis=1)  # [N]
    cross = jax.lax.dot_general(
        x, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, N]
    return x_sq + e_sq[None, :] - 2.0 * cross


def topk_smallest(d: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Indices/values of the k smallest entries per row, lowest-index-first on
    ties (torch.topk(largest=False) ordering). Returns (values, indices)."""
    neg_vals, idx = jax.lax.top_k(-d, k)
    return -neg_vals, idx


def topk_smallest_grouped(
    d: jax.Array, k: int, *, group: int = 512
) -> tuple[jax.Array, jax.Array]:
    """EXACT k-smallest with torch tie-break via a grouped two-level reduce.

    ``lax.top_k`` over a [B, N] row is the VPU-bound tail of the codebook
    sweep (a partial sort touches every element several times). This replaces
    it with: (1) one min + one argmin pass per ``group``-sized column block
    — ``argmin`` natively returns the FIRST index on ties, i.e. the
    lexicographic (value, index) minimum; (2) a two-key sort of the G = N/group
    group minima; (3) an exact two-key sort over the k*group candidate columns
    of the k winning groups.

    Exactness argument (not an approximation): lexicographic (value, index)
    order is TOTAL, so the k global winners are the k lex-smallest elements.
    Any group containing a winner has its lex-min lex-<= that winner, and
    every group's lex-min that is lex-<= the k-th winner must itself BE one
    of the k winners (there are exactly k elements lex-<= the k-th winner).
    Hence winners occupy at most k groups and each such group ranks in the
    top-k groups by lex-min — step (2) with exactly k groups never drops a
    winner. Verified against the brute-force path on adversarial all-ties
    data in tests/test_vq.py.

    ``d`` must be finite (no +inf masking — the one-hot extraction matmul
    would produce NaN from 0*inf); mask with ``jnp.finfo(f32).max`` instead.
    """
    B, N = d.shape
    G = -(-N // group)
    if G <= k:  # degenerate: grouping can't shrink the problem
        return topk_smallest(d, k)
    pad = G * group - N
    if pad:
        # finite max, not inf: the one-hot extraction matmul below would turn
        # inf * 0.0 into NaN for every non-selected group's padded columns
        d = jnp.pad(d, ((0, 0), (0, pad)),
                    constant_values=float(jnp.finfo(jnp.float32).max))
    dg = d.reshape(B, G, group)
    gmin = jnp.min(dg, axis=-1)                       # [B, G]
    gloc = jnp.argmin(dg, axis=-1).astype(jnp.int32)  # first index on ties
    gidx = gloc + jnp.arange(G, dtype=jnp.int32)[None, :] * group

    # top-k groups by lexicographic (min value, global argmin index)
    _, _, gsel = jax.lax.sort(
        (gmin, gidx, jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None, :],
                                      (B, G))),
        dimension=1, num_keys=2,
    )
    gsel = gsel[:, :k]                                # [B, k] winning groups

    # extract the winning groups' columns as a one-hot MXU matmul —
    # per-row take_along_axis gathers of k*group columns measured 6-20x
    # slower than the whole sweep on TPU; selecting with a {0,1} matrix at
    # HIGHEST precision is exact (each output sums exactly one product x*1)
    onehot = jax.nn.one_hot(gsel, G, dtype=jnp.float32)        # [B, k, G]
    cand = jax.lax.dot_general(
        onehot, dg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(B, k * group)                           # [B, k*group]
    cols = (gsel[:, :, None] * group
            + jnp.arange(group, dtype=jnp.int32)[None, None, :]
            ).reshape(B, k * group)                   # matching global ids
    sv, si = jax.lax.sort((cand, cols), dimension=1, num_keys=2)
    return sv[:, :k], si[:, :k]


def _use_pallas(batch: int, n_codes: int, backend: str) -> bool:
    """Backend for the distance+top-k sweep: 'xla' (matmul + lax.top_k),
    'pallas' (fused kernel, ops/vq_pallas.py), or 'auto' (pallas on TPU for
    codebooks large enough to pay off). Configured per-quantizer via
    QuantizerConfig.topk_backend."""
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    # measured on v5e (BENCH_r02: 1.08x at 8192x21000; see PERF.md): the
    # fused kernel ties-to-slightly-wins XLA on time from ~2K rows and large
    # codebooks, and never materializes the [B, N] distance matrix in HBM
    return (
        jax.default_backend() == "tpu" and batch >= 2048 and n_codes >= 4096
    )


def distance_topk_two_pass(
    z_n: jax.Array, e_n: jax.Array, k: int, *, m: int | None = None,
    group: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Two-pass sweep: bf16-input candidate scan + exact fp32 rescore.

    Pass 1 runs the O(B*N*D) cross matmul with bf16 inputs / fp32
    accumulation (one MXU pass instead of the 3-6 passes an fp32-exact
    matmul costs on TPU) and takes m >> k candidates with the grouped
    reduce. Pass 2 recomputes the m candidate distances exactly in fp32 and
    finishes with the two-key (value, index) sort.

    NOT formally exact: input rounding to bf16 perturbs pass-1 distances by
    ~|2*z.e|*2^-9, so a true winner further than that margin below the m-th
    candidate cannot be lost, but adversarial data could defeat any fixed m.
    The default m = max(4k, 16) leaves a wide margin; exactness at the
    production shape is validated empirically by the parity harness
    (scripts/run_parity_oracle.py sweeps). Use 'grouped' for guaranteed
    exactness."""
    if m is None:
        m = max(4 * k, 16)
    z32 = z_n.astype(jnp.float32)
    e32 = e_n.astype(jnp.float32)
    cross = jax.lax.dot_general(
        z32.astype(jnp.bfloat16), e32.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, N]
    e_sq = jnp.sum(e32 * e32, axis=1)
    d_approx = e_sq[None, :] - 2.0 * cross  # x_sq is row-constant: rank-free
    _, cand = topk_smallest_grouped(d_approx, m, group=group)

    g = e32[cand]  # [B, m, D]
    d_exact = (
        jnp.sum(z32 * z32, axis=-1, keepdims=True)
        + jnp.sum(g * g, axis=-1)
        - 2.0 * jnp.einsum("bd,bmd->bm", z32, g,
                           preferred_element_type=jnp.float32)
    )
    sv, si = jax.lax.sort((d_exact, cand), dimension=1, num_keys=2)
    return sv[:, :k], si[:, :k]


def distance_topk(
    z_n: jax.Array, e_n: jax.Array, k: int, *, backend: str = "auto"
) -> tuple[jax.Array, jax.Array]:
    """k smallest squared-L2 distances (values, indices) of z_n rows against
    e_n rows. The pallas path computes indices with the fused kernel and then
    recomputes the selected distances differentiably (a [B,k,D] gather) so
    gradients w.r.t. z and the codebook match the XLA top_k path (torch
    backprops through topk.values the same way).

    backend: 'xla' (fp32 matmul + lax.top_k), 'grouped' (fp32 matmul + exact
    two-level reduce — same results, cheaper tail), 'two_pass' (bf16 candidate
    scan + fp32 rescore), 'pallas' (fused kernel), 'auto' (measured best)."""
    if backend == "grouped":
        d = squared_distance(z_n, e_n)
        vals, idx = topk_smallest_grouped(d, k)
        g = e_n[jax.lax.stop_gradient(idx)]  # differentiable recompute
        vals = (
            jnp.sum(z_n * z_n, axis=-1, keepdims=True)
            + jnp.sum(g * g, axis=-1)
            - 2.0 * jnp.einsum("bd,bkd->bk", z_n, g)
        )
        return vals, idx
    if backend == "two_pass":
        vals, idx = distance_topk_two_pass(z_n, e_n, k)
        g = e_n[jax.lax.stop_gradient(idx)]
        vals = (
            jnp.sum(z_n * z_n, axis=-1, keepdims=True)
            + jnp.sum(g * g, axis=-1)
            - 2.0 * jnp.einsum("bd,bkd->bk", z_n, g)
        )
        return vals, idx
    if _use_pallas(z_n.shape[0], e_n.shape[0], backend):
        from medtok_tpu.ops.vq_pallas import fused_topk_l2

        _, idx = fused_topk_l2(z_n, e_n, k=k, tile_b=256, tile_n=2048)
        idx = jax.lax.stop_gradient(idx)
        g = e_n[idx]  # [B, k, D]
        vals = (
            jnp.sum(z_n * z_n, axis=-1, keepdims=True)
            + jnp.sum(g * g, axis=-1)
            - 2.0 * jnp.einsum("bd,bkd->bk", z_n, g)
        )
        return vals, idx
    d = squared_distance(z_n, e_n)
    return topk_smallest(d, k)


def distance_topk_tp(
    z_n: jax.Array,
    e_n: jax.Array,
    k: int,
    tp_axis: str,
    *,
    region: tuple[int, int] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Tensor-parallel top-k codebook sweep (inside shard_map over ``tp_axis``).

    The codebook is replicated in memory but the O(B*N*D) distance matmul is
    computed shard-wise: each tp rank scans rows [r*N/tp, (r+1)*N/tp), local
    top-k candidates ([B, k] values+global ids) are all-gathered over ICI and
    merged with a two-key lexicographic sort (value, then global index — the
    torch.topk tie-break). The returned values are recomputed differentiably
    from the replicated codebook, so gradients are identical on every tp rank
    and no extra collectives are needed in the backward pass.

    ``region`` restricts candidates to global rows [lo, hi) by masking —
    the sharded equivalent of the reference's codebook slicing
    (vector_quantization_soft_one_new.py:194-200).
    """
    n = e_n.shape[0]
    tp = jax.lax.axis_size(tp_axis)
    assert n % tp == 0, f"codebook rows {n} not divisible by tp={tp}"
    ln = n // tp
    r = jax.lax.axis_index(tp_axis)
    shard = jax.lax.dynamic_slice_in_dim(jax.lax.stop_gradient(e_n), r * ln, ln)

    d = squared_distance(jax.lax.stop_gradient(z_n), shard)  # [B, ln]
    gids = r * ln + jnp.arange(ln)
    if region is not None:
        lo, hi = region
        d = jnp.where((gids >= lo) & (gids < hi), d, jnp.inf)
    vals, li = topk_smallest(d, k)
    gi = gids[li]

    all_vals = jax.lax.all_gather(vals, tp_axis, axis=1, tiled=True)  # [B, tp*k]
    all_idx = jax.lax.all_gather(gi, tp_axis, axis=1, tiled=True)
    svals, sidx = jax.lax.sort(
        (all_vals, all_idx.astype(jnp.int32)), dimension=1, num_keys=2
    )
    idx = sidx[:, :k]

    # differentiable recompute from the replicated codebook
    g = e_n[idx]  # [B, k, D]
    values = (
        jnp.sum(z_n * z_n, axis=-1, keepdims=True)
        + jnp.sum(g * g, axis=-1)
        - 2.0 * jnp.einsum("bd,bkd->bk", z_n, g)
    )
    return values, idx


class QuantizeOut(NamedTuple):
    z_q: jax.Array        # [B, D] straight-through quantized output
    z_q_raw: jax.Array    # [B, D] quantized output without STE (for losses)
    indices: jax.Array    # [B, k] codeword indices (region-local if restricted)
    weights: jax.Array    # [B, k] softmax(-d) assignment weights
    vq_loss: jax.Array    # scalar, mean((sg(z) - z_q)^2)
    commit_loss: jax.Array  # scalar, beta * mean((z - sg(z_q))^2)


def soft_topk_quantize(
    z: jax.Array,
    codebook: jax.Array,
    *,
    k: int = 5,
    beta: float = 0.25,
    l2_norm: bool = True,
    train: bool = True,
    tp_axis: str | None = None,
    region: tuple[int, int] | None = None,
    backend: str = "auto",
) -> QuantizeOut:
    """Soft top-k quantization of ``z`` against ``codebook`` rows.

    The distance is computed between *normalized* z and *normalized* codewords
    when ``l2_norm``; the quantized output is the weighted sum of normalized
    codewords; but the VQ/commit losses and the STE compare against the
    **unnormalized** z — exactly the reference's arrangement
    (vector_quantization_soft_one_new.py:147-182, 194-214).

    ``tp_axis`` shards the distance sweep over a mesh axis (inside shard_map);
    ``region`` (tp only; non-tp callers pass the pre-sliced codebook) restricts
    to global rows [lo, hi) and makes the returned indices region-LOCAL, the
    reference's convention of indexing a sliced codebook. Both paths share one
    softmax/loss/STE tail so the semantics cannot diverge.
    """
    z32 = z.astype(jnp.float32)
    if l2_norm:
        e_n = l2_normalize(codebook.astype(jnp.float32))
        z_n = l2_normalize(z32)
    else:
        e_n = codebook.astype(jnp.float32)
        z_n = z32

    if tp_axis is not None:
        values, indices = distance_topk_tp(z_n, e_n, k, tp_axis, region=region)
        base = 0 if region is None else region[0]
        indices = indices - base
    else:
        assert region is None, "region requires tp_axis (slice the codebook)"
        values, indices = distance_topk(z_n, e_n, k, backend=backend)  # [B, k]
        base = 0

    weights = jax.nn.softmax(-values, axis=-1)  # [B, k]
    gathered = e_n[indices + base]  # [B, k, D]
    z_q_raw = jnp.sum(weights[..., None] * gathered, axis=1)  # [B, D]

    if train:
        vq_loss = jnp.mean((jax.lax.stop_gradient(z32) - z_q_raw) ** 2)
        commit_loss = beta * jnp.mean((z32 - jax.lax.stop_gradient(z_q_raw)) ** 2)
    else:
        vq_loss = jnp.asarray(0.0, jnp.float32)
        commit_loss = jnp.asarray(0.0, jnp.float32)

    # straight-through: forward value is z_q_raw, gradient flows to z
    z_q = z32 + jax.lax.stop_gradient(z_q_raw - z32)
    return QuantizeOut(z_q.astype(z.dtype), z_q_raw, indices, weights, vq_loss, commit_loss)


def region_slice(codebook: jax.Array, region: str) -> jax.Array:
    """Codebook region for modality-specific quantization.

    text -> rows [0, n//3); graph -> rows [n - n//3, n)
    (vector_quantization_soft_one_new.py:194-200).
    """
    n = codebook.shape[0]
    third = n // 3
    if region == "text":
        return codebook[:third]
    if region == "graph":
        return codebook[n - third:]
    if region in ("full", "shared"):
        return codebook
    raise ValueError(f"unknown region {region!r}")


# ---------------------------------------------------------------------------
# Codebook usage telemetry (vector_quantization_soft_one_new.py:118, 219-236)
# ---------------------------------------------------------------------------

def usage_counts_init(n_e: int, buffer_size: int) -> jax.Array:
    """Multiplicity of each codebook id inside the (all-zeros) FIFO buffer:
    id 0 appears buffer_size times initially."""
    return jnp.zeros((n_e,), jnp.int32).at[0].set(buffer_size)


def usage_update(
    buffer: jax.Array, counts: jax.Array, new_indices: jax.Array, n_e: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """FIFO-shift ``buffer`` by len(new_indices), append them, and return
    (new_buffer, new_counts, fraction of codebook present in the buffer).

    The reference computes ``len(torch.unique(buf)) / n_e`` over a 300000-slot
    int buffer initialized to zeros (vq...py:219-236). ``unique`` is
    dynamic-shape; a presence scatter over the whole buffer is numerically
    identical but costs a 300K-element serialized TPU scatter per call
    (measured ~1s each). Instead ``counts`` tracks the multiplicity of every
    id in the buffer incrementally: evicted head entries decrement, appended
    entries increment — O(batch*k) updates — and
    distinct-count == sum(counts > 0)."""
    flat = new_indices.reshape(-1).astype(buffer.dtype)
    cur = flat.shape[0]
    evicted = jax.lax.dynamic_slice_in_dim(buffer, 0, cur)
    shifted = jnp.roll(buffer, -cur)
    new_buffer = shifted.at[-cur:].set(flat)
    new_counts = counts.at[evicted].add(-1, mode="drop")
    new_counts = new_counts.at[flat].add(1, mode="drop")
    usage = jnp.sum(new_counts > 0).astype(jnp.float32) / float(n_e)
    return new_buffer, new_counts, usage
