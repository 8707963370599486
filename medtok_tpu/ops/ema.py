"""EMA codebook machinery — functional TPU equivalents of
/root/reference/MedTok/norm_ema_quantizer.py.

All state is explicit pytrees threaded through pure functions (the
jit/shard_map-native replacement for torch's in-place buffer mutation):

- ``kmeans``: cosine/L2 k-means with dead-cluster keep (ref :24-57)
- ``EmbeddingEMAState`` + updates: non-grad weight / cluster_size /
  embed_avg, Laplace-smoothed weight_update (ref :60-134)
- ``norm_ema_quantize``: argmin VQ with the distributed norm-EMA codebook
  update — per-shard one-hot stats are ``psum``'d over the data axis before
  the normalized EMA write, numerically identical to the reference's
  all_reduce-then-EMA order (ref :166-218; SURVEY.md section 5.8)
- ``lookup_quantize``: decode-given-indices variant (ref :222-268)
- ``revival_quantize`` + ``FeaturePoolState``: dead-code revival VQ with
  closest/random/probrandom anchor resampling and usage-decayed rewrite
  (ref :272-460). The reference's contrastive branch references ``loss``
  before assignment (a crash if enabled, :400-406); here it is returned as a
  separate term.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from medtok_tpu.ops.vq import l2_normalize, squared_distance


def ema_update(moving_avg: jax.Array, new: jax.Array, decay: float) -> jax.Array:
    return moving_avg * decay + new * (1.0 - decay)


def norm_ema_update(moving_avg: jax.Array, new: jax.Array, decay: float) -> jax.Array:
    return l2_normalize(ema_update(moving_avg, new, decay))


# ------------------------------------------------------------------ kmeans --

def kmeans(
    rng: jax.Array,
    samples: jax.Array,
    num_clusters: int,
    num_iters: int = 10,
    use_cosine_sim: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(means [C, D], bins [C]). Empty clusters keep their previous mean
    (ref :41-53). Initial means are sampled without replacement when
    possible (ref :14-22)."""
    n = samples.shape[0]
    if n >= num_clusters:
        idx = jax.random.permutation(rng, n)[:num_clusters]
    else:
        idx = jax.random.randint(rng, (num_clusters,), 0, n)
    means = samples[idx]

    def body(_, carry):
        means, _ = carry
        if use_cosine_sim:
            dists = samples @ means.T
        else:
            dists = -squared_distance(samples, means)
        buckets = jnp.argmax(dists, axis=-1)
        bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
        zero_mask = bins == 0
        bins_c = jnp.where(zero_mask, 1.0, bins)
        sums = jnp.zeros((num_clusters, samples.shape[-1]), samples.dtype)
        sums = sums.at[buckets].add(samples)
        new_means = sums / bins_c[:, None]
        if use_cosine_sim:
            new_means = l2_normalize(new_means)
        means2 = jnp.where(zero_mask[:, None], means, new_means)
        return means2, bins

    means, bins = jax.lax.fori_loop(
        0, num_iters, body, (means, jnp.zeros((num_clusters,), jnp.float32))
    )
    return means, bins


# ------------------------------------------------------- EmbeddingEMA state --

class EmbeddingEMAState(NamedTuple):
    weight: jax.Array        # [C, D]
    cluster_size: jax.Array  # [C]
    embed_avg: jax.Array     # [C, D]
    initted: jax.Array       # scalar bool


def embedding_ema_init(
    rng: jax.Array, num_tokens: int, dim: int, *, kmeans_init: bool = True,
    init_weight: jax.Array | None = None,
) -> EmbeddingEMAState:
    if init_weight is not None:
        w = jnp.asarray(init_weight, jnp.float32)
        initted = jnp.asarray(True)
    elif kmeans_init:
        w = jnp.zeros((num_tokens, dim), jnp.float32)
        initted = jnp.asarray(False)
    else:
        w = l2_normalize(jax.random.normal(rng, (num_tokens, dim)))
        initted = jnp.asarray(True)
    return EmbeddingEMAState(
        weight=w, cluster_size=jnp.zeros((num_tokens,), jnp.float32),
        embed_avg=w, initted=initted,
    )


def maybe_kmeans_init(
    rng: jax.Array, state: EmbeddingEMAState, data: jax.Array
) -> EmbeddingEMAState:
    """Lazy cosine-kmeans init on first batch (ref :86-93). Under jit the
    branch is a lax.cond; the kmeans runs either way but is discarded when
    already initialized."""
    means, bins = kmeans(rng, data, state.weight.shape[0], 10, use_cosine_sim=True)
    return jax.tree.map(
        lambda a, b: jnp.where(state.initted, a, b),
        state,
        EmbeddingEMAState(means, bins, state.embed_avg, jnp.asarray(True)),
    )


def weight_update(state: EmbeddingEMAState, eps: float = 1e-5) -> EmbeddingEMAState:
    """Laplace-smoothed write: weight = embed_avg / smoothed_cluster_size
    (ref :126-134)."""
    c = state.cluster_size
    n = jnp.sum(c)
    num_tokens = c.shape[0]
    smoothed = (c + eps) / (n + num_tokens * eps) * n
    return state._replace(weight=state.embed_avg / smoothed[:, None])


# -------------------------------------------------- NormEMAVectorQuantizer --

class NormEMAOut(NamedTuple):
    z_q: jax.Array
    loss: jax.Array
    indices: jax.Array
    state: EmbeddingEMAState
    cluster_size: jax.Array  # running usage EMA (separate buffer, ref :154)


def norm_ema_quantize(
    z: jax.Array,                      # [..., D]
    state: EmbeddingEMAState,
    cluster_size: jax.Array,           # [C] usage-stat buffer
    *,
    beta: float = 0.25,
    decay: float = 0.99,
    train: bool = True,
    axis_name: str | None = None,
) -> NormEMAOut:
    """Classic argmin VQ with the distributed norm-EMA codebook update
    (ref :166-218). When ``axis_name`` is given (inside shard_map), the
    per-shard ``bins`` and ``embed_sum`` are psum'd BEFORE the EMA write —
    the exact all_reduce placement of the reference (:194-203)."""
    z_n = l2_normalize(z.astype(jnp.float32))
    flat = z_n.reshape(-1, z_n.shape[-1])

    d = squared_distance(flat, state.weight)
    indices = jnp.argmin(d, axis=1)
    z_q = state.weight[indices].reshape(z_n.shape)

    C = state.weight.shape[0]
    one_hot = jax.nn.one_hot(indices, C, dtype=jnp.float32)
    bins = jnp.sum(one_hot, axis=0)
    if axis_name is not None:
        bins = jax.lax.psum(bins, axis_name)

    if train:
        new_cluster = ema_update(cluster_size, bins, decay)
        zero_mask = bins == 0
        bins_c = jnp.where(zero_mask, 1.0, bins)
        embed_sum = flat.T @ one_hot  # [D, C]
        if axis_name is not None:
            embed_sum = jax.lax.psum(embed_sum, axis_name)
        embed_normalized = l2_normalize((embed_sum / bins_c[None, :]).T)
        embed_normalized = jnp.where(
            zero_mask[:, None], state.weight, embed_normalized
        )
        new_weight = norm_ema_update(state.weight, embed_normalized, decay)
        new_state = state._replace(weight=new_weight)
    else:
        new_cluster = ema_update(cluster_size, bins, decay)
        new_state = state

    loss = beta * jnp.mean((jax.lax.stop_gradient(z_q) - z_n) ** 2)
    z_q = z_n + jax.lax.stop_gradient(z_q - z_n)
    return NormEMAOut(z_q, loss, indices, new_state, new_cluster)


def lookup_quantize(
    state: EmbeddingEMAState,
    indices: jax.Array,
    z: jax.Array | None = None,
    *,
    beta: float = 0.25,
) -> tuple[jax.Array, jax.Array]:
    """Decode given indices; optional commitment loss (ref :222-268, where
    decay is forced to 0 — no codebook update)."""
    z_q = state.weight[indices]
    if z is not None:
        loss = beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
    else:
        loss = jnp.asarray(0.0, jnp.float32)
    return z_q, loss


# --------------------------------------------------------- CVectorQuantiser --

class FeaturePoolState(NamedTuple):
    features: jax.Array   # [pool, D]
    num: jax.Array        # scalar int


def feature_pool_init(rng: jax.Array, pool_size: int, dim: int) -> FeaturePoolState:
    f = (jax.random.uniform(rng, (pool_size, dim)) * 2 - 1) / pool_size
    return FeaturePoolState(f, jnp.asarray(0))


def feature_pool_query(
    rng: jax.Array, state: FeaturePoolState, features: jax.Array
) -> tuple[jax.Array, FeaturePoolState]:
    """Ring-buffer update + return pool (ref :418-460), static-shape variant:
    incoming batch overwrites a random slice of the pool."""
    pool = state.features.shape[0]
    n = features.shape[0]
    if n >= pool:
        idx = jax.random.randint(rng, (pool,), 0, n)
        new = features[idx]
        return new, FeaturePoolState(new, jnp.asarray(pool))
    slots = jax.random.permutation(rng, pool)[:n]
    new = state.features.at[slots].set(features)
    return new, FeaturePoolState(new, jnp.minimum(state.num + n, pool))


class RevivalOut(NamedTuple):
    z_q: jax.Array
    loss: jax.Array
    contra_loss: jax.Array
    indices: jax.Array
    state: EmbeddingEMAState
    embed_prob: jax.Array
    pool: FeaturePoolState


def revival_quantize(
    rng: jax.Array,
    z: jax.Array,
    state: EmbeddingEMAState,
    embed_prob: jax.Array,
    pool: FeaturePoolState,
    *,
    beta: float = 0.25,
    decay: float = 0.99,
    anchor: str = "closest",
    contras_loss: bool = False,
    train: bool = True,
    axis_name: str | None = None,
) -> RevivalOut:
    """Dead-code-revival VQ (ref :272-420): argmax cosine/negative-L2
    assignment, norm-EMA update, then usage-decayed codeword rewrite toward
    anchor features."""
    z_n = l2_normalize(z.astype(jnp.float32))
    flat = z_n.reshape(-1, z_n.shape[-1])
    C, D = state.weight.shape

    d = -squared_distance(jax.lax.stop_gradient(flat), state.weight)  # [N, C]
    indices = jnp.argmax(d, axis=1)
    z_q = state.weight[indices].reshape(z_n.shape)
    one_hot = jax.nn.one_hot(indices, C, dtype=jnp.float32)

    new_state, new_prob, new_pool = state, embed_prob, pool
    contra = jnp.asarray(0.0, jnp.float32)
    if train:
        bins = jnp.sum(one_hot, axis=0)
        if axis_name is not None:
            bins = jax.lax.psum(bins, axis_name)
        zero_mask = bins == 0
        bins_c = jnp.where(zero_mask, 1.0, bins)
        embed_sum = flat.T @ one_hot
        if axis_name is not None:
            embed_sum = jax.lax.psum(embed_sum, axis_name)
        embed_normalized = l2_normalize((embed_sum / bins_c[None, :]).T)
        embed_normalized = jnp.where(zero_mask[:, None], state.weight, embed_normalized)
        weight = norm_ema_update(state.weight, embed_normalized, decay)

        avg_probs = jnp.mean(one_hot, axis=0)
        new_prob = ema_update(embed_prob, avg_probs, decay)

        r1, r2 = jax.random.split(rng)
        if anchor == "closest":
            # per-codeword: the sample with the highest affinity (ref :385-387)
            best = jnp.argmax(d, axis=0)  # [C]
            random_feat = jax.lax.stop_gradient(flat)[best]
        elif anchor == "random":
            random_feat, new_pool = feature_pool_query(
                r1, pool, jax.lax.stop_gradient(flat)
            )
        elif anchor == "probrandom":
            probs = jax.nn.softmax(d.T, axis=1)  # [C, N]
            pick = jax.random.categorical(r1, jnp.log(probs + 1e-12), axis=1)
            random_feat = jax.lax.stop_gradient(flat)[pick]
        else:
            raise ValueError(anchor)
        revive = jnp.exp(
            -(new_prob * C * 10) / (1 - decay) - 1e-3
        )[:, None]  # (ref :395)
        weight = weight * (1 - revive) + random_feat * revive
        new_state = state._replace(weight=weight)

        if contras_loss:  # (ref :400-406, crash fixed: returned separately)
            sort_d = jnp.sort(d, axis=0)  # ascending per codeword
            n_pos = max(1, flat.shape[0] // C)
            dis_pos = jnp.mean(sort_d[-n_pos:, :], axis=0, keepdims=True)
            dis_neg = sort_d[: flat.shape[0] // 2, :]
            logits = jnp.concatenate([dis_pos, dis_neg], axis=0).T / 0.07
            contra = jnp.mean(
                jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
            )

    loss = beta * jnp.mean((jax.lax.stop_gradient(z_q) - z_n) ** 2)
    z_q = z_n + jax.lax.stop_gradient(z_q - z_n)
    return RevivalOut(z_q, loss, contra, indices, new_state, new_prob, new_pool)
