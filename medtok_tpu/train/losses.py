"""Loss suite — InfoNCE / alignment / orthogonality and the reference's
assembly.

Reference: /root/reference/MedTok/loss.py:40-110 and the loss assembly in
train_MedTok.py:215-238. The GAN d_loss helpers (loss.py:5-37) are dead code
and not reproduced.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from medtok_tpu.ops.vq import l2_normalize

NEG_INF = -1e9


def info_nce_loss(q: jax.Array, k: jax.Array, temperature: float = 0.07) -> jax.Array:
    """InfoNCE with in-batch negatives (loss.py:40-56).

    Positives are the aligned pairs; negatives are all off-diagonal pairs
    q_i·k_j. The reference materializes [N, 1+N-1] logits; here the diagonal
    of the full similarity matrix is masked to -inf, which is exactly
    equivalent under cross-entropy (exp(-inf) = 0).
    """
    n = q.shape[0]
    q = l2_normalize(q.astype(jnp.float32))
    k = l2_normalize(k.astype(jnp.float32))
    pos = jnp.sum(q * k, axis=-1) / temperature  # [N]
    sim = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / temperature  # [N, N]
    eye = jnp.eye(n, dtype=bool)
    neg = jnp.where(eye, NEG_INF, sim)
    logits = jnp.concatenate([pos[:, None], neg], axis=-1)  # [N, N+1]
    # cross-entropy with label 0 == -pos + logsumexp(logits)
    return jnp.mean(jax.nn.logsumexp(logits, axis=-1) - pos)


def alignment_loss(mu1: jax.Array, mu2: jax.Array) -> jax.Array:
    """E[mu1·mu2] (loss.py:59-64)."""
    return jnp.mean(jnp.sum(mu1.astype(jnp.float32) * mu2.astype(jnp.float32), axis=1))


def orthogonal_loss(z: jax.Array, z_star: jax.Array) -> jax.Array:
    """Frobenius norm of z^T z_star (loss.py:66-83)."""
    m = jax.lax.dot_general(
        z.astype(jnp.float32), z_star.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.sqrt(jnp.sum(m * m))


def shared_loss(z1, z2, x1, x2):
    """(nce(z1,z2), align(x1n,x2n), nce(z2,z1), align(x2n,x1n)) — loss.py:86-95."""
    x1n = l2_normalize(x1.astype(jnp.float32))
    x2n = l2_normalize(x2.astype(jnp.float32))
    return (
        info_nce_loss(z1, z2),
        alignment_loss(x1n, x2n),
        info_nce_loss(z2, z1),
        alignment_loss(x2n, x1n),
    )


def specific_loss(z1, z1_aug, z2, z2_aug, z1_c, z2_c):
    """(nce(z1^,z1_aug^), orth(z1,z1_c), nce(z2^,z2_aug^), orth(z2,z2_c)) —
    loss.py:98-110, where z^ = cat(z, other-modality shared)."""
    z1_hat = jnp.concatenate([z1, z2_c], axis=-1)
    z1_aug_hat = jnp.concatenate([z1_aug, z2_c], axis=-1)
    z2_hat = jnp.concatenate([z2, z1_c], axis=-1)
    z2_aug_hat = jnp.concatenate([z2_aug, z1_c], axis=-1)
    return (
        info_nce_loss(z1_hat, z1_aug_hat),
        orthogonal_loss(z1, z1_c),
        info_nce_loss(z2_hat, z2_aug_hat),
        orthogonal_loss(z2, z2_c),
    )


def compute_entropy_loss(
    affinity: jax.Array, temperature: float = 0.01
) -> jax.Array:
    """Codebook-entropy regularizer: sample entropy minus average entropy
    (vector_quantization_soft_one_new.py:273-287; off by default —
    entropy_loss_ratio=0.0 at train_MedTok.py:373)."""
    flat = affinity.reshape(-1, affinity.shape[-1]).astype(jnp.float32)
    flat = flat / temperature
    probs = jax.nn.softmax(flat, axis=-1)
    log_probs = jax.nn.log_softmax(flat + 1e-5, axis=-1)
    avg_probs = jnp.mean(probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
    return sample_entropy - avg_entropy


class LossBreakdown(NamedTuple):
    total: jax.Array
    metrics: dict


def assemble_losses(
    quantized_result: dict,
    *,
    shared_loss_beta: float = 0.1,
    specific_loss_lamb: float = 0.1,
    entropy_loss_ratio: float = 0.0,
) -> LossBreakdown:
    """The exact training objective of train_MedTok.py:215-238, emitting the
    same 20-scalar metric dict logged to wandb (train_MedTok.py:268-290)."""
    qr = quantized_result
    codebook_loss = (
        qr["shared_embed_loss"][0] + qr["shared_embed_loss"][1]
        + qr["text_specific_loss"][0] + qr["text_specific_loss"][1]
        + qr["graph_specific_loss"][0] + qr["graph_specific_loss"][1]
    )
    s11, s12, s21, s22 = shared_loss(
        qr["shared_text_embedding"], qr["shared_graph_embedding"],
        qr["text_feature"], qr["graph_feature"],
    )
    shared_all = (s11 - shared_loss_beta * s12) + (s21 - shared_loss_beta * s22)

    p11, p12, p21, p22 = specific_loss(
        z1=qr["specific_embedding_text"],
        z1_aug=qr["specific_embedding_text_aug"],
        z2=qr["specific_embedding_graph"],
        z2_aug=qr["specific_embedding_graph_aug"],
        z1_c=qr["shared_text_embedding"],
        z2_c=qr["shared_graph_embedding"],
    )
    specific_all = (p11 + specific_loss_lamb * p12) + (p21 + specific_loss_lamb * p22)

    total = codebook_loss + shared_all + specific_all
    entropy = jnp.asarray(0.0, jnp.float32)
    if entropy_loss_ratio > 0 and qr.get("shared_affinity") is not None:
        entropy = compute_entropy_loss(qr["shared_affinity"])
        total = total + entropy_loss_ratio * entropy
    metrics = {
        "loss": total,
        "loss_common_all": shared_all,
        "loss_common_11": s11,
        "loss_common_12": s12,
        "loss_common_21": s21,
        "loss_common_22": s22,
        "loss_specific_all": specific_all,
        "loss_specific_11": p11,
        "loss_specific_12": p12,
        "loss_specific_21": p21,
        "loss_specific_22": p22,
        "vq_loss": codebook_loss,
        "vq_shared_loss": qr["shared_embed_loss"][0],
        "vq_text_loss": qr["text_specific_loss"][0],
        "vq_graph_loss": qr["graph_specific_loss"][0],
        "commit_shared_loss": qr["shared_embed_loss"][1],
        "commit_text_loss": qr["text_specific_loss"][1],
        "commit_graph_loss": qr["graph_specific_loss"][1],
        "entropy_loss": entropy,
        "codebook_usage_shared": qr["shared_codebook_usage"],
        "codebook_usage_text": qr["text_specific_usage"],
        "codebook_usage_graph": qr["graph_specific_usage"],
    }
    return LossBreakdown(total, metrics)
