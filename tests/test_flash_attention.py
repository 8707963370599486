"""Pallas flash attention vs the dense reference: forward, custom-VJP
backward, key-padding masks, and the counter-hash dropout (deterministic,
tiling-invariant, distribution-correct, exactly matching a dense oracle
that uses the same hash mask). All in interpret mode on the CPU mesh; the
same kernel compiles on TPU (bench.py exercises compiled Pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.ops.flash_attention import (
    _uniform_hash,
    flash_attention,
    reference_attention,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    B, H, Lq, Lk, Dh = 2, 3, 35, 53, 16
    q = _rand(rng, B, H, Lq, Dh)
    k = _rand(rng, B, H, Lk, Dh)
    v = _rand(rng, B, H, Lk, Dh)
    mask = jnp.asarray(rng.random((B, Lk)) > 0.3).at[:, 0].set(True)
    return q, k, v, mask


@pytest.mark.parametrize("bq,bk", [(16, 16), (8, 32), (64, 64)])
def test_forward_matches_dense(qkv, bq, bk):
    q, k, v, mask = qkv
    out = flash_attention(q, k, v, mask, block_q=bq, block_k=bk,
                          interpret=True)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_no_mask_uneven_lengths():
    rng = np.random.default_rng(1)
    q = _rand(rng, 1, 2, 7, 8)
    k = _rand(rng, 1, 2, 13, 8)
    v = _rand(rng, 1, 2, 13, 8)
    out = flash_attention(q, k, v, block_q=16, block_k=16, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_dense_autodiff(qkv):
    q, k, v, mask = qkv
    rng = np.random.default_rng(2)
    w = _rand(rng, *q.shape)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, block_q=16, block_k=16,
                            interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, mask) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _dense_hash_dropout(q, k, v, mask, rate, seed):
    """Dense oracle applying the SAME counter-hash keep mask as the kernel:
    dropout(softmax(s)) @ v with denominator-undropped semantics."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(Dh)
    s = jnp.where(mask[:, None, None, :].astype(bool), s, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    bits = jax.vmap(
        lambda bh: _uniform_hash(
            jnp.int32(seed), bh, jnp.int32(0), jnp.int32(0), Lq, Lk
        )
    )(jnp.arange(B * H, dtype=jnp.int32)).reshape(B, H, Lq, Lk)
    keep = bits >= jnp.uint32(int(rate * 4294967296.0))
    a = jnp.where(keep, a / (1.0 - rate), 0.0)
    a = jnp.where(mask[:, None, None, :].astype(bool), a, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), v)


def test_dropout_matches_dense_hash_oracle(qkv):
    """Forward AND grads equal a dense implementation that uses the
    identical hash-generated dropout mask — validates the fused dropout
    math (numerator-only drop, undropped denominator) end-to-end."""
    q, k, v, mask = qkv
    rng = np.random.default_rng(3)
    w = _rand(rng, *q.shape)
    rate, seed = 0.4, 9

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, dropout_rate=rate,
                            dropout_seed=seed, block_q=16, block_k=16,
                            interpret=True)
        return jnp.sum(o * w)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_hash_dropout(q, k, v, mask, rate, seed) * w)

    np.testing.assert_allclose(float(loss_flash(q, k, v)),
                               float(loss_dense(q, k, v)), rtol=1e-5)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dropout_deterministic_and_tiling_invariant(qkv):
    q, k, v, mask = qkv
    kw = dict(dropout_rate=0.5, dropout_seed=1, interpret=True)
    d1 = flash_attention(q, k, v, mask, block_q=16, block_k=16, **kw)
    d1b = flash_attention(q, k, v, mask, block_q=16, block_k=16, **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    # different seed -> different mask
    d2 = flash_attention(q, k, v, mask, block_q=16, block_k=16,
                         dropout_rate=0.5, dropout_seed=2, interpret=True)
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    # the hash uses GLOBAL coordinates: tiling must not change the mask
    d1t = flash_attention(q, k, v, mask, block_q=8, block_k=32, **kw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1t),
                               rtol=2e-5, atol=2e-5)


def test_all_masked_rows_return_zero():
    rng = np.random.default_rng(4)
    q = _rand(rng, 1, 2, 9, 8)
    k = _rand(rng, 1, 2, 11, 8)
    v = _rand(rng, 1, 2, 11, 8)
    mask = jnp.zeros((1, 11), bool)
    out = flash_attention(q, k, v, mask, block_q=8, block_k=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_mha_flash_path_matches_dense_eval():
    """MultiheadAttention(use_flash=True) == dense path at eval (dropout
    off), including the key-padding mask."""
    from medtok_tpu.models.layers import MultiheadAttention

    rng = np.random.default_rng(5)
    B, L, E = 2, 21, 32
    x = _rand(rng, B, L, E)
    mask = jnp.asarray(rng.random((B, L)) > 0.4).at[:, 0].set(True)
    dense = MultiheadAttention(E, 4, 0.5, use_flash=False)
    flash = MultiheadAttention(E, 4, 0.5, use_flash=True)
    params = dense.init({"params": jax.random.PRNGKey(0)}, x, x, x, mask)
    a = dense.apply(params, x, x, x, mask, deterministic=True)
    b = flash.apply(params, x, x, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_ehr_model_flash_matches_dense_eval_and_trains():
    """EHRModel(use_flash=True) eval logits == dense; a train-mode grad step
    (flash dropout inside the kernel) is finite and updates params."""
    import optax

    from medtok_tpu.ehr.dataset import EHRBatch
    from medtok_tpu.ehr.model import EHRModel

    rng = np.random.default_rng(6)
    B, C, V = 2, 13, 40
    table = rng.standard_normal((V, 256)).astype(np.float32)
    batch = EHRBatch(
        codes=jnp.asarray(rng.integers(0, V + 1, (B, C))),
        visit_ids=jnp.asarray(rng.integers(0, 3, (B, C))),
        time_within=jnp.asarray(rng.integers(0, 20, (B, 5, 3)), jnp.int32),
        time_between=jnp.asarray(rng.integers(0, 20, (B, 5, 3)), jnp.int32),
        pad_mask=jnp.asarray(rng.random((B, C)) > 0.7),
        gender=jnp.asarray(rng.integers(0, 2, (B,))),
        ethnicity=jnp.asarray(rng.integers(0, 4, (B,))),
        label_onehot=jnp.asarray(np.eye(2)[rng.integers(0, 2, B)], jnp.float32),
        label_raw=jnp.asarray(rng.integers(0, 2, (B,))),
    )
    kw = dict(embedding_table=table, num_class=2, input_dim=16,
              output_dim=16, num_heads=2, hidden_dim=32, num_layers=1,
              dropout=0.3)
    dense = EHRModel(**kw, use_flash=False)
    flash = EHRModel(**kw, use_flash=True)
    params = dense.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )["params"]
    _, la = dense.apply({"params": params}, batch, train=False)
    _, lb = flash.apply({"params": params}, batch, train=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-5)

    def loss_fn(p):
        _, logits = flash.apply(
            {"params": p}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean(optax.softmax_cross_entropy(logits, batch.label_onehot))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_mha_flash_precision_knob():
    """flash_precision='default' (single-pass bf16 MXU + bf16 q/k/v IO) stays
    within bf16-grade error of the 'highest' exact-fp32 path, and the two are
    genuinely different programs (BENCH_r03: 1.19x faster at the EHR shape,
    abs err ~7e-3). The knob rides EHRTrainConfig.flash_precision ->
    EHRModel -> TransformerEncoderLayer -> MultiheadAttention -> kernel."""
    from medtok_tpu.models.layers import MultiheadAttention

    rng = np.random.default_rng(7)
    B, L, E = 2, 33, 32
    x = _rand(rng, B, L, E)
    mask = jnp.asarray(rng.random((B, L)) > 0.4).at[:, 0].set(True)
    hi = MultiheadAttention(E, 4, 0.0, use_flash=True, flash_precision="highest")
    lo = MultiheadAttention(E, 4, 0.0, use_flash=True, flash_precision="default")
    params = hi.init({"params": jax.random.PRNGKey(0)}, x, x, x, mask)
    a = np.asarray(hi.apply(params, x, x, x, mask, deterministic=True))
    b = np.asarray(lo.apply(params, x, x, x, mask, deterministic=True))
    err = np.abs(a - b).max()
    assert err < 5e-2, f"default-precision drift too large: {err}"
    assert err > 0.0, "precision knob had no effect — not reaching the kernel"


def test_ehr_train_config_flash_precision_threading():
    """EHRTrainConfig.flash_precision reaches the built model (and defaults
    to 'default' — the measured 1.19x training configuration)."""
    from medtok_tpu.ehr.train import EHRTrainConfig, EHRTrainer

    table = np.zeros((16, 256), np.float32)
    cfg = EHRTrainConfig(max_medical_code=8, max_visits=2, batch_size=2,
                         num_layers=1, flash_attention=False)
    assert cfg.flash_precision == "default"
    tr = EHRTrainer(cfg, table, num_class=2)
    assert tr.model.flash_precision == "default"
    cfg_hi = EHRTrainConfig(max_medical_code=8, max_visits=2, batch_size=2,
                            num_layers=1, flash_attention=False,
                            flash_precision="highest")
    assert EHRTrainer(cfg_hi, table, num_class=2).model.flash_precision == "highest"


# --------------------------------------------------------------- dispatch --
# Measured HBM-crossover auto-dispatch (VERDICT r4 item 7): dense wins
# wherever its score tensor fits (flash_speedup 0.89 at fitting shapes),
# so "auto" must pick flash ONLY where dense cannot run.


def test_choose_flash_memory_crossover():
    from medtok_tpu.ops.flash_attention import (
        choose_flash,
        dense_attention_bytes,
    )

    GiB = 2**30
    # the bench's fitting shape (32x4x2048x16, flash 0.89x): ~2 GiB scores,
    # fits the v5e budget -> dense, for both inference and training
    for training in (False, True):
        assert not choose_flash(32, 4, 2048, 2048, training=training,
                                backend="tpu", budget_bytes=6.4 * GiB)
    # the reference EHR shape (B=256, H=4, L=2003, 4 layers under grad):
    # ~16 GB fp32 scores PER LAYER -> flash, even inference
    assert choose_flash(256, 4, 2003, 2003, training=True,
                        resident_layers=4, backend="tpu",
                        budget_bytes=6.4 * GiB)
    assert choose_flash(256, 4, 2003, 2003, training=False,
                        backend="tpu", budget_bytes=6.4 * GiB)
    # non-TPU backends never pick the interpret-mode kernel
    assert not choose_flash(256, 4, 2003, 2003, training=True,
                            resident_layers=4, backend="cpu")
    # the bytes model: training residency grows with resident layers
    b1 = dense_attention_bytes(256, 4, 2003, 2003, training=True,
                               resident_layers=1)
    b4 = dense_attention_bytes(256, 4, 2003, 2003, training=True,
                               resident_layers=4)
    per_layer = 4.0 * 256 * 4 * 2003 * 2003
    assert b4 - b1 == pytest.approx(3 * per_layer)


def test_mha_auto_dispatch_is_dense_on_cpu():
    """use_flash='auto' at a small shape on CPU traces the dense path —
    bitwise-equal outputs to use_flash=False (the flash kernel's masked-row
    and precision behaviors would differ detectably)."""
    from medtok_tpu.models.layers import MultiheadAttention

    rng = np.random.default_rng(3)
    x = _rand(rng, 2, 24, 32)
    mask = jnp.asarray(rng.random((2, 24)) > 0.2).at[:, 0].set(True)
    auto = MultiheadAttention(32, 4, use_flash="auto")
    dense = MultiheadAttention(32, 4, use_flash=False)
    params = auto.init({"params": jax.random.PRNGKey(0)}, x, x, x, mask)
    a = np.asarray(auto.apply(params, x, x, x, mask, deterministic=True))
    d = np.asarray(dense.apply(params, x, x, x, mask, deterministic=True))
    np.testing.assert_array_equal(a, d)


def test_ehr_auto_dispatch_uses_crossover_rule(monkeypatch):
    """EHRTrainConfig.flash_attention='auto' routes through choose_flash:
    the reference shape picks flash on TPU, a small config picks dense, and
    explicit True/False stay hard overrides."""
    import medtok_tpu.ops.flash_attention as fa
    from medtok_tpu.ehr.train import EHRTrainConfig, EHRTrainer

    table = np.zeros((16, 256), np.float32)
    calls = {}

    def fake_choose(batch, heads, q_len, kv_len, **kw):
        calls.update(batch=batch, heads=heads, q_len=q_len, **kw)
        return fa.dense_attention_bytes(
            batch, heads, q_len, kv_len,
            training=kw.get("training", False),
            resident_layers=kw.get("resident_layers", 1),
        ) > 0.4 * 16 * 2**30  # TPU rule regardless of test backend

    monkeypatch.setattr(fa, "choose_flash", fake_choose)
    big = EHRTrainConfig(max_medical_code=2000, max_visits=2, batch_size=256,
                         num_layers=4, flash_attention="auto")
    assert EHRTrainer(big, table, num_class=2).model.use_flash is True
    assert calls["q_len"] == 2003 and calls["resident_layers"] == 4
    assert calls["training"] is True
    small = EHRTrainConfig(max_medical_code=64, max_visits=2, batch_size=8,
                           num_layers=1, flash_attention="auto")
    assert EHRTrainer(small, table, num_class=2).model.use_flash is False
    forced = EHRTrainConfig(max_medical_code=64, max_visits=2, batch_size=8,
                            num_layers=1, flash_attention=True)
    assert EHRTrainer(forced, table, num_class=2).model.use_flash is True


# ----------------------------------------------------------------- packed --
# Segment-masked forward-only kernel (packed BERT path).


def _seg_dense_ref(q, k, v, seg):
    pm = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(q.shape[-1])
    s = jnp.where(pm[:, None, :, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    # all-padding query rows: kernel returns 0 (dense gives uniform avg)
    return jnp.where((seg > 0)[:, None, :, None], out, 0.0)


@pytest.mark.parametrize("L,bq,bk", [(24, 8, 8), (40, 16, 16), (64, 64, 64)])
def test_packed_segment_attention_matches_dense(L, bq, bk):
    from medtok_tpu.ops.flash_attention import packed_segment_attention

    rng = np.random.default_rng(7)
    B, H, Dh = 3, 2, 16
    q = _rand(rng, B, H, L, Dh)
    k = _rand(rng, B, H, L, Dh)
    v = _rand(rng, B, H, L, Dh)
    # packed rows: consecutive segments of random length, trailing padding;
    # one row entirely padding (all-masked queries)
    seg = np.zeros((B, L), np.int32)
    for b in range(B - 1):
        pos, s = 0, 1
        while pos < L - 3:
            ln = int(rng.integers(2, 9))
            seg[b, pos:pos + ln] = s
            pos += ln
            s += 1
    segj = jnp.asarray(seg)
    out = packed_segment_attention(q, k, v, segj, block_q=bq, block_k=bk,
                                   interpret=True)
    ref = _seg_dense_ref(q, k, v, segj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_segment_attention_multiblock_recurrence():
    """L spans several key blocks so the online-softmax recurrence actually
    iterates (the export shape is single-block; this guards the general
    case)."""
    from medtok_tpu.ops.flash_attention import packed_segment_attention

    rng = np.random.default_rng(11)
    B, H, L, Dh = 2, 2, 96, 8
    q = _rand(rng, B, H, L, Dh)
    k = _rand(rng, B, H, L, Dh)
    v = _rand(rng, B, H, L, Dh)
    seg = np.zeros((B, L), np.int32)
    # one long segment crossing block boundaries + several short ones
    seg[0, :50] = 1
    seg[0, 50:80] = 2
    seg[1, :8] = 1
    seg[1, 8:90] = 2
    segj = jnp.asarray(seg)
    out = packed_segment_attention(q, k, v, segj, block_q=16, block_k=16,
                                   interpret=True)
    ref = _seg_dense_ref(q, k, v, segj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_encode_text_packed_flash_matches_dense():
    """Model-level: encode_text_packed with segment ids (flash path) equals
    the pairwise-mask dense path for every consumed (seg>0) position."""
    from medtok_tpu.config import ModelConfig, TextEncoderConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    tc = TextEncoderConfig(vocab_size=120, hidden_size=32, num_layers=2,
                           num_heads=4, intermediate_size=64,
                           max_position_embeddings=64, packed_flash=True)
    # fp32 compute: in bf16 the two paths differ at rounding-order level
    # (dense normalizes probabilities before the bf16 cast, the kernel
    # after the fp32-accumulated matmul) — the kernel itself is checked
    # exactly above
    cfg = ModelConfig(text=tc, compute_dtype="float32")
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(3)
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=4, text_len=8, max_nodes=8, max_edges_per_graph=16,
        text_vocab=tc.vocab_size, num_kg_nodes=cfg.graph.num_nodes,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    params = variables["params"]

    R, P = 2, 24
    ids = jnp.asarray(rng.integers(1, 120, (R, P)), jnp.int32)
    seg = np.zeros((R, P), np.int32)
    seg[0, :6], seg[0, 6:15], seg[1, :10] = 1, 2, 1
    segj = jnp.asarray(seg)
    pos = jnp.asarray(np.tile(np.arange(P) % 6, (R, 1)), jnp.int32)
    pm = (segj[:, :, None] == segj[:, None, :]) & (segj[:, :, None] > 0)

    flat_flash = model.apply(
        {"params": params}, ids, segj, pos,
        method=MultimodalTokenizer.encode_text_packed,
    )
    flat_dense = model.apply(
        {"params": params}, ids, pm, pos,
        method=MultimodalTokenizer.encode_text_packed,
    )
    valid = np.asarray(seg.reshape(-1) > 0)
    np.testing.assert_allclose(
        np.asarray(flat_flash)[valid], np.asarray(flat_dense)[valid],
        rtol=2e-5, atol=2e-5,
    )


def test_packed_segment_attention_nt_matches_bhld():
    """[B, L, H, Dh]-layout kernel == the [B, H, L, Dh] one == dense."""
    from medtok_tpu.ops.flash_attention import (
        packed_segment_attention,
        packed_segment_attention_nt,
    )

    rng = np.random.default_rng(13)
    B, H, L, Dh = 2, 3, 40, 16
    q = _rand(rng, B, H, L, Dh)
    k = _rand(rng, B, H, L, Dh)
    v = _rand(rng, B, H, L, Dh)
    seg = np.zeros((B, L), np.int32)
    seg[0, :7], seg[0, 7:30], seg[1, :20] = 1, 2, 1
    segj = jnp.asarray(seg)
    ref = packed_segment_attention(q, k, v, segj, block_q=16, block_k=16,
                                   interpret=True)
    out = packed_segment_attention_nt(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), segj, block_q=16, block_k=16,
        interpret=True,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    dense = _seg_dense_ref(q, k, v, segj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
