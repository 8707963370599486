"""Sequence packing: host packer correctness + packed-vs-unpacked model
equivalence (exact token IDs, near-exact embeddings on the f32 CPU path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.data.packing import PackedText, pack_texts, pairwise_mask


def _id_lists(rng, n, vocab=1000, lo=3, hi=14):
    return [
        rng.integers(1, vocab, size=int(rng.integers(lo, hi))).astype(np.int32)
        for _ in range(n)
    ]


def test_pack_texts_layout_and_gather():
    rng = np.random.default_rng(0)
    lists = _id_lists(rng, 23)
    p = pack_texts(lists, row_len=32)
    # every token lands exactly once, in order, under its segment id
    for b, toks in enumerate(lists):
        flat_ids = p.input_ids.reshape(-1)
        got = flat_ids[p.gather_idx[b][p.text_mask[b]]]
        np.testing.assert_array_equal(got, toks)
    # segments never split across rows; position ids restart per segment
    for b, toks in enumerate(lists):
        seg_rows = set(np.where(p.seg_ids == b + 1)[0].tolist())
        assert len(seg_rows) == 1
        r = seg_rows.pop()
        sel = p.seg_ids[r] == b + 1
        np.testing.assert_array_equal(p.pos_ids[r][sel], np.arange(len(toks)))
    # empty slots have seg 0
    total = sum(len(t) for t in lists)
    assert int((p.seg_ids > 0).sum()) == total


def test_pack_texts_static_padding():
    rng = np.random.default_rng(1)
    lists = _id_lists(rng, 5)
    tight = pack_texts(lists, row_len=32)
    padded = pack_texts(lists, row_len=32, num_rows=tight.input_ids.shape[0] + 3,
                        lmax=20)
    assert padded.input_ids.shape[0] == tight.input_ids.shape[0] + 3
    assert padded.gather_idx.shape[1] == 20
    for b in range(5):
        np.testing.assert_array_equal(
            padded.gather_idx[b][padded.text_mask[b]],
            tight.gather_idx[b][tight.text_mask[b]],
        )


def test_pack_texts_rejects_overlong():
    with pytest.raises(ValueError):
        pack_texts([np.arange(40, dtype=np.int32)], row_len=32)


def test_pairwise_mask_block_diagonal():
    seg = np.array([[1, 1, 2, 2, 2, 0]])
    m = pairwise_mask(seg)[0]
    assert m[0, 1] and m[1, 0] and m[2, 4]
    assert not m[0, 2] and not m[4, 1]        # cross-segment blocked
    assert not m[5, 5] and not m[0, 5]        # empty slots blocked


def test_packed_model_equals_unpacked():
    """tokenize_packed == tokenize: exact token IDs + near-exact embeddings
    (same math, different batching)."""
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from tests.test_model import tiny_config

    cfg = tiny_config()
    model = MultimodalTokenizer(cfg)
    rng = np.random.default_rng(3)
    B, Lt = 6, 16
    batch = random_code_batch(
        rng, batch=B, text_len=Lt, max_nodes=8, max_edges_per_graph=12,
        text_vocab=1000, num_kg_nodes=500,
    )
    # variable-length contiguous texts
    lists = _id_lists(rng, B, lo=3, hi=Lt + 1)
    input_ids = np.zeros((B, Lt), np.int32)
    mask = np.zeros((B, Lt), np.int32)
    for b, t in enumerate(lists):
        input_ids[b, : len(t)] = t
        mask[b, : len(t)] = 1
    batch = batch._replace(
        input_ids=jnp.asarray(input_ids), attention_mask=jnp.asarray(mask)
    )
    batch = jax.tree.map(jnp.asarray, batch)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    ref = model.apply(variables, batch, train=False)

    p = pack_texts(lists, row_len=32, lmax=Lt)
    out = model.apply(
        variables,
        jnp.asarray(p.input_ids), jnp.asarray(pairwise_mask(p.seg_ids)),
        jnp.asarray(p.pos_ids), jnp.asarray(p.gather_idx),
        jnp.asarray(p.text_mask), batch,
        method=MultimodalTokenizer.tokenize_packed,
    )
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref.tokens))
    np.testing.assert_allclose(np.asarray(out.embedding),
                               np.asarray(ref.embedding), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.weights),
                               np.asarray(ref.weights), rtol=2e-5, atol=2e-5)


def test_take_group_partitions_all_codes():
    """Walking take_group over a sorted order covers every code exactly once
    and every group actually packs into (num_rows, row_len)."""
    from medtok_tpu.data.packing import take_group

    rng = np.random.default_rng(7)
    lens = rng.integers(3, 20, size=1000)
    order = np.argsort(lens, kind="stable")
    seen = []
    i = 0
    while i < len(order):
        j = take_group(lens, order, i, row_len=32, num_rows=8, max_codes=64)
        assert j > i
        group = order[i:j]
        # must fit: simulate exact fill
        rows, fill = 1, 0
        for g in group:
            n = int(lens[g])
            if fill + n > 32:
                rows, fill = rows + 1, 0
            fill += n
        assert rows <= 8 and len(group) <= 64
        seen.extend(group.tolist())
        i = j
    assert sorted(seen) == list(range(1000))


def test_pack_code_batch_rejects_nondivisible_shards():
    """B % shards != 0 must raise (ValueError, not a strippable assert) —
    silent dropping of trailing codes would corrupt the packed batch."""
    import pytest

    from medtok_tpu.data.packing import pack_code_batch

    ids = np.ones((6, 4), np.int32)
    am = np.ones((6, 4), np.int32)
    with pytest.raises(ValueError, match="divisible"):
        pack_code_batch(ids, am, shards=4, rows_per_shard=2, row_len=8)


def test_pack_texts_meta_matches_pack_texts():
    """pack_texts_meta (vectorized fill, metadata-only) + device-side
    derive_packed_meta must reproduce pack_texts' host-built arrays: ids
    bit-equal; gather/mask bit-equal; seg/pos equal up to the pairwise
    same-code mask the encoder actually consumes."""
    import jax.numpy as jnp

    from medtok_tpu.data.compact import derive_packed_meta
    from medtok_tpu.data.packing import pack_texts, pack_texts_meta

    rng = np.random.default_rng(5)
    lists = [
        np.asarray(rng.integers(1, 50, rng.integers(1, 12)), np.int32)
        for _ in range(37)
    ]
    R, P, LMAX = 12, 32, 16
    p = pack_texts(lists, row_len=P, num_rows=R, lmax=LMAX)
    ids, base, lens = pack_texts_meta(lists, row_len=P, num_rows=R)
    np.testing.assert_array_equal(ids, p.input_ids)

    seg, pos, gi, tm = derive_packed_meta(
        jnp.asarray(base), jnp.asarray(lens), num_rows=R, row_len=P,
        lmax=LMAX,
    )
    np.testing.assert_array_equal(np.asarray(gi), p.gather_idx)
    np.testing.assert_array_equal(np.asarray(tm), p.text_mask)
    np.testing.assert_array_equal(np.asarray(pos), p.pos_ids)
    # seg values may relabel under duplicates; the consumed mask may not
    def pmask(s):
        s = np.asarray(s)
        return (s[:, :, None] == s[:, None, :]) & (s[:, :, None] > 0)

    np.testing.assert_array_equal(pmask(seg), pmask(p.seg_ids))
    # occupancy must agree exactly
    np.testing.assert_array_equal(np.asarray(seg) > 0, p.seg_ids > 0)


def test_derive_packed_meta_duplicate_padding_codes():
    """Batch padding repeats the last real code's (base, len): the derived
    gather rows all point at the same flat range and the pairwise mask is
    unchanged (duplicates share one segment)."""
    import jax.numpy as jnp

    from medtok_tpu.data.compact import derive_packed_meta
    from medtok_tpu.data.packing import pack_texts, pack_texts_meta

    lists = [np.asarray([5, 6, 7], np.int32), np.asarray([9, 9], np.int32)]
    R, P, LMAX = 2, 8, 4
    p = pack_texts(lists, row_len=P, num_rows=R, lmax=LMAX)
    _, base, lens = pack_texts_meta(lists, row_len=P, num_rows=R)
    base_c = np.concatenate([base, np.repeat(base[-1:], 3)])
    lens_c = np.concatenate([lens, np.repeat(lens[-1:], 3)])
    seg, pos, gi, tm = derive_packed_meta(
        jnp.asarray(base_c), jnp.asarray(lens_c), num_rows=R, row_len=P,
        lmax=LMAX,
    )
    # padded codes gather the duplicated code's range
    for k in range(1, 5):
        np.testing.assert_array_equal(np.asarray(gi)[k], np.asarray(gi)[1])
        np.testing.assert_array_equal(np.asarray(tm)[k], np.asarray(tm)[1])

    def pmask(s):
        s = np.asarray(s)
        return (s[:, :, None] == s[:, None, :]) & (s[:, :, None] > 0)

    np.testing.assert_array_equal(pmask(seg), pmask(p.seg_ids))
    np.testing.assert_array_equal(np.asarray(pos), p.pos_ids)


def test_pack_store_meta_matches_pack_texts_meta():
    """The store-direct packer (arena + start/length triple, searchsorted
    row fill) must reproduce pack_texts_meta bit-for-bit — including rows
    selected out of order (length-sorted export order), duplicate rows
    (batch padding repeats the last code), and a row that exactly fills a
    pack row."""
    from medtok_tpu.data.packing import pack_store_meta, pack_texts_meta

    rng = np.random.default_rng(11)
    P, R = 32, 14
    n = 61
    lens = rng.integers(1, 13, n)
    lens[7] = P                      # exactly one full row
    starts = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    arena = rng.integers(1, 30000, int(lens.sum())).astype(np.int16)
    lists = [
        np.asarray(arena[starts[i]:starts[i] + lens[i]], np.int32)
        for i in range(n)
    ]

    for seed in range(3):
        order = np.random.default_rng(seed).permutation(n)[:43]
        order = np.concatenate([order, order[-1:].repeat(5)])  # dup padding
        ref = pack_texts_meta([lists[i] for i in order], row_len=P)
        rows_needed = ref[0].shape[0]
        got = pack_store_meta(arena, starts, lens.astype(np.int32),
                              order, row_len=P)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b)
        assert got[0].dtype == np.int32
        # padded-row variant (the bench/export call shape)
        ref_p = pack_texts_meta([lists[i] for i in order], row_len=P,
                                num_rows=rows_needed + R)
        got_p = pack_store_meta(arena, starts, lens.astype(np.int32),
                                order, row_len=P, num_rows=rows_needed + R)
        for a, b in zip(got_p, ref_p):
            np.testing.assert_array_equal(a, b)


def test_pack_store_meta_overflow_and_overlong():
    from medtok_tpu.data.packing import pack_store_meta

    arena = np.arange(100, dtype=np.int16)
    starts = np.asarray([0, 40], np.int64)
    lens = np.asarray([40, 40], np.int32)
    with pytest.raises(ValueError, match="longer than row_len"):
        pack_store_meta(arena, starts, lens, np.asarray([0, 1]),
                        row_len=32, num_rows=4)
    with pytest.raises(ValueError, match="rows"):
        pack_store_meta(arena, starts, lens, np.asarray([0, 1]),
                        row_len=64, num_rows=1)


def test_dataset_pack_text_rows_matches_per_code_path(tmp_path):
    """MedCodeDataset.pack_text_rows == pack_texts_meta over text_ids()
    views for a real (synthetic-frame) dataset after tokenization."""
    from medtok_tpu.config import DataConfig
    from medtok_tpu.data.dataset import MedCodeDataset
    from medtok_tpu.data.packing import pack_texts_meta
    from medtok_tpu.data.synthetic import (
        MEDICAL_WORDS, synthetic_kg, synthetic_vocab_frame,
    )
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab

    rng = np.random.default_rng(3)
    df = synthetic_vocab_frame(rng, num_codes=64, num_kg_nodes=128)
    df.to_parquet(tmp_path / "codes.parquet")
    kg = synthetic_kg(rng, num_nodes=128, num_edges=256)
    tok = WordPieceTokenizer(make_test_vocab(MEDICAL_WORDS))
    ds = MedCodeDataset(
        kg, tmp_path / "codes.parquet", tok,
        cfg=DataConfig(text_buckets=(16, 64), node_buckets=(8, 16),
                       edge_buckets=(16, 64), max_text_length=64),
    )
    ds.tokenize_rows(range(64))
    order = np.argsort(ds.text_lengths(0, 64), kind="stable")[:40]
    ref = pack_texts_meta([ds.text_ids(int(i)) for i in order],
                          row_len=64, num_rows=40)
    got = ds.pack_text_rows(order, row_len=64, num_rows=40)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
