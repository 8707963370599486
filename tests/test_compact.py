"""Compact pooled batches (data/native.py::pack_batch_compact,
data/compact.py::unpack_compact): the transfer-optimized edge layout used by
the heavy-tail export path. Must be bit-equivalent to the classic
make_batch after device-side expansion, and the buffer pool must recycle
safely behind its fences."""

import numpy as np
import pytest

from medtok_tpu.config import DataConfig
from medtok_tpu.data.compact import unpack_compact
from medtok_tpu.data.dataset import MedCodeDataset
from medtok_tpu.data.native import native_available
from medtok_tpu.data.synthetic import synthetic_code_vocab, synthetic_kg_csv
from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("compact")
    rng = np.random.default_rng(3)
    synthetic_kg_csv(str(d / "kg.csv"), rng, num_nodes=300, num_edges=2500)
    synthetic_code_vocab(str(d / "codes.parquet"), rng, num_codes=40,
                         num_nodes=300)
    vocab = make_test_vocab(
        ["diabetes", "mellitus", "acute", "chronic", "infection", "fracture"]
    )
    cfg = DataConfig(
        text_buckets=(16, 32), node_buckets=(8, 16), edge_buckets=(16, 64),
        max_text_length=32,
    )
    return MedCodeDataset(
        d / "kg.csv", d / "codes.parquet", WordPieceTokenizer(vocab), cfg=cfg
    )


def _assert_equiv(classic, compact):
    """unpacked compact batch == classic batch, field by field."""
    got = unpack_compact(compact)
    for f in classic._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(classic, f)),
            err_msg=f,
        )


@pytest.mark.parametrize("aug_seed", [None, 7])
def test_compact_equals_classic(dataset, aug_seed):
    idxs = list(range(16))
    classic = dataset.make_batch(idxs, aug_seed=aug_seed)
    compact, fence = dataset.make_batch_compact(idxs, aug_seed=aug_seed)
    assert (compact.edge_packed_aug is None) == (aug_seed is None)
    _assert_equiv(classic, compact)
    fence.set_fence(None)  # API exists even on the fallback path


def test_compact_forced_shapes(dataset):
    idxs = [3, 1, 2, 9]
    shp = (16, 16, 64)
    classic = dataset.make_batch(idxs, aug_seed=None, force_shapes=shp)
    compact, _ = dataset.make_batch_compact(idxs, aug_seed=None,
                                            force_shapes=shp)
    _assert_equiv(classic, compact)


def test_compact_model_outputs_match(dataset):
    """The full eval forward through unpack_compact equals the classic
    batch's outputs bit-for-bit (the consumer-level guarantee)."""
    import jax

    from medtok_tpu.config import (
        GraphEncoderConfig,
        ModelConfig,
        QuantizerConfig,
        TextEncoderConfig,
    )
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    cfg = ModelConfig(
        text=TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=1,
                               num_heads=4, intermediate_size=64),
        graph=GraphEncoderConfig(num_nodes=300, in_channels=8,
                                 hidden_channels=16, out_channels=16),
        quantizer=QuantizerConfig(codebook_size=90, codebook_embed_dim=16),
    )
    model = MultimodalTokenizer(cfg)
    idxs = list(range(12))
    classic = dataset.make_batch(idxs, aug_seed=None)
    compact, _ = dataset.make_batch_compact(idxs, aug_seed=None)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        classic, train=False,
    )

    @jax.jit
    def classic_step(b):
        return model.apply(variables, b, train=False)

    @jax.jit
    def compact_step(cb):
        return model.apply(variables, unpack_compact(cb), train=False)

    a = classic_step(classic)
    b = compact_step(compact)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.embedding),
                                  np.asarray(b.embedding))
    np.testing.assert_array_equal(np.asarray(a.weights), np.asarray(b.weights))


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_pool_recycles_and_fences(dataset):
    class Fence:
        def __init__(self):
            self.waited = 0

        def block_until_ready(self):
            self.waited += 1

    native = dataset.native
    idxs = list(range(8))
    # first call creates the pool; read back its size-aware depth
    compact0, entry0 = dataset.make_batch_compact(idxs, aug_seed=None)
    (depth,) = {len(p) for p in native._pools.values() if entry0 in p}
    assert depth >= native.POOL_DEPTH
    seen = set()
    fences = []
    for i in range(depth + 2):
        compact, entry = dataset.make_batch_compact(idxs, aug_seed=None)
        ptr = compact.edge_packed.ctypes.data
        f = Fence()
        entry.set_fence(f)
        fences.append((ptr, f))
        seen.add(ptr)
    # pool-depth distinct buffers, then reuse (entry0 consumed slot 0, so
    # this window of depth+2 calls revisits exactly depth distinct buffers)
    assert len(seen) == depth
    # the recycled entries' fences were awaited exactly once
    waited = [f.waited for _, f in fences]
    assert waited[0] == 1 and waited[1] == 1
    assert all(w == 0 for w in waited[2:])


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_pool_keys_by_shape(dataset):
    _, e1 = dataset.make_batch_compact(list(range(8)), aug_seed=None,
                                       force_shapes=(16, 8, 16))
    _, e2 = dataset.make_batch_compact(list(range(8)), aug_seed=None,
                                       force_shapes=(16, 16, 64))
    assert e1.bufs["edge_packed"].shape != e2.bufs["edge_packed"].shape


def test_compact_arena_path_equals_classic(dataset):
    """After warm_cache the arena-indexed native pack is used — outputs must
    still equal the classic batch exactly (both aug and eval)."""
    dataset.warm_cache(tokenize=False)
    assert dataset._node_arena is not None
    for aug_seed in (None, 11):
        idxs = [5, 0, 17, 3, 9, 9, 2, 30]
        classic = dataset.make_batch(idxs, aug_seed=aug_seed)
        compact, _ = dataset.make_batch_compact(idxs, aug_seed=aug_seed)
        _assert_equiv(classic, compact)


def test_count_edges_matches_packed_ne(dataset):
    """count_edges == the ne the compact packer emits at an ample epg."""
    ds = dataset
    ds.warm_cache(tokenize=False)
    if ds.native is None:
        pytest.skip("native library unavailable")
    n = min(len(ds), 64)
    ln = max(ds.cfg.node_buckets)
    counts = ds.edge_counts(0, n, ln=ln)
    batch, _ = ds.make_batch_compact(
        list(range(n)), aug_seed=None,
        force_shapes=(ds.cfg.text_buckets[0], ln, 1 << 14), want_text=False,
    )
    np.testing.assert_array_equal(counts, batch.ne[:n])


@pytest.mark.parametrize("aug_seed", [None, 7])
def test_stream_encoding_equals_classic(dataset, aug_seed):
    """Ln >= STREAM_MIN_NODES selects the uint16 dst-stream + outdeg
    encoding; unpacked it must equal the classic batch exactly (both the
    main and the edge-dropout-augmented views)."""
    from medtok_tpu.data import dataset as dsmod

    if dataset.native is None:
        pytest.skip("native library unavailable")
    idxs = list(range(16))
    shp = (16, dsmod.STREAM_MIN_NODES, 512)
    classic = dataset.make_batch(idxs, aug_seed=aug_seed, force_shapes=shp)
    compact, fence = dataset.make_batch_compact(idxs, aug_seed=aug_seed,
                                                force_shapes=shp)
    assert compact.outdeg is not None          # stream path actually taken
    assert compact.edge_packed.dtype == np.uint16
    assert (compact.outdeg_aug is None) == (aug_seed is None)
    _assert_equiv(classic, compact)
    fence.set_fence(None)


def test_stream_encoding_arena_path(dataset):
    """Stream pack via the warm-cache arena == stream pack without it."""
    from medtok_tpu.data import dataset as dsmod

    if dataset.native is None:
        pytest.skip("native library unavailable")
    idxs = [5, 0, 11, 3]
    shp = (16, dsmod.STREAM_MIN_NODES, 256)
    dataset._node_arena = None
    dataset._node_arena_off = None
    cold, _ = dataset.make_batch_compact(idxs, aug_seed=3, force_shapes=shp)
    dataset.warm_cache(tokenize=False)
    warm, _ = dataset.make_batch_compact(idxs, aug_seed=3, force_shapes=shp)
    for f in cold._fields:
        a, b = getattr(cold, f), getattr(warm, f)
        if a is None:
            assert b is None, f
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f)


def test_fallback_grows_edge_bucket_like_native(dataset, monkeypatch):
    """The numpy fallback of make_batch_compact must keep classic
    make_batch's grow-on-truncation semantics: a batch whose induced edges
    overflow the first edge bucket packs at the grown bucket on BOTH the
    native and the native-less path (regression: the fallback used to pin
    the precomputed shapes and silently truncate)."""
    if dataset.native is None:
        pytest.skip("native library unavailable")
    # find a batch that actually overflows the first edge bucket
    first_epg = dataset.cfg.edge_buckets[0]
    idxs = None
    for start in range(0, len(dataset) - 8):
        cand = list(range(start, start + 8))
        classic = dataset.make_batch(cand, aug_seed=None)
        if classic.edge_weight.size // len(cand) > first_epg:
            idxs = cand
            break
    if idxs is None:
        pytest.skip("no edge-overflowing batch in this synthetic vocab")
    native_c, _ = dataset.make_batch_compact(idxs, aug_seed=None)
    monkeypatch.setattr(dataset, "native", None)
    fallback_c, fence = dataset.make_batch_compact(idxs, aug_seed=None)
    fence.set_fence(None)
    got_n = unpack_compact(native_c)
    got_f = unpack_compact(fallback_c)
    for f in got_n._fields:
        a, b = np.asarray(getattr(got_n, f)), np.asarray(getattr(got_f, f))
        assert a.shape == b.shape, f
        np.testing.assert_array_equal(a, b, err_msg=f)
