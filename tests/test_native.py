"""Native C++ graph runtime vs the numpy reference implementation."""

import numpy as np
import pytest

from medtok_tpu.data.kg import KnowledgeGraph
from medtok_tpu.data.native import NativeGraph, native_available
from medtok_tpu.data.synthetic import synthetic_kg_csv

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def graphs(tmp_path_factory):
    d = tmp_path_factory.mktemp("kg")
    rng = np.random.default_rng(0)
    synthetic_kg_csv(str(d / "kg.csv"), rng, num_nodes=400, num_edges=5000)
    kg = KnowledgeGraph.from_csv(d / "kg.csv")
    ng = NativeGraph(kg.edge_src, kg.edge_dst, kg.rel_index, kg.num_nodes)
    return kg, ng


def test_native_subgraph_matches_numpy(graphs):
    kg, ng = graphs
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = int(rng.integers(1, 30))
        nodes = np.sort(rng.choice(kg.num_nodes, size=n, replace=False))
        ref = sorted(zip(*[a.tolist() for a in kg.induced_subgraph(nodes)]))
        got = sorted(zip(*[a.tolist() for a in ng.induced_subgraph(nodes)]))
        assert got == ref


def test_native_pack_batch_layout(graphs):
    kg, ng = graphs
    rng = np.random.default_rng(2)
    lists = [np.sort(rng.choice(kg.num_nodes, size=int(rng.integers(1, 12)),
                                replace=False)) for _ in range(6)]
    out = ng.pack_batch(lists, ln=16, epg=32, dropout_p=0.0, seed=0)
    assert out["node_ids"].shape == (6, 16)
    for i, nl in enumerate(lists):
        assert out["node_mask"][i].sum() == len(nl)
        np.testing.assert_array_equal(out["node_ids"][i, :len(nl)], nl)
    # edges match numpy subgraph per sample, chunked at i*epg
    for i, nl in enumerate(lists):
        ref = sorted(zip(*[a.tolist() for a in kg.induced_subgraph(nl)][:2]))
        w = out["edge_weight"][i*32:(i+1)*32]
        ne = int(w.sum())
        got = sorted(zip(out["edge_src"][i*32:i*32+ne].tolist(),
                         out["edge_dst"][i*32:i*32+ne].tolist()))
        assert got == ref
    # without dropout, aug == clean
    np.testing.assert_array_equal(out["edge_src_aug"], out["edge_src"])
    np.testing.assert_array_equal(out["edge_weight_aug"], out["edge_weight"])


def test_native_pack_batch_dropout_deterministic(graphs):
    kg, ng = graphs
    rng = np.random.default_rng(3)
    lists = [np.sort(rng.choice(kg.num_nodes, size=10, replace=False))
             for _ in range(4)]
    a = ng.pack_batch(lists, ln=16, epg=64, dropout_p=0.3, seed=7)
    b = ng.pack_batch(lists, ln=16, epg=64, dropout_p=0.3, seed=7)
    np.testing.assert_array_equal(a["edge_weight_aug"], b["edge_weight_aug"])
    c = ng.pack_batch(lists, ln=16, epg=64, dropout_p=0.3, seed=8)
    assert a["edge_weight_aug"].sum() != c["edge_weight_aug"].sum() or \
        not np.array_equal(a["edge_src_aug"], c["edge_src_aug"])
    # aug edges are a subset of clean edges
    assert a["edge_weight_aug"].sum() <= a["edge_weight"].sum()


def test_native_pack_batch_threaded_matches_serial(graphs, monkeypatch):
    """The threaded pack path (forced via MEDTOK_PACK_THREADS) writes byte-
    identical output to the serial path, including the dropout-aug arrays
    (per-graph RNG streams are thread-count invariant)."""
    kg, ng = graphs
    rng = np.random.default_rng(9)
    lists = [np.sort(rng.choice(kg.num_nodes, size=int(rng.integers(1, 14)),
                                replace=False)) for _ in range(256)]
    monkeypatch.setenv("MEDTOK_PACK_THREADS", "1")
    serial = ng.pack_batch(lists, ln=16, epg=32, dropout_p=0.3, seed=11)
    monkeypatch.setenv("MEDTOK_PACK_THREADS", "4")
    threaded = ng.pack_batch(lists, ln=16, epg=32, dropout_p=0.3, seed=11)
    for k in serial:
        np.testing.assert_array_equal(np.asarray(serial[k]),
                                      np.asarray(threaded[k]), err_msg=k)


def test_native_pack_batch_aliases_aug_when_no_dropout(graphs):
    """dropout_p=0 returns the SAME buffers for aug (the C side skips the aug
    pass on aliased pointers) — the eval/export contract aug == clean holds
    by construction."""
    kg, ng = graphs
    rng = np.random.default_rng(10)
    lists = [np.sort(rng.choice(kg.num_nodes, size=8, replace=False))
             for _ in range(4)]
    out = ng.pack_batch(lists, ln=16, epg=32, dropout_p=0.0, seed=0)
    assert out["edge_src_aug"] is out["edge_src"]
    assert out["edge_weight_aug"] is out["edge_weight"]
    # and a dropout_p>0 call still produces independent aug buffers
    out2 = ng.pack_batch(lists, ln=16, epg=32, dropout_p=0.5, seed=3)
    assert out2["edge_src_aug"] is not out2["edge_src"]


def test_make_batch_native_matches_numpy_fallback(tmp_path):
    """dataset.make_batch must produce identical batches with and without the
    native fast path (eval path, no augmentation)."""
    import numpy as np
    from medtok_tpu.config import DataConfig
    from medtok_tpu.data.dataset import MedCodeDataset
    from medtok_tpu.data.synthetic import synthetic_code_vocab, synthetic_kg_csv
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab

    rng = np.random.default_rng(5)
    synthetic_kg_csv(str(tmp_path / "kg.csv"), rng, num_nodes=300, num_edges=2500)
    synthetic_code_vocab(str(tmp_path / "codes.parquet"), rng, num_codes=20,
                         num_nodes=300)
    tok = WordPieceTokenizer(make_test_vocab(["diabetes", "mellitus", "acute"]))
    cfg = DataConfig(text_buckets=(16, 32), node_buckets=(8, 16),
                     edge_buckets=(16, 64), max_text_length=32)
    ds = MedCodeDataset(tmp_path / "kg.csv", tmp_path / "codes.parquet", tok, cfg=cfg)
    assert ds.native is not None
    idxs = list(range(8))
    fast = ds.make_batch(idxs, aug_seed=None)
    ds.native = None
    slow = ds.make_batch(idxs, aug_seed=None)
    for name, a, b in zip(fast._fields, fast, slow):
        a, b = np.asarray(a), np.asarray(b)
        if name in ("edge_src", "edge_dst", "edge_src_aug", "edge_dst_aug"):
            continue  # compared as sets below (extraction order may differ)
        np.testing.assert_array_equal(a, b, err_msg=name)
    B, Epg = 8, fast.edge_src.shape[0] // 8
    for i in range(B):
        fa = set(zip(fast.edge_src[i*Epg:(i+1)*Epg][fast.edge_weight[i*Epg:(i+1)*Epg] > 0].tolist(),
                     fast.edge_dst[i*Epg:(i+1)*Epg][fast.edge_weight[i*Epg:(i+1)*Epg] > 0].tolist()))
        sl = set(zip(slow.edge_src[i*Epg:(i+1)*Epg][slow.edge_weight[i*Epg:(i+1)*Epg] > 0].tolist(),
                     slow.edge_dst[i*Epg:(i+1)*Epg][slow.edge_weight[i*Epg:(i+1)*Epg] > 0].tolist()))
        assert fa == sl


def test_native_wordpiece_matches_python():
    from medtok_tpu.data.native_text import NativeWordPiece, native_text_available
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab

    if not native_text_available():
        pytest.skip("no C++ toolchain")
    tok = WordPieceTokenizer(make_test_vocab(
        ["diabetes", "mellitus", "acute", "fracture", "di", "##abetes",
         "frac", "##ture", "type", "ii"]
    ))
    fast = NativeWordPiece(tok)
    rng = np.random.default_rng(0)
    words = ["diabetes", "mellitus", "acute", "fracture", "type", "ii",
             "e11.9", "a,b", "UNKNOWNWORD", "x9", "...", "a-b-c", ""]
    for _ in range(200):
        text = " ".join(rng.choice(words, size=int(rng.integers(1, 12))))
        for ml, pad in ((32, False), (8, True)):
            ref_ids, ref_mask = tok.encode(text, max_length=ml, pad_to_max=pad)
            got_ids, got_mask = fast.encode(text, max_length=ml, pad_to_max=pad)
            np.testing.assert_array_equal(got_ids, ref_ids, err_msg=text)
            np.testing.assert_array_equal(got_mask, ref_mask, err_msg=text)
    # non-ASCII falls back to python (identical results)
    ids_a, _ = fast.encode("café au lait")
    ids_b, _ = tok.encode("café au lait")
    np.testing.assert_array_equal(ids_a, ids_b)


def test_native_wordpiece_batch_matches_sequential():
    """encode_batch (multithreaded C++) == per-text encode, including the
    non-ASCII python-fallback rows and truncation."""
    from medtok_tpu.data.native_text import NativeWordPiece, native_text_available
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab

    if not native_text_available():
        pytest.skip("no C++ toolchain")
    tok = WordPieceTokenizer(make_test_vocab(
        ["diabetes", "mellitus", "acute", "fracture", "type", "ii"]
    ))
    fast = NativeWordPiece(tok)
    rng = np.random.default_rng(1)
    words = ["diabetes", "mellitus", "acute", "fracture", "type", "ii",
             "e11.9", "UNKNOWNWORD", "..."]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(1, 30))))
        for _ in range(500)
    ]
    texts[3] = "café au lait"        # non-ASCII -> python fallback row
    texts[10] = ""                   # empty
    texts[20] = "x " * 200           # truncation
    for nthreads in (1, 4):
        got = fast.encode_batch(texts, max_length=16, num_threads=nthreads)
        assert len(got) == len(texts)
        for t, g in zip(texts, got):
            ref_ids, _ = tok.encode(t, max_length=16)
            np.testing.assert_array_equal(g, ref_ids, err_msg=t)


def test_native_wordpiece_speed_sanity():
    import time

    from medtok_tpu.data.native_text import NativeWordPiece, native_text_available
    from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab

    if not native_text_available():
        pytest.skip("no C++ toolchain")
    tok = WordPieceTokenizer(make_test_vocab(["diabetes", "mellitus", "acute"]))
    fast = NativeWordPiece(tok)
    texts = [f"diabetes mellitus type {i} acute complication" for i in range(2000)]
    t0 = time.perf_counter()
    for t in texts:
        tok.encode(t)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in texts:
        fast.encode(t)
    t_c = time.perf_counter() - t0
    assert t_c < t_py  # native must not be slower

