"""Data-layer tests: KG CSR subgraphs vs brute force, WordPiece vs HF
BertTokenizer semantics (hand-checked cases), bucketing collator, epoch
iterator determinism, end-to-end dataset -> model -> export -> API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.config import DataConfig
from medtok_tpu.data.dataset import MedCodeDataset, collate, epoch_batches
from medtok_tpu.data.kg import KnowledgeGraph
from medtok_tpu.data.synthetic import synthetic_code_vocab, synthetic_kg_csv
from medtok_tpu.data.text import WordPieceTokenizer, make_test_vocab


@pytest.fixture(scope="module")
def kg_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    synthetic_kg_csv(str(d / "kg.csv"), rng, num_nodes=300, num_edges=2500)
    synthetic_code_vocab(str(d / "codes.parquet"), rng, num_codes=40, num_nodes=300)
    return d


@pytest.fixture(scope="module")
def tokenizer():
    vocab = make_test_vocab(
        ["diabetes", "mellitus", "acute", "chronic", "infection", "fracture",
         "hypertension", "renal", "cardiac", "therapy", "syndrome", "disorder",
         "di", "##abetes", "frac", "##ture"]
    )
    return WordPieceTokenizer(vocab)


@pytest.fixture(scope="module")
def dataset(kg_files, tokenizer):
    cfg = DataConfig(
        text_buckets=(16, 32), node_buckets=(8, 16), edge_buckets=(16, 64),
        max_text_length=32,
    )
    return MedCodeDataset(
        kg_files / "kg.csv", kg_files / "codes.parquet", tokenizer, cfg=cfg
    )


# ----------------------------------------------------------------- KG -------

def test_induced_subgraph_matches_bruteforce(kg_files):
    kg = KnowledgeGraph.from_csv(kg_files / "kg.csv")
    rng = np.random.default_rng(1)
    for _ in range(10):
        nodes = np.sort(rng.choice(kg.num_nodes, size=12, replace=False))
        src, dst, rel = kg.induced_subgraph(nodes)
        # brute force over the full edge list (PyG subgraph semantics)
        in_set = np.isin(kg.edge_src, nodes) & np.isin(kg.edge_dst, nodes)
        exp_src = np.searchsorted(nodes, kg.edge_src[in_set])
        exp_dst = np.searchsorted(nodes, kg.edge_dst[in_set])
        exp_rel = kg.rel_index[in_set]
        # order-insensitive comparison
        got = sorted(zip(src.tolist(), dst.tolist(), rel.tolist()))
        exp = sorted(zip(exp_src.tolist(), exp_dst.tolist(), exp_rel.tolist()))
        assert got == exp


def test_relation_vocab_first_appearance(kg_files):
    kg = KnowledgeGraph.from_csv(kg_files / "kg.csv")
    # ids are dense 0..n-1 in first-appearance order (dataset_creator.py:201-206)
    assert sorted(kg.rel_vocab.values()) == list(range(len(kg.rel_vocab)))
    assert kg.rel_index.max() == len(kg.rel_vocab) - 1


# ------------------------------------------------------------ WordPiece -----

def test_wordpiece_basic(tokenizer):
    ids, mask = tokenizer.encode("Diabetes Mellitus")
    toks = [k for i in ids for k, v in tokenizer.vocab.items() if v == i]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert "diabetes" in toks and "mellitus" in toks
    assert mask.sum() == len(ids)


def test_wordpiece_subword_and_unk(tokenizer):
    # 'fracture' is in vocab whole; remove to force subword path via prefix
    ids, _ = tokenizer.encode("fracture")
    names = [k for i in ids for k, v in tokenizer.vocab.items() if v == i]
    assert "fracture" in names  # longest-match-first picks the whole word
    ids2, _ = tokenizer.encode("zzqxé")  # unknown-ish word with accent
    assert tokenizer.unk_id not in ids2[:1]  # CLS first
    # punctuation splits
    ids3, _ = tokenizer.encode("a,b")
    names3 = [k for i in ids3 for k, v in tokenizer.vocab.items() if v == i]
    assert names3[1:4] == ["a", ",", "b"]


def test_wordpiece_truncation_and_padding(tokenizer):
    long = " ".join(["diabetes"] * 50)
    ids, mask = tokenizer.encode(long, max_length=16, pad_to_max=True)
    assert len(ids) == 16 and ids[-1] == tokenizer.pad_id or ids[15] == tokenizer.sep_id
    ids2, _ = tokenizer.encode(long, max_length=16)
    assert len(ids2) == 16 and ids2[-1] == tokenizer.sep_id


# ------------------------------------------------------------- dataset ------

def test_collate_buckets_and_masks(dataset):
    samples = [dataset[i] for i in range(8)]
    batch = collate(samples, dataset.cfg, pad_id=dataset.tokenizer.pad_id)
    B, Lt = batch.input_ids.shape
    assert B == 8 and Lt in dataset.cfg.text_buckets
    assert batch.node_ids.shape[1] in dataset.cfg.node_buckets
    Epg = batch.edge_src.shape[0] // B
    assert Epg in dataset.cfg.edge_buckets
    # masks consistent
    for i, s in enumerate(samples):
        assert batch.node_mask[i].sum() == min(len(s.nodes), batch.node_ids.shape[1])
        assert batch.attention_mask[i].sum() == min(len(s.input_ids), Lt)
    # edges hold local node indices within [0, Ln)
    valid = batch.edge_weight > 0
    assert batch.edge_src[valid].max() < batch.node_ids.shape[1]


def test_epoch_batches_deterministic(dataset):
    b1 = list(epoch_batches(dataset, batch_size=8, seed=3, epoch=1))
    b2 = list(epoch_batches(dataset, batch_size=8, seed=3, epoch=1))
    assert len(b1) == len(dataset) // 8
    for x, y in zip(b1, b2):
        for a, b in zip(x, y):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different epoch -> different order
    b3 = next(iter(epoch_batches(dataset, batch_size=8, seed=3, epoch=2)))
    assert not np.array_equal(b3.code_indices, b1[0].code_indices)


def test_augmented_edges_are_subset(dataset):
    batch = next(iter(epoch_batches(dataset, batch_size=8, seed=0, epoch=0)))
    base = set(zip(batch.edge_src[batch.edge_weight > 0].tolist(),
                   batch.edge_dst[batch.edge_weight > 0].tolist()))
    aug = list(zip(batch.edge_src_aug[batch.edge_weight_aug > 0].tolist(),
                   batch.edge_dst_aug[batch.edge_weight_aug > 0].tolist()))
    assert all(e in base for e in aug)


# --------------------------------------------------- export + public API ----

def test_export_and_api_end_to_end(dataset, tmp_path):
    from tests.test_model import tiny_config
    from medtok_tpu.export.export import export_all
    from medtok_tpu.api import MedTok
    from medtok_tpu.config import MedTokConfig
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    mcfg = tiny_config()
    model = MultimodalTokenizer(mcfg)
    batch = collate([dataset[0]], dataset.cfg, pad_id=dataset.tokenizer.pad_id)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.tree.map(jnp.asarray, batch), train=False,
    )
    arrays = export_all(
        model, variables["params"], variables["usage"], dataset,
        batch_size=16, out_dir=tmp_path,
    )
    n = len(dataset)
    assert arrays["embeddings_all"].shape == (n, mcfg.embedding_dim)
    assert arrays["tokens_all"].shape == (n, 4, mcfg.quantizer.top_k)
    assert (tmp_path / "embeddings_all.npy").exists()

    # API single-code path must agree with the batch export for the same code
    tok = MedTok(MedTokConfig(model=mcfg), variables["params"],
                 variables["usage"], dataset)
    code = dataset.code_at(5)
    emb = tok.embed(code)
    ids = tok.tokenize(code)
    assert emb.shape == (mcfg.embedding_dim,)
    assert ids.shape == (4, mcfg.quantizer.top_k)
    np.testing.assert_array_equal(ids, arrays["tokens_all"][5])
    np.testing.assert_allclose(emb, arrays["embeddings_all"][5], rtol=2e-3, atol=2e-4)


def test_export_invariant_to_batch_size(dataset, tmp_path):
    """Token IDs must not depend on export batching/bucket shapes — the
    static-shape analogue of SURVEY.md 4b's padding invariance, checked
    through the per-path parity harness."""
    from tests.test_model import tiny_config
    from medtok_tpu.export.export import export_all
    from medtok_tpu.export.parity import compare_exports
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    mcfg = tiny_config()
    model = MultimodalTokenizer(mcfg)
    batch = collate([dataset[0]], dataset.cfg, pad_id=dataset.tokenizer.pad_id)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.tree.map(jnp.asarray, batch), train=False,
    )
    for bs, sub in ((4, "a"), (16, "b")):
        export_all(model, variables["params"], variables["usage"], dataset,
                   batch_size=bs, out_dir=tmp_path / sub)
    report = compare_exports(tmp_path / "a", tmp_path / "b")
    assert report["token_exact_match"], report["token_id_parity"]
    assert report["embeddings_all"]["max_abs_err"] < 2e-3


def test_export_packed_equals_unpacked(dataset, tmp_path):
    """export_all(packed=True) — the sequence-packing fast path — must
    produce token-identical artifacts in the same vocab order, single-device
    AND over the 8-device dp mesh."""
    from tests.test_model import tiny_config
    from medtok_tpu.export.export import export_all
    from medtok_tpu.export.parity import compare_exports
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.parallel.mesh import make_mesh

    mcfg = tiny_config()
    model = MultimodalTokenizer(mcfg)
    batch = collate([dataset[0]], dataset.cfg, pad_id=dataset.tokenizer.pad_id)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.tree.map(jnp.asarray, batch), train=False,
    )
    export_all(model, variables["params"], variables["usage"], dataset,
               batch_size=16, out_dir=tmp_path / "plain")
    export_all(model, variables["params"], variables["usage"], dataset,
               packed=True, out_dir=tmp_path / "packed")
    report = compare_exports(tmp_path / "plain", tmp_path / "packed")
    assert report["token_exact_match"], report["token_id_parity"]
    assert report["embeddings_all"]["max_abs_err"] < 2e-3

    if len(jax.devices()) >= 8:
        export_all(model, variables["params"], variables["usage"], dataset,
                   packed=True, mesh=make_mesh(dp=8, tp=1),
                   out_dir=tmp_path / "packed8")
        report8 = compare_exports(tmp_path / "plain", tmp_path / "packed8")
        assert report8["token_exact_match"], report8["token_id_parity"]


def test_text_cache_persistence(kg_files, tokenizer, tmp_path):
    cfg = DataConfig(text_buckets=(16, 32), node_buckets=(8, 16),
                     edge_buckets=(16, 64), max_text_length=32)
    ds = MedCodeDataset(kg_files / "kg.csv", kg_files / "codes.parquet",
                        tokenizer, cfg=cfg, cache_dir=tmp_path)
    ids_first = ds.text_ids(3).copy()
    ds.save_text_cache()
    assert (tmp_path / "med_code_descriptions.npz").exists()
    ds2 = MedCodeDataset(kg_files / "kg.csv", kg_files / "codes.parquet",
                         tokenizer, cfg=cfg, cache_dir=tmp_path)
    assert 3 in ds2._text  # restored without re-encoding
    np.testing.assert_array_equal(ds2.text_ids(3), ids_first)


def test_api_tokenize_batch(dataset):
    from tests.test_model import tiny_config
    from medtok_tpu.api import MedTok
    from medtok_tpu.config import MedTokConfig
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer

    mcfg = tiny_config()
    model = MultimodalTokenizer(mcfg)
    batch = collate([dataset[0]], dataset.cfg, pad_id=dataset.tokenizer.pad_id)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.tree.map(jnp.asarray, batch), train=False,
    )
    tok = MedTok(MedTokConfig(model=mcfg), variables["params"],
                 variables["usage"], dataset)
    codes = [dataset.code_at(i) for i in (3, 7, 11)]
    out = tok.tokenize_batch(codes)
    assert out.embedding.shape == (3, mcfg.embedding_dim)
    np.testing.assert_array_equal(out.tokens[1], tok.tokenize(codes[1]))


def test_pretrained_artifact_api(dataset, tmp_path, kg_files):
    from medtok_tpu.api import PretrainedMedTok

    rng = np.random.default_rng(0)
    n = len(dataset)
    np.save(tmp_path / "embeddings_all.npy",
            rng.normal(size=(n, 256)).astype(np.float32))
    np.save(tmp_path / "tokens_all.npy",
            rng.integers(0, 100, size=(n, 4, 5)).astype(np.int32))
    api = PretrainedMedTok(tmp_path, kg_files / "codes.parquet")
    code = dataset.code_at(9)
    np.testing.assert_array_equal(api.embed(code), api.embeddings[9])
    np.testing.assert_array_equal(api.tokenize(code), api.tokens[9])
    assert api.encode(code).shape == (20,)
    with pytest.raises(KeyError):
        api.embed("NOPE")


def test_tokenize_rows_sharded_equals_full(kg_files, tokenizer):
    """Sharded tokenize_rows (the bench's overlap path) caches exactly what
    per-text encode produces, independent of shard boundaries/overlap."""
    cfg = DataConfig(text_buckets=(16, 32), node_buckets=(8, 16),
                     edge_buckets=(16, 64), max_text_length=32)
    ds = MedCodeDataset(kg_files / "kg.csv", kg_files / "codes.parquet",
                        tokenizer, cfg=cfg)
    ds.warm_cache(tokenize=False)
    ds.tokenize_rows(range(10, 25))          # middle shard first
    ds.tokenize_rows(range(0, 40))           # rest + already-cached overlap
    for i in range(40):
        ref_ids, _ = tokenizer.encode(str(ds.df["desc"].iloc[i]), max_length=32)
        np.testing.assert_array_equal(ds.text_ids(i), ref_ids)
