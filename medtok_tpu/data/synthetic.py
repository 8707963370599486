"""Synthetic fixtures: random CodeBatches and reference-schema datasets.

The reference repo ships no data (kg.csv / all_codes_mappings.parquet are
hub downloads; README.md:30). Tests and benchmarks use synthetic data in the
exact reference schema.
"""

from __future__ import annotations

import numpy as np

from medtok_tpu.data.types import CodeBatch


def random_code_batch(
    rng: np.random.Generator,
    *,
    batch: int = 8,
    text_len: int = 32,
    max_nodes: int = 16,
    max_edges_per_graph: int = 32,
    text_vocab: int = 30522,
    num_kg_nodes: int = 130000,
    edge_dropout_p: float = 0.1,
) -> CodeBatch:
    """A random, well-formed CodeBatch with ragged-then-padded graphs."""
    B, Lt, Ln = batch, text_len, max_nodes
    E = batch * max_edges_per_graph

    text_lens = rng.integers(4, Lt + 1, size=B)
    input_ids = np.zeros((B, Lt), np.int32)
    attention_mask = np.zeros((B, Lt), np.int32)
    for i, L in enumerate(text_lens):
        input_ids[i, :L] = rng.integers(1, text_vocab, size=L)
        attention_mask[i, :L] = 1

    node_counts = rng.integers(1, Ln + 1, size=B)
    node_ids = np.zeros((B, Ln), np.int32)
    node_mask = np.zeros((B, Ln), bool)
    for i, n in enumerate(node_counts):
        node_ids[i, :n] = rng.choice(num_kg_nodes, size=n, replace=False)
        node_mask[i, :n] = True

    # per-graph chunked layout with WITHIN-GRAPH local node indices
    # (see CodeBatch docstring): graph i's edges live in [i*Epg, i*Epg+ne)
    edge_src = np.zeros((E,), np.int32)
    edge_dst = np.zeros((E,), np.int32)
    edge_weight = np.zeros((E,), np.float32)
    Epg = max_edges_per_graph
    for i, n in enumerate(node_counts):
        ne = int(rng.integers(0, Epg + 1)) if n > 1 else 0
        if ne:
            edge_src[i * Epg:i * Epg + ne] = rng.integers(0, n, size=ne)
            edge_dst[i * Epg:i * Epg + ne] = rng.integers(0, n, size=ne)
            edge_weight[i * Epg:i * Epg + ne] = 1.0
    # augmented copy: independent edge dropout (dataset_creator.py:155-170)
    keep = (rng.random(E) > edge_dropout_p) & (edge_weight > 0)
    edge_weight_aug = np.where(keep, edge_weight, 0.0).astype(np.float32)

    return CodeBatch(
        input_ids=input_ids,
        attention_mask=attention_mask,
        node_ids=node_ids,
        node_mask=node_mask,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_weight=edge_weight,
        edge_src_aug=edge_src.copy(),
        edge_dst_aug=edge_dst.copy(),
        edge_weight_aug=edge_weight_aug,
        code_indices=np.arange(B, dtype=np.int32),
    )


def synthetic_kg_csv(
    path: str, rng: np.random.Generator, *, num_nodes: int = 500, num_edges: int = 4000
) -> None:
    """Write a PrimeKG-schema kg.csv (columns per dataset_creator.py:191-209)."""
    import pandas as pd

    rels = ["ppi", "carrier", "enzyme", "target", "transporter", "indication"]
    types = ["gene/protein", "drug", "disease", "effect/phenotype"]
    x = rng.integers(0, num_nodes, size=num_edges)
    y = rng.integers(0, num_nodes, size=num_edges)
    r = rng.integers(0, len(rels), size=num_edges)
    df = pd.DataFrame(
        {
            "relation": [rels[i] for i in r],
            "display_relation": [rels[i] for i in r],
            "x_index": x,
            "x_id": [str(i) for i in x],
            "x_type": [types[i % len(types)] for i in x],
            "x_name": [f"node_{i}" for i in x],
            "x_source": "synthetic",
            "y_index": y,
            "y_id": [str(i) for i in y],
            "y_type": [types[i % len(types)] for i in y],
            "y_name": [f"node_{i}" for i in y],
            "y_source": "synthetic",
        }
    )
    df.to_csv(path, index=False)


def synthetic_code_vocab(
    path: str, rng: np.random.Generator, *, num_codes: int = 64, num_nodes: int = 500
) -> None:
    """Write an all_codes_mappings.parquet-schema vocab
    (med_code / desc / pkg_index_list, dataset_creator.py:179, 252-255)."""
    import pandas as pd

    words = ["diabetes", "mellitus", "acute", "chronic", "infection", "fracture",
             "hypertension", "renal", "cardiac", "therapy", "syndrome", "disorder"]
    rows = []
    for i in range(num_codes):
        n = int(rng.integers(1, 9))
        nodes = rng.choice(num_nodes, size=n, replace=False).tolist()
        desc = " ".join(rng.choice(words, size=int(rng.integers(2, 8))).tolist())
        rows.append(
            {"med_code": f"C{i:05d}", "desc": desc, "pkg_index_list": nodes}
        )
    pd.DataFrame(rows).to_parquet(path)


# ---------------------------------------------------------------------------
# North-star-scale generators (vectorized; 600K codes in ~15s)
# ---------------------------------------------------------------------------

MEDICAL_WORDS = [
    "diabetes", "mellitus", "acute", "chronic", "infection", "fracture",
    "hypertension", "renal", "cardiac", "therapy", "syndrome", "disorder",
    "unspecified", "type", "without", "with", "complications", "disease",
    "malignant", "neoplasm", "left", "right", "injury", "of", "the", "and",
    "due", "to", "encounter", "screening", "examination", "failure",
    "obstruction", "bilateral", "initial", "subsequent", "sequela",
    "poisoning", "adverse", "effect", "tablet", "oral", "solution",
    "personal", "history", "body", "region", "severe", "moderate", "mild",
]

# Rare-term building blocks: real medical descriptions WordPiece-split into a
# FEW subwords (bert-base covers medical morphemes), not into single chars.
# Synthetic rare words are 2-3 syllable compounds; the bench vocab carries
# each syllable + its '##'-continuation so they tokenize to 2-3 pieces.
SYLLABLES = [
    "card", "neph", "gastr", "hepat", "derm", "pulmon", "arthr", "oste",
    "cyt", "hemo", "lymph", "scler", "fibro", "myel", "neur", "angi",
    "bronch", "cephal", "chondr", "colo", "encephal", "gloss", "myo",
    "phleb", "pleur", "rhin", "thromb", "vasc",
    "itis", "osis", "emia", "oma", "pathy", "ectomy", "plasty", "scopy",
    "gram", "logy", "lysis", "trophy", "algia", "penia", "rrhea", "stasis",
]


def synthetic_vocab_frame(
    rng: np.random.Generator,
    *,
    num_codes: int,
    num_kg_nodes: int = 130_000,
    extra_words: int = 200,
    max_pkg_nodes: int = 16,
    heavy_tail: bool = False,
):
    """all_codes_mappings.parquet-schema frame at arbitrary scale
    (med_code / desc / pkg_index_list; dataset_creator.py:179, 252-255).

    Descriptions draw from a medical word pool plus random letter strings
    (those WordPiece-split into subwords like real rare terms); lengths are
    lognormal with mean ~7 words, matching typical ICD/ATC descriptions.

    ``heavy_tail`` adds the unbounded-subgraph tail the reference sees
    (dataset_creator.py:250-276 puts no cap on ``pkg_index_list``): ~9% of
    codes draw 17..128 nodes and ~3% draw 129..512, so the 128/512 node
    buckets carry real traffic in the benchmark.
    """
    import pandas as pd

    syl = np.array(SYLLABLES)
    extra = [
        "".join(rng.choice(syl, size=int(n)))
        for n in rng.integers(2, 4, size=extra_words)
    ]
    pool = np.array(MEDICAL_WORDS + extra)

    lens = np.clip(rng.lognormal(1.9, 0.5, num_codes).astype(np.int64), 2, 40)
    offs = np.concatenate([[0], np.cumsum(lens)])
    widx = rng.integers(0, len(pool), size=int(offs[-1]))
    descs = [" ".join(pool[widx[offs[i]:offs[i + 1]]]) for i in range(num_codes)]

    sizes = np.clip(rng.geometric(0.25, num_codes), 1, max_pkg_nodes)
    if heavy_tail:
        r = rng.random(num_codes)
        sizes = np.where(r < 0.12, rng.integers(17, 129, num_codes), sizes)
        sizes = np.where(r < 0.03, rng.integers(129, 513, num_codes), sizes)
    # contiguous node runs with a random stride: unique, SORTED (no modulo
    # wrap — warm_cache's vectorized sortedness check then skips the keyed
    # re-sort for the whole vocabulary), cheap to draw
    strides = rng.integers(1, 5, num_codes)
    span = np.maximum(num_kg_nodes - strides * (sizes - 1), 1)
    starts = (rng.random(num_codes) * span).astype(np.int64)
    pkg = [
        starts[i] + strides[i] * np.arange(sizes[i])
        for i in range(num_codes)
    ]
    return pd.DataFrame({
        "med_code": [f"C{i:06d}" for i in range(num_codes)],
        "desc": descs,
        "pkg_index_list": pkg,
    })


def synthetic_kg(
    rng: np.random.Generator, *, num_nodes: int = 130_000,
    num_edges: int = 4_000_000, num_relations: int = 20,
    local_frac: float = 0.0, local_window: int = 64,
):
    """A PrimeKG-scale KnowledgeGraph built directly from arrays (writing an
    8M-row kg.csv just to re-read it would dominate bench setup).

    ``local_frac`` makes that share of edges LOCAL (dst within
    +-local_window of src). Uniform-random edges give code subgraphs that
    are near-edgeless (E*(n/N)^2 expected induced edges); real PrimeKG
    neighborhoods are dense, so the bench uses locality to put real edge
    traffic through the GCN."""
    from medtok_tpu.data.kg import KnowledgeGraph

    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    if local_frac > 0:
        off = rng.integers(-local_window, local_window + 1, num_edges)
        dst = np.where(
            rng.random(num_edges) < local_frac,
            (src + off) % num_nodes,
            dst,
        )
    rel = rng.integers(0, num_relations, num_edges).astype(np.int32)
    vocab = {f"rel_{i}": i for i in range(num_relations)}
    return KnowledgeGraph(src, dst, rel, vocab, num_nodes)
