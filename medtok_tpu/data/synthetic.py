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
