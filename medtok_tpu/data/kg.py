"""PrimeKG loading: kg.csv -> edge arrays + CSR adjacency (pure numpy).

Reference: MedCodeDataset.get_kg (/root/reference/MedTok/dataset_creator.py:191-211)
builds a [2, E] edge_index plus a display_relation-vocabulary id per edge.
Here the edge list is additionally indexed into CSR form so per-code induced
subgraph extraction is O(sum degree of the code's nodes) instead of O(E).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class KnowledgeGraph:
    edge_src: np.ndarray      # [E] int64 x_index
    edge_dst: np.ndarray      # [E] int64 y_index
    rel_index: np.ndarray     # [E] int32 display_relation vocab id
    rel_vocab: dict[str, int]
    num_nodes: int
    # CSR over outgoing edges, built on demand
    _indptr: np.ndarray | None = None
    _order: np.ndarray | None = None  # edge permutation sorting by src

    @classmethod
    def from_csv(cls, kg_path: str | Path) -> "KnowledgeGraph":
        """Read kg.csv (columns x_index, y_index, display_relation, ...).

        Accepts either the directory containing kg.csv or the file itself,
        like the reference (dataset_creator.py:192).
        """
        import pandas as pd

        p = Path(kg_path)
        if p.is_dir():
            p = p / "kg.csv"
        df = pd.read_csv(p, usecols=["x_index", "y_index", "display_relation"],
                         low_memory=False)
        src = df["x_index"].to_numpy(np.int64)
        dst = df["y_index"].to_numpy(np.int64)
        # first-appearance relation vocabulary (dataset_creator.py:201-206)
        rels = df["display_relation"].to_numpy()
        rel_vocab: dict[str, int] = {}
        codes = np.empty(len(rels), np.int32)
        for i, r in enumerate(rels):
            if r not in rel_vocab:
                rel_vocab[r] = len(rel_vocab)
            codes[i] = rel_vocab[r]
        num_nodes = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
        return cls(src, dst, codes, rel_vocab, num_nodes)

    def _build_csr(self) -> None:
        order = np.argsort(self.edge_src, kind="stable")
        counts = np.bincount(self.edge_src, minlength=self.num_nodes)
        indptr = np.zeros(self.num_nodes + 1, np.int64)
        np.cumsum(counts, out=indptr[1:])
        self._order = order
        self._indptr = indptr

    def induced_subgraph(
        self, nodes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Edges with BOTH endpoints in ``nodes``, relabeled to positions in
        the sorted node list — PyG ``subgraph(relabel_nodes=True)`` semantics
        as used at dataset_creator.py:260 (the reference sorts nodes first,
        :253).

        Returns (local_src, local_dst, rel) int32 arrays.
        """
        if self._indptr is None:
            self._build_csr()
        nodes = np.asarray(nodes, np.int64)
        nodes = np.sort(nodes)
        # gather candidate edges: all out-edges of member nodes
        spans = [
            self._order[self._indptr[n]:self._indptr[n + 1]]
            for n in nodes
            if n < self.num_nodes
        ]
        if not spans:
            z = np.zeros(0, np.int32)
            return z, z, z
        cand = np.concatenate(spans)
        dsts = self.edge_dst[cand]
        pos = np.searchsorted(nodes, dsts)
        pos = np.clip(pos, 0, len(nodes) - 1)
        keep = nodes[pos] == dsts
        cand = cand[keep]
        local_dst = pos[keep].astype(np.int32)
        local_src = np.searchsorted(nodes, self.edge_src[cand]).astype(np.int32)
        rel = self.rel_index[cand].astype(np.int32)
        return local_src, local_dst, rel


@dataclass
class HeteroKG:
    """Heterogeneous PrimeKG view (aux, not on the training path).

    Equivalent of the reference's DGL-based HeteroKG
    (dataset_creator.py:30-153): per-node-type reindexing
    (``node_type_graph_index`` = cumcount within type) and per-
    (x_type, relation, y_type) edge groups — as plain numpy arrays with an
    .npz cache instead of a DGL heterograph (no runtime trains on it).
    """

    # node_index -> (node_type, type_local_index)
    node_type: dict[int, str]
    node_type_graph_index: dict[int, int]
    # (x_type, relation, y_type) -> (src_local [E], dst_local [E])
    edge_groups: dict[tuple[str, str, str], tuple[np.ndarray, np.ndarray]]

    @classmethod
    def from_csv(cls, kg_path: str | Path, cache_path: str | Path | None = None) -> "HeteroKG":
        import pandas as pd

        if cache_path is not None and Path(cache_path).exists():
            return cls._load(cache_path)
        p = Path(kg_path)
        if p.is_dir():
            p = p / "kg.csv"
        df = pd.read_csv(p, low_memory=False)

        # unique nodes with first-appearance order, cumcount within type
        # (dataset_creator.py:59-62, 78-100)
        nx = df[["x_index", "x_type"]].rename(
            columns={"x_index": "node_index", "x_type": "node_type"})
        ny = df[["y_index", "y_type"]].rename(
            columns={"y_index": "node_index", "y_type": "node_type"})
        nodes = pd.concat([nx, ny], ignore_index=True).drop_duplicates(
            subset=["node_index"]).reset_index(drop=True)
        nodes["node_type_graph_index"] = nodes.groupby("node_type").cumcount()
        node_type = dict(zip(nodes["node_index"], nodes["node_type"]))
        local = dict(zip(nodes["node_index"], nodes["node_type_graph_index"]))

        edge_groups: dict = {}
        for (xt, rel, yt), sub in df.groupby(
            ["x_type", "relation", "y_type"], sort=False
        ):
            src = np.asarray([local[i] for i in sub["x_index"]], np.int64)
            dst = np.asarray([local[i] for i in sub["y_index"]], np.int64)
            edge_groups[(xt, rel, yt)] = (src, dst)
        kg = cls(node_type, local, edge_groups)
        if cache_path is not None:
            kg._save(cache_path)
        return kg

    def num_nodes(self, ntype: str) -> int:
        return sum(1 for t in self.node_type.values() if t == ntype)

    def num_edges(self) -> int:
        return sum(len(s) for s, _ in self.edge_groups.values())

    def get_type_graph_index(self, org_idx: int) -> int:
        """(dataset_creator.py:147-153)."""
        return self.node_type_graph_index[org_idx]

    def _save(self, path: str | Path) -> None:
        arrays = {}
        for i, (key, (s, d)) in enumerate(self.edge_groups.items()):
            arrays[f"src_{i}"] = s
            arrays[f"dst_{i}"] = d
        meta = {
            "keys": list(self.edge_groups),
            "node_index": list(self.node_type),
            "node_type": list(self.node_type.values()),
            "local": list(self.node_type_graph_index.values()),
        }
        np.savez_compressed(path, meta=np.asarray([repr(meta)]), **arrays)

    @classmethod
    def _load(cls, path: str | Path) -> "HeteroKG":
        import ast

        z = np.load(path, allow_pickle=False)
        meta = ast.literal_eval(str(z["meta"][0]))
        node_type = dict(zip(meta["node_index"], meta["node_type"]))
        local = dict(zip(meta["node_index"], meta["local"]))
        groups = {
            tuple(k): (z[f"src_{i}"], z[f"dst_{i}"])
            for i, k in enumerate(meta["keys"])
        }
        return cls(node_type, local, groups)


def edge_dropout(
    rng: np.random.Generator, src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
    p: float = 0.1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Drop each edge w.p. p (EdgeDropout, dataset_creator.py:155-170)."""
    keep = rng.random(len(src)) > p
    return src[keep], dst[keep], rel[keep]
