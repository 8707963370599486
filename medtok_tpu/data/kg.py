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


def edge_dropout(
    rng: np.random.Generator, src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
    p: float = 0.1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Drop each edge w.p. p (EdgeDropout, dataset_creator.py:155-170)."""
    keep = rng.random(len(src)) > p
    return src[keep], dst[keep], rel[keep]
