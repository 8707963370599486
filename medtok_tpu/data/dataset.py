"""MedCodeDataset + static-shape bucketing collator.

Reference: MedCodeDataset (/root/reference/MedTok/dataset_creator.py:174-304)
— one sample per medical code from all_codes_mappings.parquet
(med_code / desc / pkg_index_list), each sample = BERT-tokenized description +
PrimeKG induced subgraph + an edge-dropout-augmented copy, PyG-Batch collated.

TPU-first differences:
- text is tokenized once up front and stored UNPADDED; the collator pads to
  the smallest configured bucket that fits the batch (the reference always
  pads to 512 — dataset_creator.py:279 — an 8-16x waste on the BERT FLOPs
  hot spot for typical short code descriptions);
- subgraphs are extracted via CSR (kg.py) and batched into bucketed static
  (Ln, Epg) shapes with masks, not ragged PyG Batches;
- augmentation is deterministic given (seed, epoch, index).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from medtok_tpu.config import DataConfig
from medtok_tpu.data.kg import KnowledgeGraph, edge_dropout
from medtok_tpu.data.text import WordPieceTokenizer
from medtok_tpu.data.types import CodeBatch


@dataclass
class CodeSample:
    index: int
    med_code: str
    input_ids: np.ndarray       # [L] unpadded
    nodes: np.ndarray           # sorted global PrimeKG node ids
    edge_src: np.ndarray        # local indices into nodes
    edge_dst: np.ndarray
    rel: np.ndarray


def _pick_bucket(buckets: Sequence[int], needed: int) -> int:
    for b in buckets:
        if needed <= b:
            return b
    return buckets[-1]


class MedCodeDataset:
    """Loads the code vocab + KG and serves CodeSamples.

    Args mirror the reference constructor (dataset_creator.py:175):
    kg path, code map parquet, tokenizer, max text length.
    """

    def __init__(
        self,
        kg: KnowledgeGraph | str | Path,
        med_codes_pkg_map_path: str | Path,
        tokenizer: WordPieceTokenizer,
        *,
        cfg: DataConfig = DataConfig(),
        cache_dir: str | Path | None = None,
    ):
        import pandas as pd

        self.cfg = cfg
        self.kg = kg if isinstance(kg, KnowledgeGraph) else KnowledgeGraph.from_csv(kg)
        self.df = pd.read_parquet(med_codes_pkg_map_path)
        self.tokenizer = tokenizer
        self._text_cache: dict[int, np.ndarray] = {}
        self._graph_cache: dict[int, tuple] = {}
        self._node_lists: list[np.ndarray] | None = None  # warm_cache()
        self._node_arena: np.ndarray | None = None        # warm_cache()
        self._node_arena_off: np.ndarray | None = None
        self._code_index: dict[str, int] | None = None  # lookup()
        # tokenized-description cache file (the reference pickles
        # med_code_descriptions.pkl once, dataset_creator.py:213-229)
        self._cache_file = (
            Path(cache_dir) / "med_code_descriptions.pkl"
            if cache_dir is not None else None
        )
        if self._cache_file is not None and self._cache_file.exists():
            import pickle

            with open(self._cache_file, "rb") as f:
                self._text_cache = pickle.load(f)
        # native C++ fast path (csrc/medtok_graph.cpp): subgraph extraction +
        # batch packing in one call; numpy fallback otherwise
        self.native = None
        try:
            from medtok_tpu.data.native import NativeGraph, native_available

            if native_available():
                self.native = NativeGraph(
                    self.kg.edge_src, self.kg.edge_dst, self.kg.rel_index,
                    self.kg.num_nodes,
                )
        except Exception:
            self.native = None
        # native WordPiece (csrc/wordpiece.cpp, ~8x over Python on ASCII;
        # identical output — non-ASCII texts fall back internally)
        self._encoder = tokenizer
        try:
            from medtok_tpu.data.native_text import (
                NativeWordPiece,
                native_text_available,
            )

            if native_text_available():
                self._encoder = NativeWordPiece(tokenizer)
        except Exception:
            pass

    def __len__(self) -> int:
        return len(self.df)

    def code_at(self, idx: int) -> str:
        return str(self.df.iloc[idx]["med_code"])

    def lookup(self, med_code: str) -> int:
        """Row index of a code string (the tokenize/encode/embed API entry).
        O(1): a code->row dict is built on first use (a full-column scan per
        call would cost ~600K comparisons on the real vocab)."""
        if self._code_index is None:
            self._code_index = {
                str(c): i for i, c in enumerate(self.df["med_code"].to_numpy())
            }
        try:
            return self._code_index[med_code]
        except KeyError:
            raise KeyError(f"unknown medical code {med_code!r}") from None

    def warm_cache(self, *, tokenize: bool = True) -> None:
        """Bulk-materialize per-code node lists (single dataframe pass instead
        of one iloc per sample) and optionally tokenize every description —
        the host half of the full-vocab export sweep."""
        values = self.df["pkg_index_list"].to_numpy()
        self._node_lists = [
            np.sort(np.asarray(list(v), np.int64)) for v in values
        ]
        # arena view for the indexed native pack (zero per-batch python)
        lens = np.fromiter((len(v) for v in self._node_lists), np.int64,
                           len(self._node_lists))
        self._node_arena_off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=self._node_arena_off[1:])
        self._node_arena = (
            np.concatenate(self._node_lists)
            if self._node_arena_off[-1] > 0 else np.zeros(0, np.int64)
        )
        if tokenize:
            self.tokenize_rows(range(len(self.df)))

    def tokenize_rows(self, rows) -> None:
        """Tokenize (and cache) the descriptions of ``rows`` — the host half
        of the export sweep, shardable so tokenization of shard i+1 overlaps
        the device compute of shard i (async dispatch)."""
        enc = self._encoder
        max_len = self.cfg.max_text_length
        cache = self._text_cache
        descs = self.df["desc"].to_numpy()
        missing = [i for i in rows if i not in cache]
        if missing and hasattr(enc, "encode_batch"):
            # multithreaded C++ bulk path (GIL released for the batch)
            encoded = enc.encode_batch(
                [str(descs[i]) for i in missing], max_length=max_len
            )
            cache.update(zip(missing, encoded))
        else:
            for i in missing:
                cache[i] = enc.encode(str(descs[i]), max_length=max_len)[0]

    def save_text_cache(self) -> None:
        """Persist the tokenized descriptions (call after a full pass)."""
        if self._cache_file is None:
            return
        import pickle

        self._cache_file.parent.mkdir(parents=True, exist_ok=True)
        with open(self._cache_file, "wb") as f:
            pickle.dump(self._text_cache, f)

    def node_list(self, idx: int) -> np.ndarray:
        if self._node_lists is not None:
            return self._node_lists[idx]
        return np.sort(np.asarray(list(self.df.iloc[idx]["pkg_index_list"]), np.int64))

    def text_ids(self, idx: int) -> np.ndarray:
        if idx not in self._text_cache:
            ids, _ = self._encoder.encode(
                str(self.df.iloc[idx]["desc"]), max_length=self.cfg.max_text_length
            )
            self._text_cache[idx] = ids
        return self._text_cache[idx]

    def batch_shapes(self, indices: Sequence[int]) -> tuple[int, int, int]:
        """(Lt, Ln, Epg) buckets a batch of these codes needs. Used by the
        multi-host driver to fix the GLOBAL batch shape on every process
        (SPMD requires all processes to compile/run identical programs, so
        bucket choice must not depend on process-local rows)."""
        Lt = _pick_bucket(
            self.cfg.text_buckets,
            max(len(self.text_ids(int(i))) for i in indices),
        )
        max_n = max(len(self.node_list(int(i))) for i in indices)
        bucket_i = next(
            (bi for bi, b in enumerate(self.cfg.node_buckets) if max_n <= b),
            len(self.cfg.node_buckets) - 1,
        )
        Ln = self.cfg.node_buckets[bucket_i]
        Epg = self.cfg.edge_buckets[min(bucket_i, len(self.cfg.edge_buckets) - 1)]
        return Lt, Ln, Epg

    def make_batch(
        self,
        indices: Sequence[int],
        *,
        aug_seed: int | None = None,
        force_shapes: tuple[int, int, int] | None = None,
    ) -> CodeBatch:
        """Fast path: build a CodeBatch directly via the native packer
        (extraction + padding + edge dropout in C++). Falls back to the
        per-sample numpy path when the native library is unavailable.

        ``force_shapes=(Lt, Ln, Epg)`` pins the padded shapes (multi-host:
        every process must produce the same global shape; edges beyond Epg
        are truncated rather than grown)."""
        if self.native is None:
            rng = (np.random.default_rng(aug_seed)
                   if aug_seed is not None else None)
            return collate([self[int(i)] for i in indices], self.cfg, rng=rng,
                           pad_id=self.tokenizer.pad_id, shapes=force_shapes)

        texts = [self.text_ids(int(i)) for i in indices]
        nodes = [self.node_list(int(i)) for i in indices]
        p = self.cfg.edge_dropout_p if aug_seed is not None else 0.0
        if force_shapes is not None:
            Lt, Ln, Epg = force_shapes
            packed = self.native.pack_batch(
                nodes, ln=Ln, epg=Epg, dropout_p=p, seed=aug_seed or 0
            )
        else:
            Lt = _pick_bucket(self.cfg.text_buckets, max(len(t) for t in texts))
            max_n = max(len(n) for n in nodes)
            bucket_i = next(
                (bi for bi, b in enumerate(self.cfg.node_buckets) if max_n <= b),
                len(self.cfg.node_buckets) - 1,
            )
            Ln = self.cfg.node_buckets[bucket_i]
            Epg = self.cfg.edge_buckets[min(bucket_i, len(self.cfg.edge_buckets) - 1)]
            packed = self.native.pack_batch(
                nodes, ln=Ln, epg=Epg, dropout_p=p, seed=aug_seed or 0
            )
            # grow the edge bucket if any sample's edges got truncated
            while packed["truncated"] and bucket_i < len(self.cfg.edge_buckets) - 1:
                bucket_i += 1
                Epg = self.cfg.edge_buckets[bucket_i]
                packed = self.native.pack_batch(
                    nodes, ln=Ln, epg=Epg, dropout_p=p, seed=aug_seed or 0
                )

        B = len(indices)
        input_ids = np.full((B, Lt), self.tokenizer.pad_id, np.int32)
        attention_mask = np.zeros((B, Lt), np.int32)
        for i, t in enumerate(texts):
            L = min(len(t), Lt)
            input_ids[i, :L] = t[:L]
            attention_mask[i, :L] = 1
        return CodeBatch(
            input_ids=input_ids, attention_mask=attention_mask,
            node_ids=packed["node_ids"], node_mask=packed["node_mask"],
            edge_src=packed["edge_src"], edge_dst=packed["edge_dst"],
            edge_weight=packed["edge_weight"],
            edge_src_aug=packed["edge_src_aug"],
            edge_dst_aug=packed["edge_dst_aug"],
            edge_weight_aug=packed["edge_weight_aug"],
            code_indices=np.asarray(indices, np.int32),
        )

    def make_batch_compact(
        self,
        indices: Sequence[int],
        *,
        aug_seed: int | None = None,
        force_shapes: tuple[int, int, int] | None = None,
    ):
        """Transfer-optimized batch: edges as one (src << 16) | dst int32 per
        edge + per-graph counts, written into POOLED native buffers (3x fewer
        h2d bytes and no fresh multi-MB allocations per step — the two costs
        that dominate heavy-tail export steps; see data/native.py).

        Returns ``(CompactCodeBatch, fence)``. After launching the device
        transfer, call ``fence.set_fence(one_transferred_jax_array)`` so the
        pooled buffers are not overwritten while the transfer is in flight.
        Falls back to compressing a classic ``make_batch`` when the native
        library is unavailable (fence is then a no-op holder).
        """
        from medtok_tpu.data.types import CompactCodeBatch

        if force_shapes is not None:
            Lt, Ln, Epg = force_shapes
        else:
            Lt, Ln, Epg = self.batch_shapes(indices)
        if self.native is None:
            classic = self.make_batch(indices, aug_seed=aug_seed,
                                      force_shapes=(Lt, Ln, Epg))
            return _compress_classic(classic, Ln, Epg,
                                     want_aug=aug_seed is not None)

        texts = [self.text_ids(int(i)) for i in indices]
        p = self.cfg.edge_dropout_p if aug_seed is not None else 0.0
        want_aug = aug_seed is not None

        def pack(epg):
            if self._node_arena is not None:
                # arena-indexed native pack: no per-code python in the path
                return self.native.pack_batch_compact_idx(
                    self._node_arena, self._node_arena_off,
                    np.asarray(indices, np.int64), ln=Ln, epg=epg,
                    dropout_p=p, seed=aug_seed or 0, want_aug=want_aug,
                )
            nodes = [self.node_list(int(i)) for i in indices]
            return self.native.pack_batch_compact(
                nodes, ln=Ln, epg=epg, dropout_p=p, seed=aug_seed or 0,
                want_aug=want_aug,
            )

        packed, entry = pack(Epg)
        if force_shapes is None:
            # grow the edge bucket if any sample's edges got truncated
            # (classic make_batch semantics; forced shapes truncate instead)
            bucket_i = self.cfg.edge_buckets.index(Epg) \
                if Epg in self.cfg.edge_buckets else len(self.cfg.edge_buckets)
            while packed["truncated"] and bucket_i < len(self.cfg.edge_buckets) - 1:
                bucket_i += 1
                Epg = self.cfg.edge_buckets[bucket_i]
                packed, entry = pack(Epg)
        B = len(indices)
        # vectorized text fill (one concatenate + one flat scatter; the
        # per-code slice-assign loop was ~4 ms at C=4096)
        input_ids = np.full(B * Lt, self.tokenizer.pad_id, np.int32)
        attention_mask = np.zeros(B * Lt, np.int32)
        tl = np.fromiter((min(len(t), Lt) for t in texts), np.int64, B)
        if B and tl.sum():
            cum = np.concatenate([[0], np.cumsum(tl)[:-1]])
            code_of = np.repeat(np.arange(B), tl)
            within = np.arange(int(tl.sum())) - cum[code_of]
            flat_pos = code_of * Lt + within
            toks = np.concatenate([t[:Lt] for t in texts]) if len(texts) else []
            input_ids[flat_pos] = toks
            attention_mask[flat_pos] = 1
        input_ids = input_ids.reshape(B, Lt)
        attention_mask = attention_mask.reshape(B, Lt)
        return CompactCodeBatch(
            input_ids=input_ids, attention_mask=attention_mask,
            node_ids=packed["node_ids"], node_mask=packed["node_mask"],
            edge_packed=packed["edge_packed"], ne=packed["ne"],
            edge_packed_aug=packed["edge_packed_aug"],
            ne_aug=packed["ne_aug"],
            code_indices=np.asarray(indices, np.int32),
        ), entry

    def __getitem__(self, idx: int) -> CodeSample:
        row = self.df.iloc[idx]
        if idx not in self._text_cache:
            ids, _ = self._encoder.encode(
                str(row["desc"]), max_length=self.cfg.max_text_length
            )
            self._text_cache[idx] = ids
        if idx not in self._graph_cache:
            nodes = np.sort(np.asarray(list(row["pkg_index_list"]), np.int64))
            src, dst, rel = self.kg.induced_subgraph(nodes)
            self._graph_cache[idx] = (nodes, src, dst, rel)
        nodes, src, dst, rel = self._graph_cache[idx]
        return CodeSample(
            index=idx, med_code=str(row["med_code"]),
            input_ids=self._text_cache[idx],
            nodes=nodes, edge_src=src, edge_dst=dst, rel=rel,
        )


class _NoopFence:
    """Fence holder for the no-pool fallback path (API parity)."""

    def set_fence(self, x) -> None:  # noqa: D102
        pass


def _compress_classic(classic, ln: int, epg: int, *, want_aug: bool):
    """CodeBatch -> (CompactCodeBatch, fence): numpy fallback used when the
    native library is unavailable. Classic edge slots are front-packed per
    graph (both the C++ packer and ``collate`` write real edges first), so
    ne = count of nonzero weights per graph chunk."""
    from medtok_tpu.data.types import CompactCodeBatch

    B = classic.node_ids.shape[0]

    def compress(src, dst, w):
        valid = w.reshape(B, epg) > 0
        ne = valid.sum(axis=1).astype(np.int32)
        packed = np.where(
            valid.reshape(-1),
            (src.astype(np.int32) << 16) | dst.astype(np.int32), 0
        ).astype(np.int32)
        return packed, ne

    edge_packed, ne = compress(classic.edge_src, classic.edge_dst,
                               classic.edge_weight)
    if want_aug:
        edge_packed_aug, ne_aug = compress(
            classic.edge_src_aug, classic.edge_dst_aug,
            classic.edge_weight_aug)
    else:
        edge_packed_aug, ne_aug = None, None
    return CompactCodeBatch(
        input_ids=classic.input_ids,
        attention_mask=classic.attention_mask,
        node_ids=classic.node_ids,
        node_mask=np.asarray(classic.node_mask, np.uint8),
        edge_packed=edge_packed, ne=ne,
        edge_packed_aug=edge_packed_aug, ne_aug=ne_aug,
        code_indices=classic.code_indices,
    ), _NoopFence()


def collate(
    samples: Sequence[CodeSample],
    cfg: DataConfig,
    *,
    rng: np.random.Generator | None = None,
    pad_id: int = 0,
    shapes: tuple[int, int, int] | None = None,
) -> CodeBatch:
    """Pad a list of samples into one static-shape CodeBatch.

    When ``rng`` is given, the augmented edge copy applies edge dropout
    (train path); otherwise it equals the clean copy (eval path).
    Oversize graphs are truncated to the largest bucket (counted, not
    silently: see CodeBatch.node_mask sums vs sample node counts).
    ``shapes`` pins (Lt, Ln, Epg) instead of bucket-fitting this batch.
    """
    B = len(samples)
    if shapes is not None:
        Lt, Ln, Epg = shapes
    else:
        Lt = _pick_bucket(cfg.text_buckets, max(len(s.input_ids) for s in samples))
        Ln = _pick_bucket(cfg.node_buckets, max(len(s.nodes) for s in samples))
        Epg = _pick_bucket(cfg.edge_buckets, max(len(s.edge_src) for s in samples))

    input_ids = np.full((B, Lt), pad_id, np.int32)
    attention_mask = np.zeros((B, Lt), np.int32)
    node_ids = np.zeros((B, Ln), np.int32)
    node_mask = np.zeros((B, Ln), bool)
    E = B * Epg
    edge_src = np.zeros((E,), np.int32)
    edge_dst = np.zeros((E,), np.int32)
    edge_weight = np.zeros((E,), np.float32)
    edge_src_aug = np.zeros((E,), np.int32)
    edge_dst_aug = np.zeros((E,), np.int32)
    edge_weight_aug = np.zeros((E,), np.float32)
    code_indices = np.asarray([s.index for s in samples], np.int32)

    for i, s in enumerate(samples):
        L = min(len(s.input_ids), Lt)
        input_ids[i, :L] = s.input_ids[:L]
        attention_mask[i, :L] = 1

        n = min(len(s.nodes), Ln)
        node_ids[i, :n] = s.nodes[:n]
        node_mask[i, :n] = True

        src, dst, rel = s.edge_src, s.edge_dst, s.rel
        if n < len(s.nodes):  # node truncation: drop edges touching cut nodes
            keep = (src < n) & (dst < n)
            src, dst, rel = src[keep], dst[keep], rel[keep]
        ne = min(len(src), Epg)
        o = i * Epg
        edge_src[o:o + ne] = src[:ne]
        edge_dst[o:o + ne] = dst[:ne]
        edge_weight[o:o + ne] = 1.0

        if rng is not None:
            a_src, a_dst, _ = edge_dropout(rng, src[:ne], dst[:ne], rel[:ne],
                                           p=cfg.edge_dropout_p)
        else:
            a_src, a_dst = src[:ne], dst[:ne]
        na = len(a_src)
        edge_src_aug[o:o + na] = a_src
        edge_dst_aug[o:o + na] = a_dst
        edge_weight_aug[o:o + na] = 1.0

    return CodeBatch(
        input_ids=input_ids, attention_mask=attention_mask,
        node_ids=node_ids, node_mask=node_mask,
        edge_src=edge_src, edge_dst=edge_dst, edge_weight=edge_weight,
        edge_src_aug=edge_src_aug, edge_dst_aug=edge_dst_aug,
        edge_weight_aug=edge_weight_aug,
        code_indices=code_indices,
    )


def epoch_batches(
    dataset: MedCodeDataset,
    *,
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
    augment: bool = True,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[CodeBatch]:
    """Shuffled epoch iterator (DistributedSampler-equivalent: deterministic
    per (seed, epoch) permutation, train_MedTok.py:115-121, drop_last=True
    at :129).

    Multi-host (``process_count > 1``): ``batch_size`` stays the GLOBAL batch;
    every process walks the same permutation and yields its contiguous
    1/process_count block of each global batch (the rank-shard contract of
    utils/distributed.py:20-58 + DistributedSampler — torch interleaves
    indices[rank::world] while this uses contiguous blocks, which makes the
    multi-host global batch bitwise-equal to the single-host dp-sharded one).
    Padded shapes are computed from the GLOBAL batch so all processes compile
    and run the same program. Edge-dropout seeds fold in the process index
    (per-rank seeds, train_MedTok.py:43).
    """
    n = len(dataset)
    assert batch_size % process_count == 0, (
        f"global batch {batch_size} not divisible by {process_count} processes"
    )
    local_bs = batch_size // process_count
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    for bi, start in enumerate(range(0, stop, batch_size)):
        idxs = order[start:start + batch_size]
        aug_seed = (
            ((seed + 1) * 1_000_003 + epoch * 65_537 + bi) * process_count
            + process_index
        ) if augment else None
        if process_count == 1:
            yield dataset.make_batch([int(i) for i in idxs], aug_seed=aug_seed)
        else:
            shapes = dataset.batch_shapes([int(i) for i in idxs])
            local = idxs[process_index * local_bs:(process_index + 1) * local_bs]
            yield dataset.make_batch(
                [int(i) for i in local], aug_seed=aug_seed, force_shapes=shapes
            )
