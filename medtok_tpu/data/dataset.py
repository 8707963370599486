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


# At-or-above this padded node count, make_batch_compact switches to the
# STREAM edge encoding (uint16 dst + per-node out-degrees, 2 B/edge): the
# big buckets' padded edge buffers dominate the export sweep's h2d bytes.
STREAM_MIN_NODES = 128


def _pick_bucket(buckets: Sequence[int], needed: int) -> int:
    for b in buckets:
        if needed <= b:
            return b
    return buckets[-1]


#: cumulative seconds inside the native text encode / the arena insert
#: (diagnostics; read+reset by bench.py)
TOK_STATS = {"encode_s": 0.0, "store_s": 0.0}


class _TextStore:
    """Tokenized-description store: one flat growable arena + per-row
    (start, len) vectors.

    The previous dict-of-arrays layout cost ~150+ bytes of python/numpy
    object overhead per description — ~100 MB of object churn across the
    600K-code vocabulary. On the VM class this runs on, fresh pages fault
    at single-digit MB/s (hypervisor lazy-restore), so allocation volume IS
    wall time: the arena stores ids as int16 when the vocab fits (bert-base
    does) and touches ~13 MB total instead. ``get`` returns zero-copy views.
    """

    def __init__(self, n: int, vocab_size: int):
        self.start = np.full(n, -1, np.int64)
        self.length = np.zeros(n, np.int32)
        self.dtype = np.int16 if vocab_size < 32768 else np.int32
        self.arena = np.empty(1 << 16, self.dtype)
        self.tail = 0

    def __contains__(self, i: int) -> bool:
        return bool(self.start[i] >= 0)

    def missing(self, rows: np.ndarray) -> np.ndarray:
        return rows[self.start[rows] < 0]

    def get(self, i: int) -> np.ndarray:
        s = self.start[i]
        return self.arena[s:s + self.length[i]]

    def _reserve(self, extra: int) -> None:
        need = self.tail + extra
        if need > len(self.arena):
            arena = np.empty(max(need, 2 * len(self.arena)), self.dtype)
            arena[: self.tail] = self.arena[: self.tail]
            self.arena = arena

    def put_flat(self, rows: np.ndarray, out: np.ndarray,
                 lens: np.ndarray) -> None:
        """Bulk insert from a [n, max_len] id matrix + per-row counts (the
        native encode_batch_flat layout) — one boolean-mask extraction, no
        per-row python."""
        total = int(lens.sum())
        self._reserve(total)
        cols = np.arange(out.shape[1])
        # row-major boolean extraction == rows concatenated in order
        flat = out[cols[None, :] < lens[:, None]]
        self.arena[self.tail:self.tail + total] = flat
        starts = np.empty(len(lens), np.int64)
        starts[0] = self.tail
        np.cumsum(lens[:-1], out=starts[1:])
        starts[1:] += self.tail
        self.start[rows] = starts
        self.length[rows] = lens
        self.tail += total

    def put_one(self, i: int, ids: np.ndarray) -> None:
        self._reserve(len(ids))
        self.arena[self.tail:self.tail + len(ids)] = ids
        self.start[i] = self.tail
        self.length[i] = len(ids)
        self.tail += len(ids)


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
        self._text = _TextStore(len(self.df), len(tokenizer.vocab))
        self._descs: np.ndarray | None = None  # desc column, cached once
        self._graph_cache: dict[int, tuple] = {}
        self._node_arena: np.ndarray | None = None        # warm_cache()
        self._node_arena_off: np.ndarray | None = None
        self._code_index: dict[str, int] | None = None  # lookup()
        # tokenized-description cache file (the reference pickles
        # med_code_descriptions.pkl once, dataset_creator.py:213-229)
        self._cache_file = (
            Path(cache_dir) / "med_code_descriptions.npz"
            if cache_dir is not None else None
        )
        if self._cache_file is not None and self._cache_file.exists():
            z = np.load(self._cache_file)
            # the astype below must not narrow: a cache written under a
            # larger tokenizer vocab (int32 arena) would silently wrap ids
            # > 32767 negative in an int16 store — re-tokenize instead
            fits = (z["arena"].size == 0
                    or int(z["arena"].max()) <= np.iinfo(self._text.dtype).max)
            if len(z["start"]) == len(self.df) and fits:
                self._text.start = z["start"]
                self._text.length = z["length"]
                self._text.arena = z["arena"].astype(self._text.dtype)
                self._text.tail = len(z["arena"])
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
        """Bulk-materialize the per-code node-list arena (single dataframe
        pass) and optionally tokenize every description — the host half of
        the full-vocab export sweep.

        Touch-minimal (this VM class faults fresh pages at MB/s rates, so
        allocation volume IS wall time): ONE int32 arena written directly by
        np.concatenate, a vectorized sortedness check, and per-row sorts only
        for rows that actually violate order — the per-row python-loop
        version cost ~10-25 s at vocab scale."""
        values = self.df["pkg_index_list"].to_numpy()
        n = len(values)
        lens = np.fromiter((len(v) for v in values), np.int64, n)
        off = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        total = int(off[-1])
        arena = (np.concatenate(values, dtype=np.int32, casting="unsafe")
                 if total else np.zeros(0, np.int32))
        if total > 1:
            bad = arena[1:] < arena[:-1]
            bidx = off[1:-1] - 1        # row boundaries don't count
            # off==total when every trailing row is empty -> bidx==total-1,
            # past the end of `bad` (length total-1); such a boundary has no
            # successor pair to clear.
            bad[bidx[(bidx >= 0) & (bidx < total - 1)]] = False
            if bad.any():
                rows = np.unique(
                    np.searchsorted(off, np.where(bad)[0] + 1, "right") - 1
                )
                for i in rows:
                    arena[off[i]:off[i + 1]].sort()
        self._node_arena_off = off
        self._node_arena = arena
        if tokenize:
            self.tokenize_rows(range(len(self.df)))

    def tokenize_rows(self, rows) -> None:
        """Tokenize (and cache) the descriptions of ``rows`` — the host half
        of the export sweep, shardable so tokenization of shard i+1 overlaps
        the device compute of shard i (async dispatch)."""
        enc = self._encoder
        max_len = self.cfg.max_text_length
        rows = np.asarray(rows, np.int64)
        missing = self._text.missing(rows)
        if missing.size == 0:
            return
        if self._descs is None:
            self._descs = self.df["desc"].to_numpy()
        descs = self._descs
        texts = [str(descs[i]) for i in missing]
        if hasattr(enc, "encode_batch_flat"):
            # C++ bulk path (GIL released), matrix+lens out -> one
            # vectorized arena insert
            import time

            t0 = time.perf_counter()
            out, lens = enc.encode_batch_flat(texts, max_length=max_len)
            t1 = time.perf_counter()
            self._text.put_flat(missing, out, lens)
            TOK_STATS["encode_s"] += t1 - t0
            TOK_STATS["store_s"] += time.perf_counter() - t1
        elif hasattr(enc, "encode_batch"):
            for i, ids in zip(missing, enc.encode_batch(texts, max_length=max_len)):
                self._text.put_one(int(i), ids)
        else:
            for i, t in zip(missing, texts):
                self._text.put_one(int(i), enc.encode(t, max_length=max_len)[0])

    def save_text_cache(self) -> None:
        """Persist the tokenized descriptions (call after a full pass)."""
        if self._cache_file is None:
            return
        self._cache_file.parent.mkdir(parents=True, exist_ok=True)
        t = self._text
        np.savez(self._cache_file, start=t.start, length=t.length,
                 arena=t.arena[: t.tail])

    def text_lengths(self, lo: int, hi: int) -> np.ndarray:
        """Token counts of rows [lo, hi) — vectorized from the text store
        (rows must be tokenized already)."""
        return self._text.length[lo:hi].astype(np.int64)

    def node_counts(self, lo: int, hi: int) -> np.ndarray:
        """Subgraph node counts of rows [lo, hi) — vectorized from the
        warm-cache arena offsets."""
        o = self._node_arena_off
        return o[lo + 1:hi + 1] - o[lo:hi]

    def edge_counts(self, lo: int, hi: int, *, ln: int) -> np.ndarray | None:
        """Induced-edge counts of rows [lo, hi) at node cap ``ln`` (native;
        None when the native library or arena is unavailable)."""
        if self.native is None or self._node_arena is None:
            return None
        return self.native.count_edges(
            self._node_arena, self._node_arena_off, lo, hi, ln=ln
        )

    def node_list(self, idx: int) -> np.ndarray:
        if self._node_arena_off is not None:
            o = self._node_arena_off
            return self._node_arena[o[idx]:o[idx + 1]]
        return np.sort(np.asarray(list(self.df.iloc[idx]["pkg_index_list"]), np.int64))

    def pack_text_rows(self, indices, *, row_len: int, num_rows: int):
        """Pack the (already-tokenized) descriptions of ``indices`` into
        fixed [num_rows, row_len] BERT rows straight from the text-store
        arena — the host half of the packed export step with zero per-code
        python (data/packing.py::pack_store_meta). Returns
        (input_ids [R, P] int32, flat_base [B] int32, lens [B] int32)."""
        from medtok_tpu.data.packing import pack_store_meta

        t = self._text
        return pack_store_meta(
            t.arena, t.start, t.length, np.asarray(indices, np.int64),
            row_len=row_len, num_rows=num_rows,
        )

    def text_ids(self, idx: int) -> np.ndarray:
        if idx not in self._text:
            ids, _ = self._encoder.encode(
                str(self.df.iloc[idx]["desc"]), max_length=self.cfg.max_text_length
            )
            self._text.put_one(idx, ids)
        return self._text.get(idx)

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
        want_text: bool = True,
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
            # pass the caller's force_shapes through UNCHANGED: pinning the
            # precomputed (Lt, Ln, Epg) here would truncate edge-overflowing
            # graphs where the native path grows the edge bucket (classic
            # make_batch semantics) — fallback and native must pack alike.
            classic = self.make_batch(indices, aug_seed=aug_seed,
                                      force_shapes=force_shapes)
            ln_c = classic.node_ids.shape[1]
            epg_c = classic.edge_weight.size // max(len(indices), 1)
            return _compress_classic(classic, ln_c, epg_c,
                                     want_aug=aug_seed is not None,
                                     want_text=want_text)

        p = self.cfg.edge_dropout_p if aug_seed is not None else 0.0
        want_aug = aug_seed is not None
        # big node buckets use the STREAM edge encoding (uint16 dst + per-
        # node out-degrees, 2 B/edge): their padded edge buffers dominate
        # the h2d bytes of the export sweep. The choice is a pure function
        # of Ln, so jit program shapes stay stable across calls.
        stream = Ln >= STREAM_MIN_NODES

        def arena(self=self):
            if self._node_arena is None:
                # temp mini-arena so the idx entry points serve the
                # no-warm-cache path too (same output, same dtype)
                nodes = [np.asarray(self.node_list(int(i)), np.int32)
                         for i in indices]
                off = np.zeros(len(nodes) + 1, np.int64)
                np.cumsum([len(x) for x in nodes], out=off[1:])
                data = (np.concatenate(nodes) if off[-1]
                        else np.zeros(0, np.int32))
                return data, off, np.arange(len(nodes), dtype=np.int64)
            return (self._node_arena, self._node_arena_off,
                    np.asarray(indices, np.int64))

        def pack(epg):
            if stream:
                data, off, idx_a = arena()
                return self.native.pack_batch_stream_idx(
                    data, off, idx_a, ln=Ln, epg=epg,
                    dropout_p=p, seed=aug_seed or 0, want_aug=want_aug,
                )
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
        if want_text:
            texts = [self.text_ids(int(i)) for i in indices]
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
        else:
            # quantizer-tail consumers (bench packed sweep, export packed
            # path) never read the text fields — tokenize_from_hidden takes
            # text as packed hidden states. [B, 0] keeps the pytree static
            # and ships zero bytes.
            input_ids = np.zeros((B, 0), np.int32)
            attention_mask = np.zeros((B, 0), np.int32)
        if self._node_arena_off is not None:
            o = self._node_arena_off
            idx_a = np.asarray(indices, np.int64)
            nn = np.minimum(o[idx_a + 1] - o[idx_a], Ln).astype(np.int32)
        else:
            nn = np.minimum(
                np.fromiter((len(self.node_list(int(i))) for i in indices),
                            np.int64, B), Ln,
            ).astype(np.int32)
        return CompactCodeBatch(
            input_ids=input_ids, attention_mask=attention_mask,
            node_ids=packed["node_ids"], nn=nn,
            edge_packed=packed["edge_packed"], ne=packed["ne"],
            edge_packed_aug=packed["edge_packed_aug"],
            ne_aug=packed["ne_aug"],
            code_indices=np.asarray(indices, np.int32),
            outdeg=packed.get("outdeg"),
            outdeg_aug=packed.get("outdeg_aug"),
        ), entry

    def __getitem__(self, idx: int) -> CodeSample:
        row = self.df.iloc[idx]
        if idx not in self._graph_cache:
            nodes = np.sort(np.asarray(list(row["pkg_index_list"]), np.int64))
            src, dst, rel = self.kg.induced_subgraph(nodes)
            self._graph_cache[idx] = (nodes, src, dst, rel)
        nodes, src, dst, rel = self._graph_cache[idx]
        return CodeSample(
            index=idx, med_code=str(row["med_code"]),
            input_ids=np.asarray(self.text_ids(idx), np.int32),
            nodes=nodes, edge_src=src, edge_dst=dst, rel=rel,
        )


class _NoopFence:
    """Fence holder for the no-pool fallback path (API parity)."""

    def set_fence(self, x) -> None:  # noqa: D102
        pass


def _compress_classic(classic, ln: int, epg: int, *, want_aug: bool,
                      want_text: bool = True):
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
        input_ids=(classic.input_ids if want_text
                   else np.zeros((B, 0), np.int32)),
        attention_mask=(classic.attention_mask if want_text
                        else np.zeros((B, 0), np.int32)),
        node_ids=classic.node_ids,
        nn=np.asarray(classic.node_mask, np.int32).sum(axis=1,
                                                       dtype=np.int32),
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
