"""ctypes bindings for the native graph runtime (csrc/medtok_graph.cpp).

Builds the shared library on demand with g++ (no pybind11 in this image) and
exposes NativeGraph: CSR build, induced subgraphs, and one-call batch packing
into the CodeBatch graph layout. Falls back transparently to the numpy path
(kg.py / dataset.py) when no compiler is available — callers check
``native_available()``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libmedtok_graph.so"
_lib = None


def _build() -> Path:
    src = _CSRC / "medtok_graph.cpp"
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
        return _LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         "-pthread", str(src), "-o", str(_LIB_PATH)],
        check=True, capture_output=True,
    )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_build()))
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.medtok_graph_build.restype = ctypes.c_void_p
    lib.medtok_graph_build.argtypes = [i64p, i64p, i32p, ctypes.c_int64, ctypes.c_int64]
    lib.medtok_graph_free.argtypes = [ctypes.c_void_p]
    lib.medtok_graph_subgraph.restype = ctypes.c_int64
    lib.medtok_graph_subgraph.argtypes = [
        ctypes.c_void_p, i64p, ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int64
    ]
    lib.medtok_graph_pack_batch.restype = ctypes.c_int64
    lib.medtok_graph_pack_batch.argtypes = [
        ctypes.c_void_p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
        i32p, u8p, i32p, i32p, f32p, i32p, i32p, f32p,
    ]
    lib.medtok_graph_pack_compact.restype = ctypes.c_int64
    lib.medtok_graph_pack_compact.argtypes = [
        ctypes.c_void_p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
        i32p, u8p, i32p, i32p, i32p, i32p,
    ]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.medtok_graph_pack_compact_idx16.restype = ctypes.c_int64
    lib.medtok_graph_pack_compact_idx16.argtypes = [
        ctypes.c_void_p, i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
        i32p, u8p, u16p, i32p, u16p, i32p,
    ]
    lib.medtok_graph_pack_compact16.restype = ctypes.c_int64
    lib.medtok_graph_pack_compact16.argtypes = [
        ctypes.c_void_p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
        i32p, u8p, u16p, i32p, u16p, i32p,
    ]
    lib.medtok_graph_pack_stream_idx.restype = ctypes.c_int64
    lib.medtok_graph_pack_stream_idx.argtypes = [
        ctypes.c_void_p, i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
        i32p, u8p, u16p, u16p, i32p, u16p, u16p, i32p,
    ]
    lib.medtok_graph_count_edges.restype = None
    lib.medtok_graph_count_edges.argtypes = [
        ctypes.c_void_p, i32p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, i32p,
    ]
    lib.medtok_graph_pack_compact_idx.restype = ctypes.c_int64
    lib.medtok_graph_pack_compact_idx.argtypes = [
        ctypes.c_void_p, i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_uint64,
        i32p, u8p, i32p, i32p, i32p, i32p,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


#: cumulative seconds spent blocked on transfer fences / in the native pack
#: call (diagnostics; read+reset by bench.py to attribute host-phase time)
STATS = {"fence_wait_s": 0.0, "pack_s": 0.0}


class _PoolEntry:
    """One reusable compact-batch buffer set.

    Output buffers are allocated ONCE per (B, ln, epg, aug) shape and reused
    round-robin: on this VM, fresh multi-MB numpy allocations every step
    page-fault at seconds-per-call rates (the previous step's buffers are
    pinned by in-flight device transfers, so numpy cannot recycle them) —
    measured 3.3 s/call at the 512x512x8192 tail shape vs 60 ms with warm
    pages. ``fence`` holds anything with .block_until_ready() (e.g. a
    transferred jax array); it is awaited before the entry's buffers are
    overwritten, so async h2d transfers can never read a recycled buffer.
    """

    __slots__ = ("bufs", "fence")

    def __init__(self, bufs: dict):
        self.bufs = bufs
        self.fence = None

    def set_fence(self, x) -> None:
        """``x``: a jax array or a list/tuple of them. Fence on the DEVICE
        COPIES of the entry's buffers (``jax.device_put`` results) — then
        recycling waits only for the h2d transfer, not the consuming step's
        compute; fencing on a step OUTPUT is safe but over-waits by the
        whole device step (measured 27 s of false host 'pack' time on the
        600K sweep)."""
        self.fence = x

    def wait(self) -> None:
        if self.fence is not None:
            import time

            t0 = time.perf_counter()
            for f in (self.fence if isinstance(self.fence, (list, tuple))
                      else (self.fence,)):
                f.block_until_ready()
            STATS["fence_wait_s"] += time.perf_counter() - t0
            self.fence = None


class NativeGraph:
    """CSR graph with native induced-subgraph extraction + batch packing."""

    POOL_DEPTH = 4

    def __init__(self, edge_src: np.ndarray, edge_dst: np.ndarray,
                 rel: np.ndarray, num_nodes: int):
        lib = _load()
        src = np.ascontiguousarray(edge_src, np.int64)
        dst = np.ascontiguousarray(edge_dst, np.int64)
        rel = np.ascontiguousarray(rel, np.int32)
        self._lib = lib
        self._handle = lib.medtok_graph_build(
            _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
            _ptr(rel, ctypes.c_int32), len(src), num_nodes,
        )
        self.num_nodes = num_nodes
        self._pools: dict[tuple, list[_PoolEntry]] = {}
        self._pool_next: dict[tuple, int] = {}

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.medtok_graph_free(self._handle)
            self._handle = None

    def induced_subgraph(self, nodes: np.ndarray, max_edges: int = 1 << 20):
        nodes = np.ascontiguousarray(np.sort(np.asarray(nodes, np.int64)))
        src = np.empty(max_edges, np.int32)
        dst = np.empty(max_edges, np.int32)
        rel = np.empty(max_edges, np.int32)
        total = self._lib.medtok_graph_subgraph(
            self._handle, _ptr(nodes, ctypes.c_int64), len(nodes),
            _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
            _ptr(rel, ctypes.c_int32), max_edges,
        )
        n = min(total, max_edges)
        return src[:n].copy(), dst[:n].copy(), rel[:n].copy()

    def pack_batch(
        self,
        node_lists: list[np.ndarray],
        *,
        ln: int,
        epg: int,
        dropout_p: float = 0.0,
        seed: int = 0,
    ) -> dict[str, np.ndarray]:
        """Pack B sorted node lists into the CodeBatch graph arrays."""
        B = len(node_lists)
        node_off = np.zeros(B + 1, np.int64)
        for i, nl in enumerate(node_lists):
            node_off[i + 1] = node_off[i] + len(nl)
        node_data = (
            np.concatenate([np.asarray(n, np.int64) for n in node_lists])
            if node_off[-1] > 0 else np.zeros(0, np.int64)
        )
        node_data = np.ascontiguousarray(node_data)

        node_ids = np.empty(B * ln, np.int32)
        node_mask = np.empty(B * ln, np.uint8)
        e = B * epg
        edge_src = np.empty(e, np.int32)
        edge_dst = np.empty(e, np.int32)
        edge_weight = np.empty(e, np.float32)
        # With dropout off the augmented copy is bit-identical to the main
        # arrays, so alias them — the C side detects aliased pointers and
        # skips the aug pass (half the output traffic on the eval/export path).
        if dropout_p > 0.0:
            edge_src_aug = np.empty(e, np.int32)
            edge_dst_aug = np.empty(e, np.int32)
            edge_weight_aug = np.empty(e, np.float32)
        else:
            edge_src_aug, edge_dst_aug, edge_weight_aug = (
                edge_src, edge_dst, edge_weight)

        truncated = self._lib.medtok_graph_pack_batch(
            self._handle, _ptr(node_data, ctypes.c_int64),
            _ptr(node_off, ctypes.c_int64), B, ln, epg,
            float(dropout_p), int(seed) & (2**64 - 1),
            _ptr(node_ids, ctypes.c_int32), _ptr(node_mask, ctypes.c_uint8),
            _ptr(edge_src, ctypes.c_int32), _ptr(edge_dst, ctypes.c_int32),
            _ptr(edge_weight, ctypes.c_float),
            _ptr(edge_src_aug, ctypes.c_int32), _ptr(edge_dst_aug, ctypes.c_int32),
            _ptr(edge_weight_aug, ctypes.c_float),
        )
        return {
            "node_ids": node_ids.reshape(B, ln),
            "node_mask": node_mask.reshape(B, ln).astype(bool),
            "edge_src": edge_src,
            "edge_dst": edge_dst,
            "edge_weight": edge_weight,
            "edge_src_aug": edge_src_aug,
            "edge_dst_aug": edge_dst_aug,
            "edge_weight_aug": edge_weight_aug,
            "truncated": int(truncated),
        }

    def _acquire(self, key: tuple, make: "callable") -> _PoolEntry:
        pool = self._pools.get(key)
        if pool is None:
            # allocate AND pre-fault the whole pool up front: on this VM
            # first-touch page faults run at ~8 MB/s (measured 2.2 s for one
            # 17 MB tail-shape entry), and the first pool use happens in the
            # untimed precompile phase — paying all POOL_DEPTH entries there
            # keeps the timed sweep at the ~37 ms warm-page pack cost.
            # Depth is size-aware: deeper pools on small shapes let the host
            # run further ahead of the device (the backlog is what hides
            # host tokenize/pack phases under device compute); huge tail
            # shapes stay shallow to bound the pre-fault + memory cost.
            import os

            probe = make()
            entry_bytes = sum(a.nbytes for a in probe.values())
            cap = int(os.environ.get("MEDTOK_POOL_DEPTH_CAP", 32))
            depth = int(min(
                max(self.POOL_DEPTH, (32 << 20) // max(entry_bytes, 1)),
                cap,
            ))
            pool = [_PoolEntry(probe)]
            for _ in range(depth - 1):
                pool.append(_PoolEntry(make()))
            for e in pool:
                for arr in e.bufs.values():
                    arr.fill(0)
            self._pools[key] = pool
        i = self._pool_next.get(key, 0)
        self._pool_next[key] = (i + 1) % len(pool)
        entry = pool[i]
        entry.wait()
        return entry

    def pack_batch_compact(
        self,
        node_lists: list[np.ndarray],
        *,
        ln: int,
        epg: int,
        dropout_p: float = 0.0,
        seed: int = 0,
        want_aug: bool = False,
    ) -> tuple[dict[str, np.ndarray], _PoolEntry]:
        """Compact pack into POOLED buffers: edges as (src << 16) | dst plus
        per-graph counts (see csrc/medtok_graph.cpp::medtok_graph_pack_compact).

        Returns (arrays, pool_entry). The caller must call
        ``pool_entry.set_fence(device_array)`` after launching the transfer
        of these arrays — the entry is recycled POOL_DEPTH calls later and
        waits on that fence first.
        """
        if ln > 32768:
            raise ValueError(f"ln={ln} exceeds the 15-bit compact src limit")
        import time

        t0 = time.perf_counter()
        B = len(node_lists)
        node_off = np.zeros(B + 1, np.int64)
        for i, nl in enumerate(node_lists):
            node_off[i + 1] = node_off[i] + len(nl)
        node_data = (
            np.concatenate([np.asarray(n, np.int64) for n in node_lists])
            if node_off[-1] > 0 else np.zeros(0, np.int64)
        )
        node_data = np.ascontiguousarray(node_data)

        u16 = ln <= 256
        edge_dtype = np.uint16 if u16 else np.int32
        key = (B, ln, epg, bool(want_aug), u16)
        entry = self._acquire(
            key, self._compact_bufs(B, ln, B * epg, want_aug, edge_dtype)
        )
        b = entry.bufs
        fn = (self._lib.medtok_graph_pack_compact16 if u16
              else self._lib.medtok_graph_pack_compact)
        ect = ctypes.c_uint16 if u16 else ctypes.c_int32
        truncated = fn(
            self._handle, _ptr(node_data, ctypes.c_int64),
            _ptr(node_off, ctypes.c_int64), B, ln, epg,
            float(dropout_p), int(seed) & (2**64 - 1),
            _ptr(b["node_ids"], ctypes.c_int32),
            _ptr(b["node_mask"], ctypes.c_uint8),
            _ptr(b["edge_packed"], ect),
            _ptr(b["ne"], ctypes.c_int32),
            _ptr(b["edge_packed_aug"], ect),
            _ptr(b["ne_aug"], ctypes.c_int32),
        )
        STATS["pack_s"] += time.perf_counter() - t0
        return self._compact_out(b, truncated, B, ln, want_aug), entry

    @staticmethod
    def _compact_out(b: dict, truncated: int, B: int, ln: int,
                     want_aug: bool) -> dict:
        if truncated < 0:
            raise ValueError(f"ln={ln} rejected by native compact pack")
        return {
            "node_ids": b["node_ids"].reshape(B, ln),
            "node_mask": b["node_mask"].reshape(B, ln),
            "edge_packed": b["edge_packed"],
            "ne": b["ne"],
            "edge_packed_aug": b["edge_packed_aug"] if want_aug else None,
            "ne_aug": b["ne_aug"] if want_aug else None,
            "truncated": int(truncated),
        }

    def _compact_bufs(self, B: int, ln: int, e: int, want_aug: bool,
                      edge_dtype=np.int32):
        def make():
            bufs = {
                "node_ids": np.empty(B * ln, np.int32),
                "node_mask": np.empty(B * ln, np.uint8),
                "edge_packed": np.empty(e, edge_dtype),
                "ne": np.empty(B, np.int32),
            }
            if want_aug:
                bufs["edge_packed_aug"] = np.empty(e, edge_dtype)
                bufs["ne_aug"] = np.empty(B, np.int32)
            else:
                bufs["edge_packed_aug"] = bufs["edge_packed"]
                bufs["ne_aug"] = bufs["ne"]
            return bufs

        return make

    def pack_batch_stream_idx(
        self,
        arena_data: np.ndarray,   # [total] int32 node arena (warm_cache)
        arena_off: np.ndarray,    # [N + 1] int64
        indices: np.ndarray,      # [B] int64 vocab rows to pack
        *,
        ln: int,
        epg: int,
        dropout_p: float = 0.0,
        seed: int = 0,
        want_aug: bool = False,
    ) -> tuple[dict[str, np.ndarray], _PoolEntry]:
        """STREAM-encoded compact pack (big node buckets): uint16 dst stream
        + per-node uint16 out-degrees instead of (src, dst) pairs — 2 B/edge.
        See csrc/medtok_graph.cpp::medtok_graph_pack_stream_idx."""
        if ln > 65536 or epg > 65535:
            raise ValueError(f"stream pack rejects ln={ln}/epg={epg}")
        if arena_data.dtype != np.int32:
            raise TypeError("arena_data must be int32 (warm_cache builds it)")
        B = len(indices)
        idxs = np.ascontiguousarray(indices, np.int64)
        key = (B, ln, epg, bool(want_aug), "stream")
        entry = self._acquire(key, self._stream_bufs(B, ln, B * epg, want_aug))
        b = entry.bufs
        import time

        t0 = time.perf_counter()
        truncated = self._lib.medtok_graph_pack_stream_idx(
            self._handle, _ptr(arena_data, ctypes.c_int32),
            _ptr(arena_off, ctypes.c_int64), _ptr(idxs, ctypes.c_int64),
            B, ln, epg, float(dropout_p), int(seed) & (2**64 - 1),
            _ptr(b["node_ids"], ctypes.c_int32),
            _ptr(b["node_mask"], ctypes.c_uint8),
            _ptr(b["outdeg"], ctypes.c_uint16),
            _ptr(b["edge_packed"], ctypes.c_uint16),
            _ptr(b["ne"], ctypes.c_int32),
            _ptr(b["outdeg_aug"], ctypes.c_uint16),
            _ptr(b["edge_packed_aug"], ctypes.c_uint16),
            _ptr(b["ne_aug"], ctypes.c_int32),
        )
        STATS["pack_s"] += time.perf_counter() - t0
        out = self._compact_out(b, truncated, B, ln, want_aug)
        out["outdeg"] = b["outdeg"].reshape(B, ln)
        out["outdeg_aug"] = b["outdeg_aug"].reshape(B, ln) if want_aug else None
        return out, entry

    def _stream_bufs(self, B: int, ln: int, e: int, want_aug: bool):
        def make():
            bufs = {
                "node_ids": np.empty(B * ln, np.int32),
                "node_mask": np.empty(B * ln, np.uint8),
                "outdeg": np.empty(B * ln, np.uint16),
                "edge_packed": np.empty(e, np.uint16),
                "ne": np.empty(B, np.int32),
            }
            if want_aug:
                bufs["outdeg_aug"] = np.empty(B * ln, np.uint16)
                bufs["edge_packed_aug"] = np.empty(e, np.uint16)
                bufs["ne_aug"] = np.empty(B, np.int32)
            else:
                bufs["outdeg_aug"] = bufs["outdeg"]
                bufs["edge_packed_aug"] = bufs["edge_packed"]
                bufs["ne_aug"] = bufs["ne"]
            return bufs

        return make

    def count_edges(self, arena_data: np.ndarray, arena_off: np.ndarray,
                    lo: int, hi: int, *, ln: int) -> np.ndarray:
        """Induced-edge count per code in rows [lo, hi) of the warm-cache
        arena, with node lists truncated to ``ln`` (what a pack at that ln
        emits). Lets sweeps sub-bucket codes by edge count so padded edge
        buffers ship ~2x fewer h2d bytes."""
        if arena_data.dtype != np.int32:
            raise TypeError("arena_data must be int32 (warm_cache builds it)")
        out = np.empty(hi - lo, np.int32)
        self._lib.medtok_graph_count_edges(
            self._handle, _ptr(arena_data, ctypes.c_int32),
            _ptr(arena_off, ctypes.c_int64), lo, hi, ln,
            _ptr(out, ctypes.c_int32),
        )
        return out

    def pack_batch_compact_idx(
        self,
        arena_data: np.ndarray,   # [total] int32, all node lists concatenated
        arena_off: np.ndarray,    # [N + 1] int64
        indices: np.ndarray,      # [B] int64 vocab rows to pack
        *,
        ln: int,
        epg: int,
        dropout_p: float = 0.0,
        seed: int = 0,
        want_aug: bool = False,
    ) -> tuple[dict[str, np.ndarray], _PoolEntry]:
        """Arena-indexed compact pack: node lists come straight from the
        warm-cache arena — no per-batch python list building or concatenate
        (the remaining per-code python cost of pack_batch_compact at
        C=4096)."""
        if ln > 32768:
            raise ValueError(f"ln={ln} exceeds the 15-bit compact src limit")
        B = len(indices)
        idxs = np.ascontiguousarray(indices, np.int64)
        # uint16 (src << 8) | dst encoding when local indices fit 8 bits —
        # halves the edge bytes the sweep ships over slow h2d links
        u16 = ln <= 256
        edge_dtype = np.uint16 if u16 else np.int32
        key = (B, ln, epg, bool(want_aug), u16)
        entry = self._acquire(
            key, self._compact_bufs(B, ln, B * epg, want_aug, edge_dtype)
        )
        b = entry.bufs
        if arena_data.dtype != np.int32:
            raise TypeError("arena_data must be int32 (warm_cache builds it)")
        import time

        t0 = time.perf_counter()
        fn = (self._lib.medtok_graph_pack_compact_idx16 if u16
              else self._lib.medtok_graph_pack_compact_idx)
        ect = ctypes.c_uint16 if u16 else ctypes.c_int32
        truncated = fn(
            self._handle, _ptr(arena_data, ctypes.c_int32),
            _ptr(arena_off, ctypes.c_int64), _ptr(idxs, ctypes.c_int64),
            B, ln, epg, float(dropout_p), int(seed) & (2**64 - 1),
            _ptr(b["node_ids"], ctypes.c_int32),
            _ptr(b["node_mask"], ctypes.c_uint8),
            _ptr(b["edge_packed"], ect),
            _ptr(b["ne"], ctypes.c_int32),
            _ptr(b["edge_packed_aug"], ect),
            _ptr(b["ne_aug"], ctypes.c_int32),
        )
        STATS["pack_s"] += time.perf_counter() - t0
        return self._compact_out(b, truncated, B, ln, want_aug), entry
