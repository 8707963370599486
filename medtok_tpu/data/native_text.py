"""ctypes binding for the native WordPiece tokenizer (csrc/wordpiece.cpp).

NativeWordPiece wraps a WordPieceTokenizer vocabulary: ASCII texts encode in
C++ (the 600K-description sweep's hot path); any text the native side
rejects (non-ASCII) transparently falls back to the Python implementation,
so results are always identical to data.text.WordPieceTokenizer.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from medtok_tpu.data.text import WordPieceTokenizer

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libmedtok_wordpiece.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = _CSRC / "wordpiece.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", str(src), "-o", str(_LIB_PATH)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.medtok_wp_build.restype = ctypes.c_void_p
    lib.medtok_wp_build.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.medtok_wp_free.argtypes = [ctypes.c_void_p]
    lib.medtok_wp_encode.restype = ctypes.c_int64
    lib.medtok_wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.medtok_wp_encode_batch.restype = ctypes.c_int64
    lib.medtok_wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def native_text_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


class NativeWordPiece:
    """Drop-in encode() accelerator over a WordPieceTokenizer vocab."""

    def __init__(self, tokenizer: WordPieceTokenizer):
        self.py = tokenizer
        lib = _load()
        # id -> token, rebuilt as a '\n'-joined blob in id order
        inv = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
        blob = "\n".join(tok for tok, _ in inv).encode("utf-8")
        self._lib = lib
        self._handle = lib.medtok_wp_build(blob, len(blob))
        # persistent grow-only output buffers: a 600K x 64 int32 out matrix
        # is ~150 MB — glibc caps M_MMAP_THRESHOLD at 32 MB, so big numpy
        # temps always mmap/munmap and re-fault every page on this
        # slow-fault VM class (~19 s per full-vocab encode was the buffer,
        # not the tokenizer)
        self._out = np.empty(0, np.int32)
        self._lens = np.empty(0, np.int64)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.medtok_wp_free(self._handle)
            self._handle = None

    def encode(
        self, text: str, *, max_length: int = 512, pad_to_max: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return self.py.encode(text, max_length=max_length, pad_to_max=pad_to_max)
        out = np.empty(max_length, np.int32)
        n = self._lib.medtok_wp_encode(
            self._handle, raw, len(raw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_length,
        )
        if n < 0:  # native rejected -> python fallback
            return self.py.encode(text, max_length=max_length, pad_to_max=pad_to_max)
        ids = out[:n].copy()
        mask = np.ones(n, np.int32)
        if pad_to_max:
            pad = max_length - n
            ids = np.concatenate([ids, np.full(pad, self.py.pad_id, np.int32)])
            mask = np.concatenate([mask, np.zeros(pad, np.int32)])
        return ids, mask

    def encode_batch_flat(
        self, texts: list[str], *, max_length: int = 512, num_threads: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """Multithreaded bulk encode (the 600K-description sweep's host hot
        spot) returning the raw (ids [n, max_length] int32, lens [n]) matrix
        — no per-text array objects (600K tiny arrays cost ~100 MB of object
        churn, and this VM class faults fresh pages at MB/s rates). ctypes
        releases the GIL for the whole batch; the C++ thread pool splits
        texts into dynamic chunks. Non-ASCII texts are re-encoded in place
        via the Python fallback — output is identical to per-text encode()."""
        n = len(texts)
        if n == 0:
            return np.zeros((0, max_length), np.int32), np.zeros(0, np.int64)
        raws: list[bytes] = []
        for t in texts:
            try:
                raws.append(t.encode("ascii"))
            except UnicodeEncodeError:
                raws.append(b"\xff")  # forces a native reject -> fallback
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(r) for r in raws], out=offsets[1:])
        blob = b"".join(raws)
        if self._out.size < n * max_length:
            self._out = np.empty(
                max(n * max_length, 2 * self._out.size), np.int32)
        if self._lens.size < n:
            self._lens = np.empty(max(n, 2 * self._lens.size), np.int64)
        # NOTE: views into persistent buffers — valid until the next call
        out = self._out[: n * max_length].reshape(n, max_length)
        lens = self._lens[:n]
        rejects = self._lib.medtok_wp_encode_batch(
            self._handle, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_length, num_threads,
        )
        if rejects:
            for i in np.where(lens < 0)[0]:
                ids = self.py.encode(texts[i], max_length=max_length)[0]
                out[i, : len(ids)] = ids
                lens[i] = len(ids)
        return out, lens

    def encode_batch(
        self, texts: list[str], *, max_length: int = 512, num_threads: int = 0
    ) -> list[np.ndarray]:
        """Bulk encode as a list of per-text id arrays (compat surface over
        encode_batch_flat)."""
        out, lens = self.encode_batch_flat(
            texts, max_length=max_length, num_threads=num_threads
        )
        return [out[i, : lens[i]].copy() for i in range(len(texts))]

    # delegate the token-id surface the dataset uses
    @property
    def pad_id(self) -> int:
        return self.py.pad_id

    @property
    def vocab(self) -> dict:
        return self.py.vocab
