"""Sequence packing for the text-encoder sweep.

Code descriptions are ~8–30 WordPiece tokens; even with fine length buckets
the BERT batch carries padding, and at L=8..32 the attention matmuls are far
below MXU tile size. Packing concatenates many descriptions into fixed
128-token rows with a block-diagonal attention mask and within-segment
position ids — numerically identical per-description hidden states (each
segment sees exactly its own tokens at positions 0..len-1), zero padding
waste, and MXU-shaped 128x128 attention.

Host side (this module): greedy sequential fill of length-sorted token
lists into rows, plus the gather map that pulls each description's hidden
states back out into the standard per-code [B, Lmax] layout consumed by the
quantizer's cross-attention.

Device side: models/bert.py accepts pairwise [R, P, P] masks + position
ids; models/tokenizer_model.MultimodalTokenizer.tokenize_packed runs the
packed text encoder and the regular graph/VQ eval tail.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class PackedText(NamedTuple):
    """R = rows, P = row length, B = number of packed descriptions."""

    input_ids: np.ndarray   # [R, P] int32 (0 where empty)
    seg_ids: np.ndarray     # [R, P] int32: 0 = empty, else 1 + code slot
    pos_ids: np.ndarray     # [R, P] int32 within-segment positions
    gather_idx: np.ndarray  # [B, Lmax] int32 flat indices into [R*P] rows
    text_mask: np.ndarray   # [B, Lmax] bool, True = real token


def pack_texts(
    id_lists: list[np.ndarray],
    *,
    row_len: int = 128,
    num_rows: int | None = None,
    lmax: int | None = None,
) -> PackedText:
    """Greedy sequential fill (callers feed length-sorted lists, so rows
    fill near-perfectly). A description longer than ``row_len`` is not
    supported (callers bucket texts to <= 64 tokens).

    ``num_rows``/``lmax`` pad the outputs to static shapes for XLA; defaults
    are the tight values.
    """
    B = len(id_lists)
    lens = [len(t) for t in id_lists]
    if max(lens, default=0) > row_len:
        raise ValueError(f"description longer than row_len={row_len}")
    if lmax is None:
        lmax = max(lens, default=1)

    rows: list[list[np.ndarray]] = [[]]
    starts = np.zeros(B, np.int64)
    row_of = np.zeros(B, np.int64)
    fill = 0
    for b, toks in enumerate(id_lists):
        n = len(toks)
        if fill + n > row_len:
            rows.append([])
            fill = 0
        row_of[b] = len(rows) - 1
        starts[b] = fill
        rows[-1].append(toks)
        fill += n

    R = num_rows if num_rows is not None else len(rows)
    if len(rows) > R:
        raise ValueError(f"packing needs {len(rows)} rows > num_rows={R}")
    input_ids = np.zeros((R, row_len), np.int32)
    seg_ids = np.zeros((R, row_len), np.int32)
    pos_ids = np.zeros((R, row_len), np.int32)
    for b, toks in enumerate(id_lists):
        r, s, n = int(row_of[b]), int(starts[b]), len(toks)
        input_ids[r, s:s + n] = toks
        seg_ids[r, s:s + n] = b + 1
        pos_ids[r, s:s + n] = np.arange(n)

    flat_base = row_of * row_len + starts              # [B]
    offs = np.arange(lmax)[None, :]
    gather_idx = (flat_base[:, None] + offs).astype(np.int32)
    text_mask = offs < np.asarray(lens)[:, None]
    gather_idx = np.where(text_mask, gather_idx, 0)
    return PackedText(input_ids, seg_ids, pos_ids, gather_idx, text_mask)


def pack_texts_meta(
    id_lists: list[np.ndarray],
    *,
    row_len: int = 128,
    num_rows: int | None = None,
):
    """Transfer-optimized variant of :func:`pack_texts`: returns only what
    must physically cross the wire — the packed token rows plus the per-code
    ``flat_base``/``lens`` vectors. The derived [R, P] ``seg_ids``/
    ``pos_ids`` and [B, lmax] ``gather_idx``/``text_mask`` arrays (~0.4 MB +
    ~1 MB per step at production shapes, and a per-code python fill loop on
    the host) are instead rebuilt ON DEVICE from the two tiny vectors
    (data/compact.py::derive_packed_meta) — bit-identical, tested.

    Returns (input_ids [R, P] int32, flat_base [B] int32, lens [B] int32).
    The row fill is vectorized: one concatenate + one flat scatter instead
    of B slice assignments.
    """
    B = len(id_lists)
    lens = np.fromiter((len(t) for t in id_lists), np.int64, B)
    if B and lens.max(initial=0) > row_len:
        raise ValueError(f"description longer than row_len={row_len}")

    # greedy sequential row assignment (same walk as pack_texts)
    flat_base = np.zeros(B, np.int64)
    row = 0
    fill = 0
    for b in range(B):
        n = int(lens[b])
        if fill + n > row_len:
            row += 1
            fill = 0
        flat_base[b] = row * row_len + fill
        fill += n

    R = num_rows if num_rows is not None else row + 1
    if row + 1 > R:
        raise ValueError(f"packing needs {row + 1} rows > num_rows={R}")
    input_ids = np.zeros(R * row_len, np.int32)
    if B:
        total = int(lens.sum())
        # position of token t within its code: t - cumstart[code_of[t]]
        cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
        code_of = np.repeat(np.arange(B), lens)
        within = np.arange(total) - cum[code_of]
        input_ids[flat_base[code_of] + within] = np.concatenate(id_lists)
    return (
        input_ids.reshape(R, row_len),
        flat_base.astype(np.int32),
        lens.astype(np.int32),
    )


def pack_store_meta(
    arena: np.ndarray,
    start: np.ndarray,
    length: np.ndarray,
    rows_idx: np.ndarray,
    *,
    row_len: int = 128,
    num_rows: int | None = None,
):
    """Store-direct :func:`pack_texts_meta`: packs descriptions straight out
    of a ``_TextStore``-style (arena, start, length) triple without ever
    materializing per-code token arrays.

    Same greedy sequential fill and identical outputs to ``pack_texts_meta``
    (tested side by side), but the per-item python walk is replaced by one
    ``searchsorted`` per ROW (~256 iterations instead of ~1500 at production
    group shapes) and the B small-array concatenate by a single fancy-index
    gather from the arena. At 600K-code export scale the host was spending
    ~2 s building python lists of arena views plus ~2 s in the per-item
    loop; this path removes both (the host half of VERDICT r4 item 3).

    Returns (input_ids [R, P] int32, flat_base [B] int32, lens [B] int32).
    """
    rows_idx = np.asarray(rows_idx, np.int64)
    B = len(rows_idx)
    lens = length[rows_idx].astype(np.int64)
    if B and lens.max(initial=0) > row_len:
        raise ValueError(f"description longer than row_len={row_len}")
    cum = np.zeros(B + 1, np.int64)
    np.cumsum(lens, out=cum[1:])

    # greedy fill: items i..j-1 share a row where cum[j]-cum[i] <= row_len,
    # j maximal ('right' also sweeps trailing zero-length items into the
    # current row, matching the sequential walk)
    flat_base = np.empty(B, np.int64)
    i = 0
    row = 0
    while i < B:
        j = int(np.searchsorted(cum, cum[i] + row_len, side="right")) - 1
        flat_base[i:j] = row * row_len + (cum[i:j] - cum[i])
        row += 1
        i = j
    R = num_rows if num_rows is not None else row
    if row > R:
        raise ValueError(f"packing needs {row} rows > num_rows={R}")

    input_ids = np.zeros(R * row_len, np.int32)
    if B:
        total = int(cum[-1])
        code_of = np.repeat(np.arange(B), lens)
        within = np.arange(total) - cum[code_of]
        src = start[rows_idx][code_of] + within
        input_ids[flat_base[code_of] + within] = arena[src]
    return (
        input_ids.reshape(R, row_len),
        flat_base.astype(np.int32),
        lens.astype(np.int32),
    )


def pack_code_batch(
    input_ids: np.ndarray,        # [B, Lt] padded WordPiece ids
    attention_mask: np.ndarray,   # [B, Lt] 1 = real token
    *,
    shards: int = 1,
    rows_per_shard: int,
    row_len: int = 128,
    lmax: int | None = None,
):
    """Pack a TRAINING batch's texts for the packed text-encoder path.

    Shuffled batches can't be length-sorted (collate pads them to the
    longest bucket), so packing recovers the ~3x token waste. Under dp
    sharding each contiguous B/shards chunk packs into its own
    [rows_per_shard, row_len] block with SHARD-LOCAL gather indices —
    inside shard_map every device gathers from its own rows.

    Returns a numpy PackedTextBatch; raises ValueError if a shard overflows
    its row budget (caller falls back or raises with sizing advice).
    """
    from medtok_tpu.data.types import PackedTextBatch

    B, Lt = input_ids.shape
    if B % shards != 0:
        # not a bare assert: stripped under -O, and a silently non-dividing
        # batch would drop trailing codes from the packed layout
        raise ValueError(f"batch {B} not divisible by shards={shards}")
    bs = B // shards
    if lmax is None:
        lmax = Lt
    lens = np.asarray(attention_mask, np.int64).sum(axis=1)
    ids_list, segs, poss, gathers, masks = [], [], [], [], []
    for s in range(shards):
        lists = [
            np.asarray(input_ids[b, : lens[b]], np.int32)
            for b in range(s * bs, (s + 1) * bs)
        ]
        p = pack_texts(lists, row_len=row_len, num_rows=rows_per_shard,
                       lmax=lmax)
        ids_list.append(p.input_ids)
        segs.append(p.seg_ids)
        poss.append(p.pos_ids)
        gathers.append(p.gather_idx)      # local to this shard's rows
        masks.append(p.text_mask)
    return PackedTextBatch(
        input_ids=np.concatenate(ids_list),
        seg_ids=np.concatenate(segs),
        pos_ids=np.concatenate(poss),
        gather_idx=np.concatenate(gathers),
        text_mask=np.concatenate(masks),
    )


def take_group(
    lens: np.ndarray, order: np.ndarray, start: int,
    *, row_len: int, num_rows: int, max_codes: int,
) -> int:
    """End index (into ``order``) of the largest group starting at ``start``
    whose texts fit ``num_rows`` rows of ``row_len`` under greedy sequential
    fill. Shared by bench.py and export.export_all(packed=True)."""
    rows_used, fill, j = 1, 0, start
    while j < len(order) and j - start < max_codes:
        n = int(lens[order[j]])
        if fill + n > row_len:
            if rows_used == num_rows:
                break
            rows_used, fill = rows_used + 1, 0
        fill += n
        j += 1
    return j


def pairwise_mask(seg_ids: np.ndarray) -> np.ndarray:
    """[R, P] segment ids -> [R, P, P] block-diagonal bool mask."""
    same = seg_ids[:, :, None] == seg_ids[:, None, :]
    real = seg_ids[:, :, None] > 0
    return same & real & (seg_ids[:, None, :] > 0)
