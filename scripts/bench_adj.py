"""A/B the dense-adjacency Count build variants on the real chip.

The Ln=512 tail step is dominated by gcn_norm_adj (43 of 56 ms,
scripts/profile_tail.py): the bf16 one-hot einsum materializes ~8.6 GB of
one-hots in HBM per step. Candidates:

  bf16_chunked   current production path (models/layers.py::gcn_norm_adj)
  int8           int8 one-hots, int32 MXU accumulation (exact for the
                 pipeline's binary weights; half the bytes, 2x MXU rate)
  pallas         fused kernel: one-hots generated IN VMEM from the index
                 chunks, never touching HBM; fp32 accumulation

All three must agree exactly with a numpy histogram ground truth.

Usage: python scripts/bench_adj.py [--b 512] [--ln 512] [--epg 8192]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--ln", type=int, default=512)
    ap.add_argument("--epg", type=int, default=8192)
    ap.add_argument("--variants", default="bf16_chunked,int8,pallas")
    args = ap.parse_args()
    B, Ln, Epg = args.b, args.ln, args.epg

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from medtok_tpu.models.layers import gcn_norm_adj

    rng = np.random.default_rng(3)
    # realistic: ~60% of the edge bucket used, rest zero-weight padding
    ne = rng.integers(Epg // 2, Epg, B)
    src = np.zeros((B, Epg), np.int32)
    dst = np.zeros((B, Epg), np.int32)
    w = np.zeros((B, Epg), np.float32)
    for b in range(B):
        src[b, : ne[b]] = rng.integers(0, Ln, ne[b])
        dst[b, : ne[b]] = rng.integers(0, Ln, ne[b])
        w[b, : ne[b]] = 1.0
    es, ed, ew = (
        jnp.asarray(src.reshape(-1)),
        jnp.asarray(dst.reshape(-1)),
        jnp.asarray(w.reshape(-1)),
    )

    # ground truth count (numpy histogram)
    truth = np.zeros((B, Ln, Ln), np.float32)
    for b in range(B):
        np.add.at(truth[b], (dst[b, : ne[b]], src[b, : ne[b]]), 1.0)

    def check_adj(a):
        deg = 1.0 + truth.sum(axis=2)
        dinv = 1.0 / np.sqrt(deg)
        ref = dinv[:, :, None] * dinv[:, None, :] * truth
        ref += np.eye(Ln, dtype=np.float32)[None] * (dinv * dinv)[:, :, None]
        err = np.abs(np.asarray(a, np.float32) - ref).max()
        return float(err)

    # ---- variant: current production ----
    prod = jax.jit(
        lambda s, d, wt: gcn_norm_adj(s, d, wt, B, Ln, dtype=jnp.float32)
    )

    # ---- variant: int8 one-hot count ----
    def int8_count(s, d, wt):
        sg = s.reshape(B, Epg)
        dg = d.reshape(B, Epg)
        wg = wt.reshape(B, Epg)
        iota = jnp.arange(Ln, dtype=s.dtype)
        cap = (1 << 30) // max(B * Ln, 1)
        chunk = max(min(Epg, cap), 1)
        while Epg % chunk:
            chunk -= 1
        count = jnp.zeros((B, Ln, Ln), jnp.int32)
        for c0 in range(0, Epg, chunk):
            s_oh = (sg[:, c0 : c0 + chunk, None] == iota).astype(jnp.int8)
            d_oh = (
                (dg[:, c0 : c0 + chunk, None] == iota)
                & (wg[:, c0 : c0 + chunk, None] > 0)
            ).astype(jnp.int8)
            count = count + jax.lax.dot_general(
                d_oh, s_oh,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
        countf = count.astype(jnp.float32)
        deg = 1.0 + countf.sum(axis=2)
        dinv = jax.lax.rsqrt(deg)
        adj = dinv[:, :, None] * dinv[:, None, :] * countf
        eye = (iota[:, None] == iota[None, :]).astype(jnp.float32)
        return adj + eye[None] * (dinv * dinv)[:, :, None]

    int8_fn = jax.jit(int8_count)

    # ---- variant: pallas fused one-hot count ----
    # Edge indices go in as [B*Epg, 1] so each edge sits on its own SUBLANE
    # row: the one-hot [TE, Ln] is then a lane-broadcast compare against an
    # iota — no cross-lane relayout anywhere. Count accumulates in VMEM
    # ([Ln, Ln] fp32, revisited across the edge-chunk grid axis); all-padding
    # chunks (edges are front-packed per graph) skip the MXU dot entirely.
    TE = min(2048, Epg)
    while Epg % TE:
        TE //= 2
    ECH = Epg // TE

    def count_kernel(s_ref, d_ref, w_ref, out_ref):
        e = pl.program_id(1)

        @pl.when(e == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        w = w_ref[:]                    # [TE, 1] fp32
        nonempty = jnp.any(w != 0.0)

        @pl.when(nonempty)
        def _():
            iota = jax.lax.broadcasted_iota(jnp.int32, (TE, Ln), 1)
            s_oh = (s_ref[:] == iota).astype(jnp.bfloat16)
            d_oh = (d_ref[:] == iota).astype(jnp.bfloat16) * w.astype(
                jnp.bfloat16
            )
            out_ref[0] += jax.lax.dot_general(
                d_oh, s_oh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @jax.jit
    def pallas_count(s, d, wt):
        s2 = s.reshape(B * Epg, 1)
        d2 = d.reshape(B * Epg, 1)
        w2 = wt.reshape(B * Epg, 1)
        count = pl.pallas_call(
            count_kernel,
            grid=(B, ECH),
            in_specs=[
                pl.BlockSpec((TE, 1), lambda b, e: (b * ECH + e, 0)),
                pl.BlockSpec((TE, 1), lambda b, e: (b * ECH + e, 0)),
                pl.BlockSpec((TE, 1), lambda b, e: (b * ECH + e, 0)),
            ],
            out_specs=pl.BlockSpec((1, Ln, Ln), lambda b, e: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Ln, Ln), jnp.float32),
        )(s2, d2, w2)
        deg = 1.0 + count.sum(axis=2)
        dinv = jax.lax.rsqrt(deg)
        adj = dinv[:, :, None] * dinv[:, None, :] * count
        iota = jnp.arange(Ln)
        eye = (iota[:, None] == iota[None, :]).astype(jnp.float32)
        return adj + eye[None] * (dinv * dinv)[:, :, None]

    # ---- variant: pallas, lane-major one-hots (the VQ kernel's proven
    # orientation): edges on LANES, node index on SUBLANES, dot as A @ B^T.
    # Block of 8 graphs (sublane-divisibility), python-unrolled per graph.
    GB = 8
    TE2 = min(2048, Epg)
    while Epg % TE2:
        TE2 //= 2
    ECH2 = Epg // TE2

    def count_kernel_lane(s_ref, d_ref, w_ref, out_ref):
        e = pl.program_id(1)

        @pl.when(e == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        iota_i = jax.lax.broadcasted_iota(jnp.int32, (Ln, TE2), 0)
        for g in range(GB):
            w = w_ref[g][None, :]                       # [1, TE2]
            s_ohT = (s_ref[g][None, :] == iota_i).astype(jnp.bfloat16)
            d_ohT = (d_ref[g][None, :] == iota_i).astype(
                jnp.bfloat16
            ) * w.astype(jnp.bfloat16)
            out_ref[g] += jax.lax.dot_general(
                d_ohT, s_ohT, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @jax.jit
    def pallas_lane(s, d, wt):
        sg = s.reshape(B, Epg)
        dg = d.reshape(B, Epg)
        wg = wt.reshape(B, Epg)
        count = pl.pallas_call(
            count_kernel_lane,
            grid=(B // GB, ECH2),
            in_specs=[
                pl.BlockSpec((GB, TE2), lambda b, e: (b, e)),
                pl.BlockSpec((GB, TE2), lambda b, e: (b, e)),
                pl.BlockSpec((GB, TE2), lambda b, e: (b, e)),
            ],
            out_specs=pl.BlockSpec((GB, Ln, Ln), lambda b, e: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Ln, Ln), jnp.float32),
        )(sg, dg, wg)
        deg = 1.0 + count.sum(axis=2)
        dinv = jax.lax.rsqrt(deg)
        adj = dinv[:, :, None] * dinv[:, None, :] * count
        iota = jnp.arange(Ln)
        eye = (iota[:, None] == iota[None, :]).astype(jnp.float32)
        return adj + eye[None] * (dinv * dinv)[:, :, None]

    def bench(fn, name, out):
        try:
            a = fn(es, ed, ew)
            a.block_until_ready()
            err = check_adj(np.asarray(a))
            times = []
            for t in range(4):
                t0 = time.perf_counter()
                float(jnp.sum(fn(es, ed, ew)))
                if t:
                    times.append(time.perf_counter() - t0)
            out[name] = {"ms": round(1e3 * min(times), 2), "max_err": err}
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}

    out = {"shape": f"B={B} Ln={Ln} Epg={Epg}"}
    wanted = set(args.variants.split(","))
    for name, fn in (("bf16_chunked", prod), ("int8", int8_fn),
                     ("pallas", pallas_count), ("pallas_lane", pallas_lane)):
        if name in wanted:
            bench(fn, name, out)
            print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
