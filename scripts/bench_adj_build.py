"""A/B the dense-adjacency Count build at the Ln=512 tail shape.

gcn_norm_adj's one-hot einsum is the tail step's dominant cost (~38 ms of a
~51 ms Ln=512 step before amortization correction). Candidates:

  bf16     current production: bf16 one-hots, fp32 MXU accumulation
  int8     int8 one-hots, int32 MXU accumulation (v5e int8 peak is 2x bf16;
           0/1 one-hots and binary edge weights are exact in both)
  perlayer no Count at all: per-layer message matmuls Od_w @ (Os @ y)
           (2 thin matmuls per conv layer; fewer FLOPs iff E >> D)

All timed with the amortized chained pattern (R dispatches, one fetch).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import os

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    B, Ln, Epg = args.b, args.ln, args.epg
    E = B * Epg
    rng = np.random.default_rng(7)
    src = rng.integers(0, Ln, E).astype(np.int32)
    dst = rng.integers(0, Ln, E).astype(np.int32)
    w = (rng.random(E) < 0.9).astype(np.float32)  # binary: valid/pad

    src_d = jnp.asarray(src)
    dst_d = jnp.asarray(dst)
    w_d = jnp.asarray(w)

    from medtok_tpu.models.layers import gcn_norm_adj

    @jax.jit
    def bf16_build(s, d, wt):
        return jnp.sum(gcn_norm_adj(s, d, wt, B, Ln))

    def int8_count(s, d, wt):
        sr = s.reshape(B, Epg)
        dr = d.reshape(B, Epg)
        wr = wt.reshape(B, Epg)
        iota = jnp.arange(Ln, dtype=s.dtype)
        cap = (1 << 30) // max(B * Ln, 1)
        chunk = max(min(Epg, cap), 1)
        while Epg % chunk:
            chunk -= 1
        count = jnp.zeros((B, Ln, Ln), jnp.int32)
        for c0 in range(0, Epg, chunk):
            s_oh = (sr[:, c0:c0 + chunk, None] == iota).astype(jnp.int8)
            d_oh = (dr[:, c0:c0 + chunk, None] == iota).astype(jnp.int8)
            d_oh = d_oh * wr[:, c0:c0 + chunk, None].astype(jnp.int8)
            count = count + jnp.einsum(
                "bei,bej->bij", d_oh, s_oh,
                preferred_element_type=jnp.int32,
            )
        return count

    @jax.jit
    def int8_build(s, d, wt):
        count = int8_count(s, d, wt).astype(jnp.float32)
        deg = 1.0 + count.sum(axis=2)
        dinv = jax.lax.rsqrt(deg)
        adj = dinv[:, :, None] * dinv[:, None, :] * count
        iota = jnp.arange(Ln)
        eye = (iota[:, None] == iota[None, :]).astype(jnp.float32)
        adj = adj + eye[None] * (dinv * dinv)[:, :, None]
        return jnp.sum(adj)

    # correctness: int8 count == bf16-built adjacency (compare adj sums and
    # elementwise adj via a small B to keep d2h cheap)
    Bs = 8
    s_s, d_s, w_s = (x[: Bs * Epg] for x in (src_d, dst_d, w_d))
    a_ref = gcn_norm_adj(s_s, d_s, w_s, Bs, Ln)

    def int8_adj_small(s, d, wt):
        sr = s.reshape(Bs, Epg)
        dr = d.reshape(Bs, Epg)
        wr = wt.reshape(Bs, Epg)
        iota = jnp.arange(Ln, dtype=s.dtype)
        s_oh = (sr[:, :, None] == iota).astype(jnp.int8)
        d_oh = (dr[:, :, None] == iota).astype(jnp.int8) * wr[
            :, :, None
        ].astype(jnp.int8)
        count = jnp.einsum(
            "bei,bej->bij", d_oh, s_oh, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        deg = 1.0 + count.sum(axis=2)
        dinv = jax.lax.rsqrt(deg)
        adj = dinv[:, :, None] * dinv[:, None, :] * count
        eye = (iota[:, None] == iota[None, :]).astype(jnp.float32)
        return adj + eye[None] * (dinv * dinv)[:, :, None]

    a_int8 = jax.jit(int8_adj_small)(s_s, d_s, w_s)
    max_err = float(jnp.max(jnp.abs(a_ref - a_int8)))

    def chain(fn, *a, trials=4):
        float(fn(*a))
        best = []
        for t in range(trials):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(*a)
            float(out)
            if t:
                best.append((time.perf_counter() - t0) / args.reps)
        return 1e3 * min(best)

    out = {
        "shape": f"B={B} Ln={Ln} Epg={Epg}",
        "int8_vs_bf16_max_abs_err": max_err,
        "bf16_ms": round(chain(bf16_build, src_d, dst_d, w_d), 2),
        "int8_ms": round(chain(int8_build, src_d, dst_d, w_d), 2),
    }
    out["int8_speedup"] = round(out["bf16_ms"] / out["int8_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
