"""A/B the stream-edge src reconstruction (data/compact.py::_expand).

Per-shape bench attribution (BENCH r4) showed nb512/nb128 fused steps at
142-473 ms where the same quantizer shape measures ~45 ms with plain
edge arrays — the difference is the compact STREAM decode:
``vmap(searchsorted(cum, e_iota))`` lowers to log2(Ln) rounds of dynamic
gathers over B*epg elements, which serialize badly on TPU.

Candidates (all exact):
  searchsorted  current production
  cmp_reduce    src_e = sum_j 1[cum_j <= e]: broadcast compare + reduce
                over Ln — fuses in XLA (reduction over a virtual
                [B, epg, Ln]), no gathers
  scatter_cumsum mark boundaries with a scatter-add at cum[j], then
                cumsum along epg

Prints one JSON line with ms per variant and exactness checks.
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
    rng = np.random.default_rng(3)
    # realistic: ~60% fill, outdegrees summing to ne per graph
    ne = rng.integers(Epg // 2, Epg, B).astype(np.int32)
    od = np.zeros((B, Ln), np.int32)
    for b in range(B):
        # random composition of ne[b] over Ln nodes
        cuts = np.sort(rng.integers(0, ne[b] + 1, Ln - 1))
        od[b] = np.diff(np.concatenate([[0], cuts, [ne[b]]]))
    od_d = jnp.asarray(od)
    ne_d = jnp.asarray(ne)

    e_iota_np = np.arange(Epg, dtype=np.int32)

    def ref_src() -> np.ndarray:
        cum = np.cumsum(od, axis=1)
        src = np.stack([
            np.searchsorted(cum[b], e_iota_np, side="right") for b in range(B)
        ]).astype(np.int32)
        src = np.where(e_iota_np[None, :] < ne[:, None], src, 0)
        return np.minimum(src, Ln - 1)

    gold = ref_src()

    @jax.jit
    def searchsorted_v(od, ne):
        cum = jnp.cumsum(od.astype(jnp.int32), axis=1)
        e_iota = jnp.arange(Epg, dtype=jnp.int32)
        src = jax.vmap(
            lambda c: jnp.searchsorted(c, e_iota, side="right")
        )(cum).astype(jnp.int32)
        src = jnp.where(e_iota[None, :] < ne[:, None], src, 0)
        return jnp.minimum(src, Ln - 1)

    @jax.jit
    def cmp_reduce(od, ne):
        cum = jnp.cumsum(od.astype(jnp.int32), axis=1)  # [B, Ln] inclusive
        e_iota = jnp.arange(Epg, dtype=jnp.int32)
        # src_e = #{j : cum_j <= e} — reduce over Ln; XLA fuses the virtual
        # [B, epg, Ln] compare into the reduction (chunk epg to bound it)
        chunk = max(min(Epg, (1 << 24) // max(Ln, 1)), 1)
        while Epg % chunk:
            chunk -= 1
        outs = []
        for c0 in range(0, Epg, chunk):
            e = e_iota[c0:c0 + chunk]
            outs.append(
                jnp.sum(
                    (cum[:, None, :] <= e[None, :, None]),
                    axis=-1, dtype=jnp.int32,
                )
            )
        src = jnp.concatenate(outs, axis=1)
        src = jnp.where(e_iota[None, :] < ne[:, None], src, 0)
        return jnp.minimum(src, Ln - 1)

    @jax.jit
    def scatter_cumsum(od, ne):
        cum = jnp.cumsum(od.astype(jnp.int32), axis=1)
        # mark[b, cum_j] += 1 for each j; cum_j == Epg (a full bucket) must
        # NOT wrap or clip into the last slot — drop it
        mark = jnp.zeros((B, Epg), jnp.int32)
        mark = jax.vmap(lambda m, i: m.at[i].add(1, mode="drop"))(mark, cum)
        src = jnp.cumsum(mark, axis=1)
        e_iota = jnp.arange(Epg, dtype=jnp.int32)
        src = jnp.where(e_iota[None, :] < ne[:, None], src, 0)
        return jnp.minimum(src, Ln - 1)

    variants = {
        "searchsorted": searchsorted_v,
        "cmp_reduce": cmp_reduce,
        "scatter_cumsum": scatter_cumsum,
    }

    out = {"shape": f"B={B} Ln={Ln} Epg={Epg}"}
    for name, fn in variants.items():
        got = np.asarray(fn(od_d, ne_d))
        out[f"{name}_exact"] = bool((got == gold).all())

        @jax.jit
        def step(carry, od, ne, fn=fn):
            return carry + jnp.sum(fn(od, ne)).astype(jnp.float32)

        float(step(jnp.zeros(()), od_d, ne_d))
        best = []
        for t in range(4):
            carry = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(args.reps):
                carry = step(carry, od_d, ne_d)
            float(carry)
            if t:
                best.append((time.perf_counter() - t0) / args.reps)
        out[f"{name}_ms"] = round(1e3 * min(best), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
