"""A/B the VQ distance+top-k backends on the real chip (VERDICT r3 item 4).

Times xla / grouped / two_pass / pallas at the production sweep shapes,
plus the bare fp32 distance matmul (isolates the top-k share), interleaving
trials in one process (shared-pool variance) and discarding trial 0.
Exactness: grouped must match xla indices bitwise; two_pass is checked for
set-match (its bf16 candidate scan is empirically-validated, not proven).

Prints one JSON object; merge the numbers into PERF.md via the bench table.
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
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--shapes", default="8192x21000,8192x84000")
    ap.add_argument("--groups", default="512,1024,2048")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from medtok_tpu.ops import vq

    D, K = 64, 5
    out = {"backend_sweep": {}}

    for shape in args.shapes.split(","):
        B, N = map(int, shape.split("x"))
        rng = np.random.default_rng(0)
        z = vq.l2_normalize(jnp.asarray(
            rng.normal(size=(B, D)).astype(np.float32)))
        e = vq.l2_normalize(jnp.asarray(
            rng.normal(size=(N, D)).astype(np.float32)))
        z, e = jax.device_put(z), jax.device_put(e)

        fns = {
            "matmul_only": jax.jit(lambda z, e: jnp.sum(
                vq.squared_distance(z, e))),
            "xla": jax.jit(lambda z, e: vq.distance_topk(
                z, e, K, backend="xla")),
            "grouped": jax.jit(lambda z, e: vq.distance_topk(
                z, e, K, backend="grouped")),
            "two_pass": jax.jit(lambda z, e: vq.distance_topk(
                z, e, K, backend="two_pass")),
        }
        if jax.default_backend() == "tpu":  # compiled kernels only
            fns["pallas"] = jax.jit(lambda z, e: vq.distance_topk(
                z, e, K, backend="pallas"))
        for g in map(int, args.groups.split(",")):
            fns[f"grouped_g{g}"] = jax.jit(
                lambda z, e, g=g: vq.topk_smallest_grouped(
                    vq.squared_distance(z, e), K, group=g))

        results = {}
        for name, fn in fns.items():
            results[name] = fn(z, e)  # compile
        jax.block_until_ready(results)

        # exactness
        ref_idx = np.asarray(results["xla"][1])
        exact = {}
        for name in ("grouped", "two_pass", "pallas"):
            if name not in results:
                continue
            idx = np.asarray(results[name][1])
            exact[name] = bool((idx == ref_idx).all())
            exact[name + "_set"] = bool(
                (np.sort(idx, 1) == np.sort(ref_idx, 1)).all())
        for g in map(int, args.groups.split(",")):
            idx = np.asarray(results[f"grouped_g{g}"][1])
            exact[f"grouped_g{g}"] = bool((idx == ref_idx).all())

        # interleaved AMORTIZED timing: R async dispatches per sample, one
        # fetch at the end — a per-call scalar fetch costs ~60 ms through
        # the tunnel and swamps sub-100ms kernels (first A/B attempt showed
        # matmul_only == xla == fetch latency)
        R = 20
        times: dict[str, list[float]] = {n: [] for n in fns}
        for trial in range(args.trials):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                for _ in range(R):
                    r = fn(z, e)
                leaf = r if isinstance(r, jax.Array) else r[0]
                float(jnp.sum(leaf))  # force the whole queue
                if trial:
                    times[name].append((time.perf_counter() - t0) / R)

        out["backend_sweep"][shape] = {
            "ms": {n: round(1e3 * min(ts), 2) for n, ts in times.items()},
            "exact_vs_xla": exact,
        }
        print(json.dumps({shape: out["backend_sweep"][shape]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
