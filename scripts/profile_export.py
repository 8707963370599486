"""Profile the export sweep: capture a jax.profiler trace of a few packed
steps + host/device occupancy numbers (VERDICT round-1 item 8).

    python scripts/profile_export.py [--codes 20000] [--trace-dir /tmp/medtok_trace]

Prints a JSON summary (host pack time vs device step time per step — the
overlap headroom) and writes an XProf/TensorBoard trace directory.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--codes", type=int, default=20000)
    p.add_argument("--trace-dir", type=str, default="/tmp/medtok_trace")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--trace", dest="no_trace", action="store_false",
                   default=True,
                   help="capture a jax.profiler device trace (works on real "
                        "hardware; the axon remote-compile tunnel rejects "
                        "instrumented executables with HTTP 413, so timing-"
                        "only is the default here)")
    args = p.parse_args()

    import os

    os.environ["MEDTOK_BENCH_CODES"] = str(args.codes)
    import bench  # noqa: E402  (repo-root module)
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from medtok_tpu.config import ModelConfig
    from medtok_tpu.data.packing import pack_texts, take_group
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.utils.profiling import StepTimer, annotate, trace

    bench.N_CODES = args.codes
    dataset = bench.setup_dataset("/tmp/medtok_bench_prof")
    model = MultimodalTokenizer(ModelConfig())

    R, P, LMAX, C = 256, 128, 64, 2048
    rng = np.random.default_rng(0)
    from medtok_tpu.data.synthetic import random_code_batch

    dummy = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=C, text_len=16, max_nodes=16, max_edges_per_graph=32,
        text_vocab=model.cfg.text.vocab_size,
        num_kg_nodes=model.cfg.graph.num_nodes,
    ))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=False,
    )
    params, usage = variables["params"], variables["usage"]

    # params/usage are explicit jit ARGUMENTS — closing over device arrays
    # would embed all 110M weights as program constants (gigantic
    # executables; the remote-compile tunnel rejects them outright)
    @jax.jit
    def bert_step(params, ids, seg, pos):
        pm = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0)
        return model.apply({"params": params}, ids, pm, pos,
                           method=MultimodalTokenizer.encode_text_packed)

    @jax.jit
    def quant_step(params, usage, flat, gidx, tmask, batch):
        out = model.apply({"params": params, "usage": usage},
                          flat, gidx, tmask, batch,
                          method=MultimodalTokenizer.tokenize_from_hidden)
        return jnp.sum(out.embedding)

    dataset.warm_cache(tokenize=True)
    texts = [dataset.text_ids(i) for i in range(len(dataset))]
    lens = np.fromiter((len(t) for t in texts), np.int64)
    order = np.argsort(lens, kind="stable")

    host_t, dev_timer = [], StepTimer()
    i, step_no = 0, 0
    traced = False
    while i < len(order) and step_no < args.steps + 1:
        j = take_group(lens, order, i, row_len=P, num_rows=R, max_codes=C)
        group = order[i:j]
        i = j
        th0 = time.perf_counter()
        pad = np.repeat(group[-1:], C - len(group))
        idxs = np.concatenate([group, pad])
        pk = pack_texts([texts[int(g)] for g in group], row_len=P,
                        num_rows=R, lmax=LMAX)
        gi = np.concatenate(
            [pk.gather_idx, np.repeat(pk.gather_idx[-1:], C - len(group), 0)]
        )
        tm = np.concatenate(
            [pk.text_mask, np.repeat(pk.text_mask[-1:], C - len(group), 0)]
        )
        batch = dataset.make_batch([int(x) for x in idxs], aug_seed=None)
        host_dt = time.perf_counter() - th0

        if step_no == 1 and not traced and not args.no_trace:
            # device tracing re-ships instrumented executables; the axon
            # remote-compile tunnel rejects the larger payload (HTTP 413) —
            # fall back to timing-only on that failure (real hardware
            # profiles fine)
            try:
                jax.profiler.start_trace(args.trace_dir)
                traced = True
            except Exception as e:
                print(f"trace unavailable: {e}", file=sys.stderr)
        dev_timer.start()
        try:
            with annotate(f"packed_step_{step_no}"):
                flat = bert_step(params, jnp.asarray(pk.input_ids),
                                 jnp.asarray(pk.seg_ids),
                                 jnp.asarray(pk.pos_ids))
                s = quant_step(params, usage, flat, jnp.asarray(gi),
                               jnp.asarray(tm), batch)
        except Exception:
            if not traced:
                raise
            jax.profiler.stop_trace()
            traced = False
            print("profiled executable rejected by the compile tunnel; "
                  "continuing timing-only", file=sys.stderr)
            with annotate(f"packed_step_{step_no}"):
                flat = bert_step(params, jnp.asarray(pk.input_ids),
                                 jnp.asarray(pk.seg_ids),
                                 jnp.asarray(pk.pos_ids))
                s = quant_step(params, usage, flat, jnp.asarray(gi),
                               jnp.asarray(tm), batch)
        dev_timer.stop(sync_on=s)
        if step_no > 0:
            host_t.append(host_dt)
        step_no += 1
    if traced:
        jax.profiler.stop_trace()

    summary = {
        "traced": traced,
        "device_step": dev_timer.summary(),
        "host_pack_s_mean": float(np.mean(host_t)) if host_t else None,
        "host_share_of_device": (
            round(float(np.mean(host_t)) / float(np.mean(dev_timer._times[1:])), 3)
            if host_t and len(dev_timer._times) > 1 else None
        ),
        "trace_dir": args.trace_dir,
        "steps": step_no,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
