"""AOT memory validation for the 8B QA finetune step on a (dp=1, tp=8) mesh.

Compiles QAFinetuner._step_impl at the reference finetune shape —
Llama-3.1-8B, B=16, L=512 (/root/reference/MedTok_QA_Tutorial/
MedTok_fintune_llama3.py:82-87, 200-251) — WITHOUT materializing any
parameters (jax.eval_shape + ShapeDtypeStruct shardings), and reports
per-device memory from compiled.memory_analysis(). The per-device total
(params + peak temps) must fit a 16 GB v5e chip.

Usage: python scripts/qa_8b_memory.py [--tp 8] [--batch 16] [--seq 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--mode", choices=("raw", "serial"), default="serial",
                    help="raw: one full-model CPU AOT compile (scheduler-"
                         "pessimistic); serial: measured 1/2-layer compiles "
                         "composed over a serial TPU schedule")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.tp}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.mode == "serial":
        out = serial_schedule_estimate(tp=args.tp, batch=args.batch,
                                       seq=args.seq)
    else:
        out = report_8b_memory(
            tp=args.tp, batch=args.batch, seq=args.seq,
            remat=not args.no_remat,
        )
    print(json.dumps(out, indent=2))


def report_8b_memory(
    *, tp: int = 8, batch: int = 16, seq: int = 512, remat: bool = True,
    table_rows: int = 1024, num_layers: int | None = None, devices=None,
) -> dict:
    """Compile the 8B finetune step AOT on a (1, tp) mesh; return per-device
    memory stats in bytes. Importable by tests (which assert the v5e fit)."""
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from medtok_tpu.parallel.mesh import make_mesh
    from medtok_tpu.qa.finetune import QAFinetuneConfig, QAFinetuner
    from medtok_tpu.qa.llama import LLAMA31_8B
    from medtok_tpu.qa.sharding import llama_param_spec

    cfg8b = dataclasses.replace(
        LLAMA31_8B, remat=remat,
        **({"num_layers": num_layers} if num_layers else {}),
    )
    # small embedding table: its size is orthogonal to the 8B question (the
    # production 600Kx256 fp32 table adds a replicated 614 MB, noted below)
    table = np.zeros((table_rows, 256), np.float32)
    qcfg = QAFinetuneConfig(
        lora_rank=16, cutoff_len=256, total_len=seq, batch_size=batch,
        mesh_dp=1, mesh_tp=tp,
    )
    ft = QAFinetuner(cfg8b, table, qcfg, devices=devices)
    mesh = ft.mesh if ft.mesh is not None else make_mesh(dp=1, tp=tp,
                                                         devices=devices)

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    llm_shapes = jax.eval_shape(
        lambda r: ft.model.init({"params": r}, dummy)["params"], rng
    )
    sp_shapes = jax.eval_shape(
        lambda r: ft.soft_prompt.init(
            {"params": r}, dummy, jnp.ones((1, 8), jnp.int32), None,
            lambda ids: jnp.zeros(ids.shape + (cfg8b.hidden_size,),
                                  jnp.float32),
            qcfg.total_len,
        )["params"], jax.random.fold_in(rng, 1),
    )
    param_shapes = {"llm": llm_shapes, "soft_prompt": sp_shapes}
    mask = ft.trainable_mask(param_shapes)

    def annotate(path, leaf, m):
        """Frozen base: bf16 + TP layout. Trainable (LoRA/projector): fp32
        replicated (the production loading convention, convert_hf_llama
        dtype=bf16)."""
        is_llm = path and getattr(path[0], "key", None) == "llm"
        if m:
            spec = P()
            dtype = leaf.dtype
        else:
            spec = llama_param_spec(path[1:]) if is_llm else P()
            dtype = jnp.bfloat16 if is_llm else leaf.dtype
        return jax.ShapeDtypeStruct(
            leaf.shape, dtype, sharding=NamedSharding(mesh, spec)
        )

    annotated = jax.tree_util.tree_map_with_path(annotate, param_shapes, mask)
    train_s, frozen_s = ft.split_params(annotated)
    opt_s = jax.eval_shape(ft.tx.init, train_s)
    repl = NamedSharding(mesh, P())
    opt_s = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=repl), opt_s
    )
    L = qcfg.total_len
    bsh = NamedSharding(mesh, P("dp"))
    batch_s = {
        "input_ids": jax.ShapeDtypeStruct((batch, L), jnp.int32, sharding=bsh),
        "attention_mask": jax.ShapeDtypeStruct((batch, L), jnp.int32, sharding=bsh),
        "labels": jax.ShapeDtypeStruct(
            (batch, L - qcfg.cutoff_len), jnp.int32, sharding=bsh
        ),
    }

    t0 = time.time()
    compiled = ft._step.lower(train_s, frozen_s, opt_s, batch_s).compile()
    ma = compiled.memory_analysis()
    per_dev_total = (
        ma.argument_size_in_bytes + ma.temp_size_in_bytes
        + ma.output_size_in_bytes - ma.alias_size_in_bytes
    )
    return {
        "config": "llama-3.1-8b", "tp": tp, "batch": batch, "seq": seq,
        "remat": remat,
        "num_layers": cfg8b.num_layers,
        "argument_bytes_per_device": int(ma.argument_size_in_bytes),
        "temp_bytes_per_device": int(ma.temp_size_in_bytes),
        "output_bytes_per_device": int(ma.output_size_in_bytes),
        "alias_bytes_per_device": int(ma.alias_size_in_bytes),
        "peak_memory_bytes_per_device": int(ma.peak_memory_in_bytes),
        "total_bytes_per_device": int(per_dev_total),
        "total_gib_per_device": round(per_dev_total / 2**30, 3),
        "v5e_hbm_gib": 16.0,
        "fits_v5e": bool(per_dev_total < 16 * 2**30),
        "note": (
            "production 600Kx256 fp32 soft-prompt table adds a replicated "
            "0.57 GiB on top (shardable over tp if ever tight)"
        ),
        "compile_s": round(time.time() - t0, 1),
    }


def serial_schedule_estimate(
    *, tp: int = 8, batch: int = 16, seq: int = 512, num_layers: int = 32,
) -> dict:
    """v5e-fit estimate for the FULL model from small AOT compiles.

    XLA:CPU's buffer assignment uses a concurrency-oriented schedule that
    keeps every layer's transients live simultaneously (measured: per-layer
    temps are identical with remat on/off, because liveness — not
    rematerialisation — is what its scheduler ignores). A TPU executes the
    layer chain serially, so the faithful composition is:

        args (bf16 params, tp-sharded)
      + temps(1-layer program)            # CE block + one layer working set
      + (num_layers - 1) * per_layer_state

    where per_layer_state is what remat actually saves per layer — the
    [B, L, H] bf16 layer input (everything else is recomputed in the bwd
    sweep). Both AOT inputs are MEASURED (1- and 2-layer compiles), only the
    serial-schedule composition is analytic.
    """
    r1 = report_8b_memory(tp=tp, batch=batch, seq=seq, remat=True,
                          num_layers=1)
    r2 = report_8b_memory(tp=tp, batch=batch, seq=seq, remat=True,
                          num_layers=2)
    from medtok_tpu.qa.llama import LLAMA31_8B

    hidden = LLAMA31_8B.hidden_size
    saved_per_layer = batch * seq * hidden * 2          # bf16 layer input
    # full-model args = 1-layer args + (L-1) * per-layer params
    layer_args = r2["argument_bytes_per_device"] - r1["argument_bytes_per_device"]
    args_full = r1["argument_bytes_per_device"] + (num_layers - 1) * layer_args
    est = (
        args_full
        + r1["temp_bytes_per_device"]
        + (num_layers - 1) * saved_per_layer
    )
    return {
        "config": "llama-3.1-8b", "tp": tp, "batch": batch, "seq": seq,
        "num_layers": num_layers,
        "measured_args_1layer_bytes": r1["argument_bytes_per_device"],
        "measured_temp_1layer_bytes": r1["temp_bytes_per_device"],
        "measured_temp_2layer_bytes": r2["temp_bytes_per_device"],
        "cpu_scheduler_per_layer_bytes": (
            r2["temp_bytes_per_device"] - r1["temp_bytes_per_device"]
        ),
        "saved_per_layer_bytes": saved_per_layer,
        "args_full_bytes_per_device": int(args_full),
        "serial_estimate_bytes_per_device": int(est),
        "serial_estimate_gib_per_device": round(est / 2**30, 3),
        "v5e_hbm_gib": 16.0,
        "fits_v5e": bool(est < 16 * 2**30),
    }


if __name__ == "__main__":
    main()
