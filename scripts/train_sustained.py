"""Sustained production-shape training run (VERDICT r3 item 2).

Demonstrates what no bench single-step could: thousands of consecutive
packed train steps at the reference's global batch (1024,
/root/reference/train_MedTok.py:387) on the real chip, with

- loss actually descending and codebook usage climbing from ~0,
- EMA + the codebook-usage FIFO stable under jit,
- checkpoint rotation under way (ckpt_every, max_checkpoints),
- a mid-run SIGKILL + resume whose post-resume metrics are compared
  step-for-step against the uninterrupted run (batches and dropout are both
  deterministic functions of the step index, so a correct restore must
  reproduce the exact trajectory).

Phases (driven by scripts/run_train_sustained.sh or by hand):

  run     — train --steps steps from scratch (or resume from the workdir's
            latest checkpoint), appending metrics to workdir/metrics.jsonl
  compare — diff two metrics.jsonl files over a step range -> resume_equal
  report  — summarize a run directory into docs/TRAIN_SUSTAINED.json, which
            bench.py folds into its output as the `train_sustained` block

The dataset is a fixed synthetic 8K-code vocabulary (heavy variable-length
texts in a 64 bucket, ragged graphs padded to 16 nodes / 32 edges — the
bench train-throughput shape); each step samples B codes and re-rolls the
edge-dropout augmentation with a step-seeded Generator, mirroring an
epoch-shuffled DataLoader while keeping the whole trajectory replayable.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DATASET_SEED = 1234
N_DATASET = 8192
LT = 64            # text bucket
LN = 16            # nodes per graph
EPG = 32           # edges per graph
EDGE_KEEP = 0.9    # aug edge-dropout keep prob (model.edge_dropout default)


def build_dataset(mcfg) -> dict[str, np.ndarray]:
    """Fixed per-code feature pool (one-time cost, deterministic)."""
    rng = np.random.default_rng(DATASET_SEED)
    N = N_DATASET
    ids = np.zeros((N, LT), np.int32)
    am = np.zeros((N, LT), np.int32)
    lens = rng.integers(8, 31, size=N)
    for i, L in enumerate(lens):
        ids[i, :L] = rng.integers(1, mcfg.text.vocab_size, size=L)
        am[i, :L] = 1
    node_counts = rng.integers(1, LN + 1, size=N)
    node_ids = np.zeros((N, LN), np.int32)
    node_mask = np.zeros((N, LN), bool)
    for i, n in enumerate(node_counts):
        node_ids[i, :n] = rng.choice(mcfg.graph.num_nodes, size=n,
                                     replace=False)
        node_mask[i, :n] = True
    edge_src = np.zeros((N, EPG), np.int32)
    edge_dst = np.zeros((N, EPG), np.int32)
    edge_w = np.zeros((N, EPG), np.float32)
    for i, n in enumerate(node_counts):
        ne = int(rng.integers(0, EPG + 1)) if n > 1 else 0
        if ne:
            edge_src[i, :ne] = rng.integers(0, n, size=ne)
            edge_dst[i, :ne] = rng.integers(0, n, size=ne)
            edge_w[i, :ne] = 1.0
    return dict(ids=ids, am=am, node_ids=node_ids, node_mask=node_mask,
                edge_src=edge_src, edge_dst=edge_dst, edge_w=edge_w)


def make_batch(pool: dict, step: int, B: int):
    """Deterministic batch for a given step: sample + re-roll augmentation."""
    from medtok_tpu.data.types import CodeBatch

    rng = np.random.default_rng((DATASET_SEED, step))
    idx = rng.integers(0, N_DATASET, size=B)
    ew = pool["edge_w"][idx]
    keep = (rng.random((B, EPG)) < EDGE_KEEP).astype(np.float32)
    return CodeBatch(
        input_ids=pool["ids"][idx],
        attention_mask=pool["am"][idx],
        node_ids=pool["node_ids"][idx],
        node_mask=pool["node_mask"][idx],
        edge_src=pool["edge_src"][idx].reshape(-1),
        edge_dst=pool["edge_dst"][idx].reshape(-1),
        edge_weight=ew.reshape(-1),
        edge_src_aug=pool["edge_src"][idx].reshape(-1),
        edge_dst_aug=pool["edge_dst"][idx].reshape(-1),
        edge_weight_aug=(ew * keep).reshape(-1),
        code_indices=idx.astype(np.int32),
    )


def cmd_run(args) -> None:
    import os

    import jax

    if os.environ.get("MEDTOK_FORCE_CPU") == "1":
        # axon sitecustomize pins the TPU backend before env vars are read;
        # the config update is the only honored override in plain scripts
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from medtok_tpu.config import MedTokConfig, ModelConfig, TrainConfig
    from medtok_tpu.train.trainer import Trainer

    mcfg = ModelConfig()
    if args.kmeans:
        # completed --kmeans mode (train_MedTok.py:89-92): EMA codebook,
        # kmeans-initialized below, norm-EMA-updated each step — non-grad
        # state carried through checkpoints (models/quantizer.py)
        mcfg = dataclasses.replace(
            mcfg, quantizer=dataclasses.replace(
                mcfg.quantizer, use_kmeans=True,
                codebook_revival=args.revival))
    cfg = MedTokConfig(model=mcfg, train=TrainConfig(
        global_batch_size=args.batch,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        max_checkpoints=args.max_checkpoints,
        packed_text=True,
        mesh_dp=1,
        global_seed=77,
    ))
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    metrics_path = workdir / "metrics.jsonl"
    t_wall = time.time()

    def log_fn(step: int, m: dict) -> None:
        row = {"step": step,
               "loss": float(m["loss"]),
               "usage_shared": float(m["codebook_usage_shared"]),
               "usage_text": float(m["codebook_usage_text"]),
               "usage_graph": float(m["codebook_usage_graph"]),
               "steps_per_sec": round(float(m["steps_per_sec"]), 3)}
        with open(metrics_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"step {step}: loss={row['loss']:.4f} "
              f"usage={row['usage_shared']:.4f} "
              f"{row['steps_per_sec']:.2f} steps/s", flush=True)

    trainer = Trainer(cfg, workdir=str(workdir), log_fn=log_fn)
    pool = build_dataset(mcfg)
    example = make_batch(pool, 0, args.batch)
    state = trainer.init_state(example)   # restores latest ckpt if present
    start = int(jax.device_get(state.step))
    if args.kmeans and start == 0:
        # kmeans codebook init from the first batch's shared features —
        # deterministic, so the resumed leg (start > 0) must NOT redo it:
        # the checkpoint already carries the EMA state
        from medtok_tpu.train.trainer import kmeans_init_codebook

        state = kmeans_init_codebook(trainer.model, state, [example])
        print("kmeans codebook init done", flush=True)
    print(f"starting at step {start} -> {args.steps}", flush=True)

    def batches():
        s = start
        while True:
            yield make_batch(pool, s, args.batch)
            s += 1

    state = trainer.fit(state, batches(), max_steps=args.steps)
    final = int(jax.device_get(state.step))
    print(f"done at step {final} ({time.time() - t_wall:.1f}s wall)",
          flush=True)


def _read_metrics(path: Path) -> dict[int, dict]:
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            rows[r["step"]] = r
    return rows


def cmd_compare(args) -> None:
    a = _read_metrics(Path(args.a) / "metrics.jsonl")
    b = _read_metrics(Path(args.b) / "metrics.jsonl")
    steps = sorted(s for s in a if s in b and s >= args.from_step)
    if not steps:
        print(json.dumps({"resume_equal": False, "compared_steps": 0,
                          "error": "no overlapping steps"}))
        return
    max_rel = 0.0
    for s in steps:
        for k in ("loss", "usage_shared", "usage_text", "usage_graph"):
            va, vb = a[s][k], b[s][k]
            rel = abs(va - vb) / max(abs(va), 1e-12)
            max_rel = max(max_rel, rel)
    out = {"resume_equal": bool(max_rel == 0.0),
           "resume_max_rel_err": max_rel,
           "compared_steps": len(steps),
           "compare_from_step": steps[0], "compare_to_step": steps[-1]}
    print(json.dumps(out))
    Path(args.out).write_text(json.dumps(out)) if args.out else None


def cmd_report(args) -> None:
    rows = sorted(_read_metrics(Path(args.workdir) / "metrics.jsonl").values(),
                  key=lambda r: r["step"])
    first, last = rows[0], rows[-1]
    mid_sps = sorted(r["steps_per_sec"] for r in rows[1:])  # drop warmup row
    report = {
        "steps": last["step"],
        "global_batch": args.batch,
        "loss_first": first["loss"], "loss_final": last["loss"],
        "usage_shared_first": first["usage_shared"],
        "usage_shared_final": last["usage_shared"],
        "usage_text_final": last["usage_text"],
        "usage_graph_final": last["usage_graph"],
        "steps_per_sec_median": mid_sps[len(mid_sps) // 2] if mid_sps else None,
        "codes_per_sec_train": round(
            args.batch * (mid_sps[len(mid_sps) // 2] if mid_sps else 0), 1),
    }
    if args.resume_json and Path(args.resume_json).exists():
        report.update(json.loads(Path(args.resume_json).read_text()))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--workdir", required=True)
    r.add_argument("--steps", type=int, default=2000)
    r.add_argument("--batch", type=int, default=1024)
    r.add_argument("--log-every", type=int, default=20)
    r.add_argument("--ckpt-every", type=int, default=500)
    r.add_argument("--max-checkpoints", type=int, default=6)
    r.add_argument("--kmeans", action="store_true",
                   help="completed --kmeans mode: kmeans-init + norm-EMA "
                        "codebook (non-grad state)")
    r.add_argument("--revival", action="store_true",
                   help="dead-code revival on the EMA codebook "
                        "(QuantizerConfig.codebook_revival; needs --kmeans)")
    c = sub.add_parser("compare")
    c.add_argument("--a", required=True)
    c.add_argument("--b", required=True)
    c.add_argument("--from-step", type=int, default=0)
    c.add_argument("--out", default="")
    p = sub.add_parser("report")
    p.add_argument("--workdir", required=True)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--resume-json", default="")
    p.add_argument("--out", default="docs/TRAIN_SUSTAINED.json")
    args = ap.parse_args()
    {"run": cmd_run, "compare": cmd_compare, "report": cmd_report}[args.cmd](args)


if __name__ == "__main__":
    main()
