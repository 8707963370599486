"""EHR outcome-prediction CLI — the MedTok_EHR.py equivalent.

    python -m medtok_tpu.cli.ehr --dataset MIMIC_III --task readmission \
        --ehr-root Dataset/EHR --med-codes Dataset/medicalCode/all_codes_mappings.parquet \
        --embedding-path results/<exp>/embeddings_all.npy

Flag surface mirrors /root/reference/MedTok_EHR_Tutorial/MedTok_EHR.py:44-85.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="MIMIC_III",
                   choices=["MIMIC_III", "MIMIC_IV", "EHRShot"])
    p.add_argument("--task", type=str, default="readmission",
                   choices=["mortality", "readmission", "lenofstay", "drugrec",
                            "phenotype", "new_disease"])
    p.add_argument("--ehr-root", type=str, default="Dataset/EHR")
    p.add_argument("--med-codes", type=str,
                   default="Dataset/medicalCode/all_codes_mappings.parquet")
    p.add_argument("--embedding-path", type=str,
                   default="results/embeddings_all.npy")
    p.add_argument("--phenotype-index", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--input-dim", type=int, default=64)
    p.add_argument("--output-dim", type=int, default=64)
    p.add_argument("--max-visits", type=int, default=100)
    p.add_argument("--max-medical-code", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save-result-path", type=str, default="task_results")
    p.add_argument("--mesh-dp", type=int, default=-1,
                   help="data-parallel devices for the train step; -1 = all "
                        "visible (the reference trains Lightning DDP over "
                        "every GPU, MedTok_EHR.py:230). Falls back to 1 when "
                        "batch size does not divide.")
    p.add_argument("--flash", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas flash attention in the encoder (auto = on "
                        "TPU with long sequences)")
    p.add_argument("--wandb", action="store_true",
                   help="mirror per-run metrics to wandb (WandbLogger, "
                        "MedTok_EHR.py:316-330); metrics.jsonl is always "
                        "written under --save-result-path")
    p.add_argument("--hyper-search", action="store_true",
                   help="coordinate hyperparameter sweep over dropout/"
                        "num_layers/lr for the chosen task "
                        "(hyper_search_, MedTok_EHR.py:246-271)")
    p.add_argument("--search-repeats", type=int, default=1,
                   help="repeats per grid point (the reference runs 10)")
    p.add_argument("--search-grid", type=str, default=None,
                   help='JSON dict {hp_name: [values]} overriding the default '
                        'sweep grid')
    return p


def main(argv=None) -> None:
    from medtok_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)

    from medtok_tpu.ehr.parsers import EHRShotDataset, MIMIC3Dataset, MIMIC4Dataset
    from medtok_tpu.ehr.tasks import CodeMapper, PatientEHRTasks, build_labels
    from medtok_tpu.ehr.train import (
        EHRTrainConfig,
        EHRTrainer,
        prepare_task_features,
        sample_weights,
        stratified_split,
    )
    from medtok_tpu.utils.logging import create_logger

    logger = create_logger(args.save_result_path)
    root = Path(args.ehr_root) / args.dataset
    parser_cls = {
        "MIMIC_III": MIMIC3Dataset,
        "MIMIC_IV": MIMIC4Dataset,
        "EHRShot": EHRShotDataset,
    }[args.dataset]
    logger.info(f"Loading {args.dataset} from {root}")
    db = parser_cls(root)
    mapper = CodeMapper(args.med_codes)
    tasks = PatientEHRTasks(
        db.patients, mapper, dataset=args.dataset,
        phenotype_index=args.phenotype_index,
        cache_path=Path(args.ehr_root) / args.dataset /
        f"{args.dataset}_patient_{args.task}.pkl",
    )
    data = tasks.build(args.task)
    data = [d for d in data if d and d[0]["label"] is not None]
    logger.info(f"Number of samples: {len(data)}")

    labels, num_class = build_labels(data, args.task)
    feats, fz = prepare_task_features(
        data, labels, num_class, args.task,
        vocab_size=len(mapper), max_visits=args.max_visits,
        max_medical_code=args.max_medical_code,
    )
    tr, va, te = stratified_split(labels, args.task, seed=args.seed)
    w = sample_weights(labels, args.task)

    table = np.load(args.embedding_path)
    import jax

    from medtok_tpu.parallel.mesh import make_mesh
    from medtok_tpu.utils.logging import MetricsLogger

    ndev = len(jax.devices())
    dp = ndev if args.mesh_dp == -1 else args.mesh_dp
    if args.batch_size % max(dp, 1) != 0:
        dp = 1
    mesh = make_mesh(dp=dp, tp=1) if dp > 1 else None
    if mesh is not None:
        logger.info(f"dp-sharding the train step over {dp} devices")

    val_batches = [
        fz.collate([feats[i] for i in va[s:s + args.batch_size]])
        for s in range(0, max(len(va) - args.batch_size + 1, 1), args.batch_size)
    ]
    test_batches = [
        fz.collate([feats[i] for i in te[s:s + args.batch_size]])
        for s in range(0, max(len(te) - args.batch_size + 1, 1), args.batch_size)
    ]

    def single_run(overrides: dict, metrics: MetricsLogger | None):
        """One train+eval run; returns (best_params, best_val, test_metrics).
        (single_run, MedTok_EHR.py:107-238)."""
        hp = {"lr": args.lr, "num_layers": args.num_layers,
              "dropout": args.dropout, **overrides}
        cfg = EHRTrainConfig(
            task=args.task, batch_size=args.batch_size, epochs=args.epochs,
            lr=hp["lr"], num_layers=hp["num_layers"], dropout=hp["dropout"],
            hidden_dim=args.hidden_dim, input_dim=args.input_dim,
            output_dim=args.output_dim, num_heads=args.num_heads,
            max_visits=args.max_visits, max_medical_code=args.max_medical_code,
            seed=hp.get("seed", args.seed),
            flash_attention={"auto": "auto", "on": True, "off": False}[args.flash],
        )
        trainer = EHRTrainer(cfg, table, num_class, mesh=mesh)

        def log_fn(epoch, m):
            logger.info(f"epoch {epoch}: {m}")
            if metrics is not None:
                metrics.log(epoch, {"train/loss": m["loss"],
                                    **{f"val/{k}": v
                                       for k, v in m["val"].items()}})

        params, best = trainer.fit(
            [feats[i] for i in tr], w[tr], val_batches, fz, log_fn=log_fn
        )
        test = trainer.evaluate(params, test_batches)
        if metrics is not None:
            metrics.log(args.epochs, {f"test/{k}": v for k, v in test.items()})
        return params, best, test

    import json

    out = Path(args.save_result_path)
    out.mkdir(parents=True, exist_ok=True)

    if args.hyper_search:
        # coordinate sweep, reference hyper_search_ (MedTok_EHR.py:246-271):
        # vary one hyperparameter at a time around the CLI-given point
        grid = {
            "dropout": [0.1, 0.2, 0.3, 0.4, 0.5],
            "num_layers": [1, 2, 3, 4],
            "lr": [1e-4, 5e-4, 1e-3],
        }
        if args.search_grid:
            grid = json.loads(args.search_grid)
        results = []
        for hp_name, options in grid.items():
            logger.info(f"now searching for {hp_name}...")
            for hp_value in options:
                for rep in range(args.search_repeats):
                    _, best, test = single_run(
                        {hp_name: hp_value, "seed": args.seed + rep}, None
                    )
                    row = {"hp": hp_name, "value": hp_value, "repeat": rep,
                           "best_val": best, "test": test}
                    logger.info(f"grid {hp_name}={hp_value} rep {rep}: {test}")
                    results.append(row)
        results.sort(key=lambda r: -r["best_val"]["aupr"])
        (out / "hyper_search.json").write_text(
            json.dumps({"task": args.task, "dataset": args.dataset,
                        "results": results}, indent=2) + "\n"
        )
        logger.info(f"Best grid point: {results[0]}")
        return

    run_name = (
        f"Model_Name_medtok_tpu_Batch_size_{args.batch_size}_Epochs_"
        f"{args.epochs}_Layers_{args.num_layers}_LR_{args.lr}"
    )  # WandbLogger name format, MedTok_EHR.py:317
    metrics = MetricsLogger(
        out, use_wandb=args.wandb, wandb_project="EHR_experiment",
        run_name=run_name, config=vars(args),
    )
    try:
        params, best, test = single_run({}, metrics)
    finally:
        metrics.close()
    logger.info(f"Best val: {best}")
    logger.info(f"Test: {test}")

    # persist the best model + metrics (the reference saves model.pth and
    # reports test results, MedTok_EHR.py:235-238)
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        (out / "best_model").absolute(), jax.device_get(params), force=True
    )
    (out / "test_metrics.json").write_text(
        json.dumps({"task": args.task, "dataset": args.dataset,
                    "best_val": best, "test": test}, indent=2) + "\n"
    )
    logger.info(f"Saved best model + metrics under {out}")


if __name__ == "__main__":
    main()
