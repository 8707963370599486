"""Tokenizer training CLI — the train_MedTok.py equivalent.

    python -m medtok_tpu.cli.train --kg-path Dataset/primeKG/ \
        --med-codes-pkg-map-path Dataset/medicalCode/all_codes_mappings.parquet \
        --text-vocab path/to/vocab.txt --results-dir results/

Flag surface mirrors /root/reference/train_MedTok.py:345-400; the resolved
config is frozen to <experiment>/args.json (the reference's config-freezing
contract, train_MedTok.py:57) and checkpoints rotate under
<experiment>/checkpoints.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kg-path", type=str, default="Dataset/primeKG/")
    p.add_argument("--med-codes-pkg-map-path", type=str,
                   default="Dataset/medicalCode/all_codes_mappings.parquet")
    p.add_argument("--text-vocab", type=str, required=True,
                   help="WordPiece vocab.txt (bert-base-uncased)")
    p.add_argument("--bert-checkpoint", type=str, default=None,
                   help="HF bert-base-uncased PyTorch checkpoint to convert")
    p.add_argument("--results-dir", type=str, default="results")
    p.add_argument("--graph-model-name", type=str, default="GCN",
                   choices=["GCN", "GAT"])
    # text-encoder shape (defaults = bert-base-uncased)
    p.add_argument("--text-layers", type=int, default=12)
    p.add_argument("--text-hidden", type=int, default=768)
    p.add_argument("--text-heads", type=int, default=12)
    p.add_argument("--text-intermediate", type=int, default=3072)
    p.add_argument("--text-vocab-size", type=int, default=30522)
    p.add_argument("--kg-num-nodes", type=int, default=130000)
    p.add_argument("--graph-in-channels", type=int, default=64)
    p.add_argument("--graph-hidden-channels", type=int, default=128)
    p.add_argument("--graph-out-channels", type=int, default=64)
    p.add_argument("--codebook-size", type=int, default=21000)
    p.add_argument("--codebook-embed-dim", type=int, default=64)
    p.add_argument("--commit-loss-beta", type=float, default=0.25)
    p.add_argument("--entropy-loss-ratio", type=float, default=0.0)
    p.add_argument("--kmeans", action="store_true",
                   help="kmeans-init + norm-EMA codebook (the completed "
                        "--kmeans mode; the reference flag swaps in an "
                        "EmbeddingEMA whose updates are never wired, "
                        "vector_quantization_soft_one_new.py:109-111)")
    p.add_argument("--codebook-revival", action="store_true",
                   help="dead-code revival for the EMA codebook "
                        "(CVectorQuantiser closest-anchor mechanics); "
                        "requires --kmeans")
    p.add_argument("--shared-loss-beta", type=float, default=0.1)
    p.add_argument("--specific-loss-lamb", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.95)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--global-batch-size", type=int, default=1024)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--max-checkpoints", type=int, default=2)
    p.add_argument("--mixed-precision", type=str, default="bf16",
                   choices=["none", "bf16"])
    p.add_argument("--ema", action="store_true")
    p.add_argument("--mesh-dp", type=int, default=-1)
    p.add_argument("--mesh-tp", type=int, default=1)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="bootstrap jax.distributed for TPU pod slices")
    p.add_argument("--packed-text", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="sequence-packed frozen-BERT forward in the train "
                        "step (~2.4x step speedup; auto = on unless "
                        "--text-dropout-in-train is set)")
    p.add_argument("--text-dropout-in-train", action="store_true",
                   help="run the frozen BERT with dropout during training "
                        "(the reference's accidental text augmentation, "
                        "tokenizer.py:148-152; incompatible with packed text)")
    p.add_argument("--edge-dropout-p", type=float, default=0.1,
                   help="graph-augmentation edge dropout "
                        "(dataset_creator.py:155-170)")
    p.add_argument("--workdir", type=str, default=None,
                   help="reuse an existing experiment dir and RESUME from its "
                        "latest checkpoint (the reference's --vq-ckpt resume, "
                        "train_MedTok.py:135-174); default: new timestamped dir")
    return p


def config_from_args(args) -> "MedTokConfig":
    from medtok_tpu.config import (
        DataConfig,
        GraphEncoderConfig,
        MedTokConfig,
        ModelConfig,
        QuantizerConfig,
        TextEncoderConfig,
        TrainConfig,
    )

    if args.packed_text == "on" and args.text_dropout_in_train:
        # fail here with a clear message instead of a bare assert deep in
        # MultimodalTokenizer._encode at trace time
        raise SystemExit(
            "--packed-text on is incompatible with --text-dropout-in-train: "
            "dropout noise would leak across packed segments"
        )
    return MedTokConfig(
        model=ModelConfig(
            text=TextEncoderConfig(
                vocab_size=args.text_vocab_size,
                hidden_size=args.text_hidden,
                num_layers=args.text_layers,
                num_heads=args.text_heads,
                intermediate_size=args.text_intermediate,
            ),
            graph=GraphEncoderConfig(
                num_nodes=args.kg_num_nodes,
                model_name=args.graph_model_name,
                in_channels=args.graph_in_channels,
                hidden_channels=args.graph_hidden_channels,
                out_channels=args.graph_out_channels,
            ),
            quantizer=QuantizerConfig(
                codebook_size=args.codebook_size,
                codebook_embed_dim=args.codebook_embed_dim,
                commit_loss_beta=args.commit_loss_beta,
                entropy_loss_ratio=args.entropy_loss_ratio,
                use_kmeans=args.kmeans,
                codebook_revival=args.codebook_revival,
            ),
            compute_dtype="bfloat16" if args.mixed_precision == "bf16" else "float32",
            text_dropout_in_train=args.text_dropout_in_train,
        ),
        data=DataConfig(
            kg_path=args.kg_path,
            med_codes_pkg_map_path=args.med_codes_pkg_map_path,
            text_vocab_path=args.text_vocab,
            edge_dropout_p=args.edge_dropout_p,
        ),
        train=TrainConfig(
            epochs=args.epochs, lr=args.lr, beta1=args.beta1, beta2=args.beta2,
            max_grad_norm=args.max_grad_norm,
            global_batch_size=args.global_batch_size,
            global_seed=args.global_seed, log_every=args.log_every,
            ckpt_every=args.ckpt_every, max_checkpoints=args.max_checkpoints,
            mixed_precision=args.mixed_precision, ema=args.ema,
            results_dir=args.results_dir,
            mesh_dp=args.mesh_dp, mesh_tp=args.mesh_tp,
            shared_loss_beta=args.shared_loss_beta,
            specific_loss_lamb=args.specific_loss_lamb,
            packed_text=_resolve_packed_text(args),
        ),
    )


def _resolve_packed_text(args) -> bool:
    if args.packed_text == "on":
        return True
    return (
        args.packed_text == "auto"
        and not args.text_dropout_in_train
    )


def main(argv=None) -> None:
    from medtok_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    if args.multihost:
        from medtok_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()
    cfg = config_from_args(args)

    from medtok_tpu.data.dataset import MedCodeDataset, epoch_batches
    from medtok_tpu.data.text import WordPieceTokenizer
    from medtok_tpu.train.trainer import Trainer
    from medtok_tpu.utils.logging import MetricsLogger, create_logger

    if args.workdir:
        workdir = Path(args.workdir)
        from medtok_tpu.utils.checkpoint import CheckpointManager

        if (workdir / "args.json").exists():
            # config-freezing contract: the stored config wins on resume
            cfg = CheckpointManager.load_config(workdir)
    else:
        time_record = time.strftime("%Y-%m-%d-%H-%M-%S")
        workdir = Path(args.results_dir) / f"{time_record}-{args.graph_model_name}"
    logger = create_logger(workdir, process_index=jax.process_index())
    logger.info(f"Experiment directory created at {workdir}")
    logger.info(f"devices: {jax.devices()}")

    tokenizer = WordPieceTokenizer.from_vocab_file(args.text_vocab)
    dataset = MedCodeDataset(
        cfg.data.kg_path, cfg.data.med_codes_pkg_map_path, tokenizer,
        cfg=cfg.data,
    )
    logger.info(f"Dataset contains {len(dataset):,} medical codes")

    metrics_logger = MetricsLogger(
        workdir if jax.process_index() == 0 else None,
        use_wandb=args.wandb and jax.process_index() == 0, config=cfg,
    )
    trainer = Trainer(
        cfg, workdir=str(workdir),
        log_fn=lambda step, m: (
            metrics_logger.log(step, m),
            logger.info(
                f"(step={step:07d}) Train Loss: {m.get('loss', float('nan')):.4f}, "
                f"Train Steps/Sec: {m.get('steps_per_sec', 0):.2f}"
            ),
        ),
    )
    if args.bert_checkpoint:
        logger.info(f"Converting BERT weights from {args.bert_checkpoint}")

    example = next(iter(epoch_batches(
        dataset, batch_size=cfg.train.global_batch_size,
        seed=cfg.train.global_seed, epoch=0,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )))
    state = trainer.init_state(example)
    if args.kmeans and int(state.step) == 0:
        # cosine-kmeans codebook init from the first batch's shared
        # features (the reference's kmeans=True constructs EmbeddingEMA but
        # never calls init_embed_; a resumed run keeps its checkpointed
        # codebook instead)
        from medtok_tpu.train.trainer import kmeans_init_codebook

        state = kmeans_init_codebook(trainer.model, state, [example])
        logger.info("kmeans codebook init done")
    if args.bert_checkpoint:
        import torch

        from medtok_tpu.models.bert import convert_hf_bert

        sd = torch.load(args.bert_checkpoint, map_location="cpu")
        bert_params = convert_hf_bert(sd, cfg.model.text)
        state = state.replace(
            params={**state.params, "text_model": bert_params}
        )

    steps_per_epoch = len(dataset) // cfg.train.global_batch_size
    start_epoch = int(state.step) // max(steps_per_epoch, 1)
    logger.info(f"Training for {cfg.train.epochs} epochs from epoch {start_epoch}...")
    for epoch in range(start_epoch, cfg.train.epochs):
        logger.info(f"Beginning epoch {epoch}...")
        batches = epoch_batches(
            dataset, batch_size=cfg.train.global_batch_size,
            seed=cfg.train.global_seed, epoch=epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        state = trainer.fit(state, batches, max_steps=args.max_steps)
        if args.max_steps is not None and int(state.step) >= args.max_steps:
            break
    if trainer._ckpt is not None:
        trainer._ckpt.save(state)
    metrics_logger.close()
    logger.info("Done!")


if __name__ == "__main__":
    main()
