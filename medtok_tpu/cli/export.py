"""Full-vocabulary embedding export CLI — the inference.py equivalent.

    python -m medtok_tpu.cli.export --workdir results/<experiment> \
        [--out-dir results/<experiment>]

Reloads args.json + the latest checkpoint from the training workdir
(inference.py:30-66 contract) and writes embeddings_all.npy /
tokens_all.npy / weights_all.npy in vocab order (the reference's sort bug at
inference.py:119-121 is fixed by direct index placement).
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--out-dir", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--mesh-dp", type=int, default=-1)
    p.add_argument("--packed", type=str, default="on",
                   choices=["on", "off"],
                   help="sequence-packed text encoder (data/packing.py): "
                        "~20%% faster at 600K scale, token-identical output")
    args = p.parse_args(argv)

    from medtok_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax

    from medtok_tpu.data.dataset import MedCodeDataset
    from medtok_tpu.data.text import WordPieceTokenizer
    from medtok_tpu.export.export import export_all
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.parallel.mesh import make_mesh
    from medtok_tpu.train.trainer import create_train_state
    from medtok_tpu.utils.checkpoint import CheckpointManager
    from medtok_tpu.utils.logging import create_logger

    logger = create_logger(None)
    cfg = CheckpointManager.load_config(args.workdir)
    tokenizer = WordPieceTokenizer.from_vocab_file(cfg.data.text_vocab_path)
    dataset = MedCodeDataset(
        cfg.data.kg_path, cfg.data.med_codes_pkg_map_path, tokenizer,
        cfg=cfg.data,
    )
    logger.info(f"Dataset contains {len(dataset):,} medical codes")

    model = MultimodalTokenizer(cfg.model)
    example = dataset.make_batch(list(range(min(2, len(dataset)))))
    state = create_train_state(cfg, model, jax.tree.map(jax.numpy.asarray, example))
    mgr = CheckpointManager(args.workdir, max_to_keep=cfg.train.max_checkpoints)
    state = mgr.restore(state)
    logger.info(f"Restored checkpoint at step {int(state.step)}")

    mesh = make_mesh(args.mesh_dp, 1) if len(jax.devices()) > 1 else None
    t0 = time.perf_counter()
    out_dir = args.out_dir or args.workdir
    arrays = export_all(
        model, state.params, state.usage, dataset,
        batch_size=args.batch_size, mesh=mesh, out_dir=out_dir,
        packed=args.packed == "on",
    )
    dt = time.perf_counter() - t0
    n = len(dataset)
    logger.info(
        f"Exported {n:,} codes in {dt:.1f}s ({n / dt:,.0f} codes/s) -> {out_dir}"
    )
    for name, arr in arrays.items():
        logger.info(f"  {name}: {arr.shape} {arr.dtype}")


if __name__ == "__main__":
    main()
