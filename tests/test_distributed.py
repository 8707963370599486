"""Multi-process distributed smoke: the REAL multi-host path (two OS
processes, jax.distributed.initialize, 1 CPU device each) must produce the
same train-step loss as the single-process dp=2 run on the same global batch
(SURVEY.md section 2.7's jax.distributed bootstrap, exercised for real)."""

import re
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

WORKER = textwrap.dedent("""
    import sys
    proc_id, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=proc_id)
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from medtok_tpu.config import DataConfig, MedTokConfig, TrainConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.parallel.mesh import (DP_AXIS, make_mesh,
                                          shard_host_local_batch)
    from medtok_tpu.train.trainer import create_train_state, make_train_step
    sys.path.insert(0, "@TESTS@")
    from test_model import tiny_config

    mcfg = tiny_config()
    cfg = MedTokConfig(model=mcfg, data=DataConfig(),
                       train=TrainConfig(global_batch_size=4, ema=False))
    rng = np.random.default_rng(0)
    gbatch = random_code_batch(rng, batch=4, text_len=16, max_nodes=8,
                               max_edges_per_graph=8, text_vocab=1000,
                               num_kg_nodes=500)
    # this process's local half of the global batch
    lo, hi = proc_id * 2, proc_id * 2 + 2
    B, Epg = 4, 8
    local = gbatch._replace(**{
        f: getattr(gbatch, f)[lo:hi] for f in
        ("input_ids", "attention_mask", "node_ids", "node_mask",
         "code_indices")
    }, **{
        f: getattr(gbatch, f).reshape(B, Epg)[lo:hi].reshape(-1) for f in
        ("edge_src", "edge_dst", "edge_weight", "edge_src_aug",
         "edge_dst_aug", "edge_weight_aug")
    })

    mesh = make_mesh(dp=2, tp=1)
    model = MultimodalTokenizer(mcfg, dp_axis=DP_AXIS)
    state = create_train_state(cfg, model, gbatch)  # same seed everywhere
    step = make_train_step(cfg, model, mesh, donate=False)
    sb = shard_host_local_batch(mesh, local)
    state, metrics = step(state, sb)
    print(f"DIST_LOSS={float(jax.device_get(metrics['loss'])):.6f}")
""")


@pytest.mark.skipif(
    __import__("os").environ.get("MEDTOK_SKIP_MULTIPROC") == "1",
    reason="multi-process smoke disabled",
)
def test_two_process_train_step_matches_single_process(tmp_path):
    repo = str(Path(__file__).resolve().parents[1])
    tests = str(Path(__file__).resolve().parent)
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@REPO@", repo).replace("@TESTS@", tests))

    import socket

    with socket.socket() as sock:  # grab a free port for the coordinator
        sock.bind(("127.0.0.1", 0))
        port = str(sock.getsockname()[1])
    env = {**__import__("os").environ}
    env.pop("XLA_FLAGS", None)  # workers configure their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, out[-3000:]
        m = re.search(r"DIST_LOSS=([-\d.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]

    # single-process reference: dp=2 over two local devices, same batch/seed
    from medtok_tpu.config import DataConfig, MedTokConfig, TrainConfig
    from medtok_tpu.data.synthetic import random_code_batch
    from medtok_tpu.models.tokenizer_model import MultimodalTokenizer
    from medtok_tpu.parallel.mesh import DP_AXIS, make_mesh, shard_batch
    from medtok_tpu.train.trainer import create_train_state, make_train_step
    from tests.test_model import tiny_config

    mcfg = tiny_config()
    cfg = MedTokConfig(model=mcfg, data=DataConfig(),
                       train=TrainConfig(global_batch_size=4, ema=False))
    rng = np.random.default_rng(0)
    batch = jax.tree.map(jnp.asarray, random_code_batch(
        rng, batch=4, text_len=16, max_nodes=8, max_edges_per_graph=8,
        text_vocab=1000, num_kg_nodes=500,
    ))
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    model = MultimodalTokenizer(mcfg, dp_axis=DP_AXIS)
    state = create_train_state(cfg, model, batch)
    step = make_train_step(cfg, model, mesh, donate=False)
    _, metrics = step(state, shard_batch(mesh, batch))
    ref_loss = float(jax.device_get(metrics["loss"]))
    assert losses[0] == pytest.approx(ref_loss, rel=1e-4), (losses, ref_loss)


def _write_fixtures(root: Path) -> dict:
    """Synthetic kg + vocab parquet + wordpiece vocab for CLI runs."""
    import numpy as np

    from medtok_tpu.data.synthetic import synthetic_code_vocab, synthetic_kg_csv
    from medtok_tpu.data.text import make_test_vocab

    rng = np.random.default_rng(0)
    (root / "primeKG").mkdir(parents=True)
    synthetic_kg_csv(str(root / "primeKG" / "kg.csv"), rng, num_nodes=300,
                     num_edges=1500)
    synthetic_code_vocab(str(root / "codes.parquet"), rng, num_codes=48,
                         num_nodes=300)
    vocab = make_test_vocab(
        ["diabetes", "mellitus", "acute", "chronic", "infection", "fracture",
         "hypertension", "renal", "cardiac", "therapy", "syndrome", "disorder"]
    )
    with open(root / "vocab.txt", "w") as f:
        for t in vocab:
            f.write(t + "\n")
    return {
        "kg": str(root / "primeKG"),
        "codes": str(root / "codes.parquet"),
        "vocab": str(root / "vocab.txt"),
    }


def _train_cli_args(fx: dict, workdir: str) -> list[str]:
    return [
        "-m", "medtok_tpu.cli.train",
        "--kg-path", fx["kg"], "--med-codes-pkg-map-path", fx["codes"],
        "--text-vocab", fx["vocab"], "--workdir", workdir,
        "--global-batch-size", "8", "--codebook-size", "90",
        "--codebook-embed-dim", "16", "--graph-in-channels", "8",
        "--graph-hidden-channels", "16", "--graph-out-channels", "16",
        "--text-layers", "1", "--text-hidden", "32", "--text-heads", "4",
        "--text-intermediate", "64", "--text-vocab-size", "200",
        "--kg-num-nodes", "300", "--epochs", "1", "--max-steps", "3",
        "--ckpt-every", "100", "--mixed-precision", "none",
        "--edge-dropout-p", "0.0",
    ]


def _read_losses(workdir: Path) -> list[float]:
    import json

    out = {}
    with open(workdir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            out[rec["step"]] = rec["loss"]
    return [out[k] for k in sorted(out)]


@pytest.mark.skipif(
    __import__("os").environ.get("MEDTOK_SKIP_MULTIPROC") == "1",
    reason="multi-process smoke disabled",
)
@pytest.mark.parametrize("packed", ["off", "on"])
def test_multihost_cli_train_matches_single_process(tmp_path, packed):
    """VERDICT missing #3 (r1) / #2 (r2): drive the REAL cli.train
    --multihost path across two OS processes (1 CPU device each) and require
    per-step loss equality with a single-process dp=2 run on the same data —
    the DistributedSampler + DDP rank-shard contract through the actual
    driver (train_MedTok.py:115-131; utils/distributed.py:20-58). packed="on"
    additionally exercises per-process sequence packing: each rank packs its
    contiguous dp shard with a rank-agreed row budget."""
    import json
    import os
    import socket

    fx = _write_fixtures(tmp_path)
    repo = str(Path(__file__).resolve().parents[1])

    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = str(sock.getsockname()[1])

    base_env = {**os.environ, "PYTHONPATH": repo,
                "MEDTOK_COMPILE_CACHE": "/tmp/medtok_xla_cache"}
    base_env.pop("XLA_FLAGS", None)

    mh_dir = tmp_path / "mh"
    procs = []
    for i in range(2):
        env = {
            **base_env,
            "JAX_PLATFORMS": "cpu", "JAX_NUM_CPU_DEVICES": "1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(i),
        }
        procs.append(subprocess.Popen(
            [sys.executable, *_train_cli_args(fx, str(mh_dir)), "--multihost",
             "--packed-text", packed],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"rank {i}:\n{out[-4000:]}"

    sp_dir = tmp_path / "sp"
    env = {**base_env, "JAX_PLATFORMS": "cpu", "JAX_NUM_CPU_DEVICES": "2"}
    p = subprocess.Popen(
        [sys.executable, *_train_cli_args(fx, str(sp_dir)), "--mesh-dp", "2",
         "--packed-text", packed],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo,
    )
    out = p.communicate(timeout=900)[0]
    assert p.returncode == 0, out[-4000:]

    mh_losses = _read_losses(mh_dir)
    sp_losses = _read_losses(sp_dir)
    assert len(mh_losses) == len(sp_losses) == 3
    for a, b in zip(mh_losses, sp_losses):
        assert a == pytest.approx(b, rel=1e-5), (mh_losses, sp_losses)

    # rank-0-only artifacts: exactly one args.json + rotated checkpoints
    assert (mh_dir / "args.json").exists()
    assert (mh_dir / "checkpoints").exists()
