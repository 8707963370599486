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
