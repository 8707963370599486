"""Device-mesh construction and sharding helpers.

The reference's distribution layer is NCCL DDP (utils/distributed.py:20-58):
one process per GPU, gradient all-reduce. The TPU-native equivalent is a
`jax.sharding.Mesh` with a data axis ('dp') and a model axis ('tp', used to
shard the codebook rows for the VQ distance sweep), with XLA collectives over
ICI replacing NCCL (SURVEY.md section 2.6-2.7). Multi-host bootstrap would use
jax.distributed.initialize; at single-host scale the mesh covers all local
devices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def initialize_distributed() -> None:
    """Multi-host bootstrap (the init_process_group/SLURM-env equivalent of
    utils/distributed.py:20-58). On TPU pods jax.distributed.initialize()
    autodetects coordinator/process_id from the TPU environment; on a single
    host it is a no-op. Safe to call unconditionally from launchers."""
    import os

    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not coord and not os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return  # single host — nothing to bootstrap
    # explicit process topology (CPU/test pods); TPU pods autodetect
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(
                coord, num_processes=int(nproc), process_id=int(pid)
            )
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # already initialized or coordinator env incomplete


def warmup_collectives() -> None:
    """One-time cross-process collective-context init on a TINY program.

    The CPU Gloo backend (and, less tightly, pod ICI setup) establishes its
    context lazily at the FIRST collective execution, with a ~30 s connect
    window. If that first collective is a fully-compiled train step, rank
    compile skew (minutes on a contended host) blows the window
    (DEADLINE_EXCEEDED: GetKeyValue cpu:gloo/...). Fix: align ranks at a
    coordination-service KV barrier (gRPC to the coordinator — minutes-scale
    timeout, no gloo) and then run a trivial sync collective, so the gloo
    handshake sees near-zero skew. No-op single-process. Call after
    initialize_distributed() and before any jitted collective."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier("medtok_collective_warmup", 600_000)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("medtok_collective_warmup")


def make_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"dp({dp}) * tp({tp}) > devices({n})"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp, replicate over tp."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over dp.

    Flat edge arrays ([B*Epg]) shard evenly too since B is a multiple of dp.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_host_local_batch(mesh: Mesh, local_batch):
    """Multi-host batch assembly: each process contributes its LOCAL shard of
    the global batch (every leaf's leading dim is the per-process share —
    this holds for the flat edge arrays too, since B and B*Epg both split
    evenly); leaves become global jax.Arrays sharded over dp via
    jax.make_array_from_process_local_data. Single-process: shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch)
    sh = batch_sharding(mesh)

    def globalize(x):
        local = np.asarray(x)
        global_shape = (local.shape[0] * jax.process_count(), *local.shape[1:])
        return jax.make_array_from_process_local_data(sh, local, global_shape)

    return jax.tree.map(globalize, local_batch)
