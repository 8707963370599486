"""EHR memory-bank machinery vs a torch golden of the reference formula
(EHRModel_token.py:295-331, 437-449) + ring/FIFO and 8-device gather
semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medtok_tpu.ehr.memory_bank import (
    MemoryBankState,
    bank_valid_mask,
    contrastive_loss,
    init_memory_bank,
    update_memory_bank,
)

torch = pytest.importorskip("torch")


def torch_reference_loss(anchor, pos=None, bank=None, temperature=0.1):
    """The reference compute_contrastive_loss math, transcribed as a test
    oracle (EHRModel_token.py:295-331)."""
    import torch.nn.functional as F

    a = F.normalize(torch.from_numpy(anchor), dim=-1)
    p = F.normalize(torch.from_numpy(pos), dim=-1) if pos is not None else None
    B = a.shape[0]
    pos_sim = (
        torch.sum(a * (p if p is not None else a), dim=-1) / temperature
    )
    mask = ~torch.eye(B).bool()
    within = (a @ a.t() / temperature)[mask].view(B, -1)
    negs = [within]
    if p is not None:
        negs.append((a @ p.t() / temperature)[mask].view(B, -1))
    negatives = torch.cat(negs, dim=-1)
    if bank is not None and bank.shape[0] > 0:
        mem = a @ torch.from_numpy(bank).t() / temperature
        negatives = torch.cat([mem, negatives], dim=-1)
    logits = torch.cat([pos_sim.unsqueeze(1), negatives], dim=-1)
    labels = torch.zeros(B, dtype=torch.long)
    return float(torch.nn.functional.cross_entropy(logits, labels))


def test_contrastive_loss_matches_torch_golden():
    rng = np.random.default_rng(0)
    anchor = rng.standard_normal((6, 16)).astype(np.float32)
    got = float(contrastive_loss(jnp.asarray(anchor)))
    want = torch_reference_loss(anchor)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_contrastive_loss_with_pos_and_bank_matches_torch():
    rng = np.random.default_rng(1)
    anchor = rng.standard_normal((5, 16)).astype(np.float32)
    pos = rng.standard_normal((5, 16)).astype(np.float32)
    rows = rng.standard_normal((8, 16)).astype(np.float32)
    rows = rows / np.linalg.norm(rows, axis=-1, keepdims=True)

    bank = init_memory_bank(8, 16)
    bank = update_memory_bank(bank, jnp.asarray(rows))
    assert bool(bank_valid_mask(bank).all())

    got = float(contrastive_loss(jnp.asarray(anchor), jnp.asarray(pos), bank))
    want = torch_reference_loss(anchor, pos, rows)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_stale_bank_slots_are_not_negatives():
    rng = np.random.default_rng(2)
    anchor = rng.standard_normal((4, 8)).astype(np.float32)
    rows = rng.standard_normal((3, 8)).astype(np.float32)
    bank = update_memory_bank(init_memory_bank(10, 8), jnp.asarray(rows))
    got = float(contrastive_loss(jnp.asarray(anchor), bank=bank))
    want = torch_reference_loss(
        anchor, bank=np.asarray(rows / np.linalg.norm(rows, axis=-1, keepdims=True))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ring_fifo_keeps_most_recent_rows():
    rng = np.random.default_rng(3)
    bank = init_memory_bank(4, 8)
    all_rows = []
    for step in range(3):
        rows = rng.standard_normal((3, 8)).astype(np.float32)
        all_rows.append(rows / np.linalg.norm(rows, axis=-1, keepdims=True))
        bank = update_memory_bank(bank, jnp.asarray(rows))
    # 9 rows through a 4-slot ring: the last 4 survive
    expect = np.concatenate(all_rows)[-4:]
    got = np.asarray(bank.buffer)
    assert sorted(map(tuple, got.round(5))) == sorted(map(tuple, expect.round(5)))
    assert int(bank.count) == 9


def test_oversized_update_keeps_tail():
    rng = np.random.default_rng(4)
    rows = rng.standard_normal((7, 8)).astype(np.float32)
    bank = update_memory_bank(init_memory_bank(4, 8), jnp.asarray(rows))
    expect = rows[-4:] / np.linalg.norm(rows[-4:], axis=-1, keepdims=True)
    got = np.asarray(bank.buffer)
    assert sorted(map(tuple, got.round(5))) == sorted(map(tuple, expect.round(5)))


def test_dp_all_gather_update_matches_single_device():
    """shard_map update over 8 devices == single-device update on the
    concatenated global batch (torch.distributed.all_gather parity,
    EHRModel_token.py:440-441)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from medtok_tpu.parallel.mesh import DP_AXIS, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((16, 8)).astype(np.float32)  # 2 rows/device
    bank0 = init_memory_bank(32, 8)

    def upd(bank, chunk):
        return update_memory_bank(bank, chunk, axis_name=DP_AXIS)

    sharded = shard_map(
        upd, mesh=mesh,
        in_specs=(P(), P(DP_AXIS)), out_specs=P(),
        check_vma=False,
    )
    got = sharded(bank0, jnp.asarray(emb))
    want = update_memory_bank(bank0, jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(got.buffer),
                               np.asarray(want.buffer), rtol=1e-6)
    assert int(got.count) == int(want.count) == 16
