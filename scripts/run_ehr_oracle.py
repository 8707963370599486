"""EHR downstream quality oracle (VERDICT r3 item 3).

Two parity surfaces against a composed pure-torch EHRModel
(medtok_tpu/ehr/torch_oracle.py, reference formulas from
/root/reference/MedTok_EHR_Tutorial/EHRModel_token.py:36-247 with stock
``torch.nn.TransformerEncoderLayer`` blocks):

- ``ehr_forward``: converted weights both sides, identical batch ->
  max |emb| / |logits| error of the full patientEncoder forward
  (PE + year emb + day/hour sin-cos + CLS/gender/ethnicity prepend +
  N encoder layers + fc/classify).
- ``ehr_quality``: both sides start from the SAME converted init and train
  on the SAME batch sequence with the reference recipe (Adam + cosine
  T_max=10 eta_min=1e-3, BCE-with-logits) on a synthetic separable task;
  reports per-seed torch vs flax AUPRC and the loss-trajectory gap.
  With dropout disabled the two trajectories must track each other to
  numeric noise — a far stronger statement than seed-level equivalence;
  a dropout-on variant checks AUPRC within seed noise.

Merges both blocks into docs/PARITY_REPORT.json. CI-scale version:
tests/test_ehr_oracle.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synthetic_task_batches(
    seed: int,
    *,
    n: int = 240,
    batch: int = 16,
    C: int = 16,
    V: int = 5,
    vocab: int = 40,
    emb_dim: int = 32,
    num_class: int = 2,
    train_frac: float = 0.67,
):
    """A learnable synthetic binary task: label-1 patients draw codes mostly
    from the first half of the vocab, label-0 from the second half, with 20%
    noise — so AUPRC well above chance is reachable in a few epochs and any
    training-dynamics divergence shows up as a quality gap."""
    from medtok_tpu.ehr.dataset import EHRBatch

    rng = np.random.default_rng(seed)
    table = rng.normal(size=(vocab, emb_dim)).astype(np.float32) * 0.5
    labels = rng.integers(0, 2, size=n)
    half = vocab // 2

    def sample(i):
        lab = labels[i]
        n_codes = int(rng.integers(6, C + 1))
        pool_main = np.arange(0, half) if lab else np.arange(half, vocab)
        pool_noise = np.arange(vocab)
        codes = np.full(C, vocab, np.int32)  # miss row = vocab
        for j in range(n_codes):
            pool = pool_main if rng.random() > 0.2 else pool_noise
            codes[j] = rng.choice(pool)
        pad = np.ones(C, bool)
        pad[:n_codes] = False
        visit_ids = np.sort(rng.integers(0, V, size=C)).astype(np.int32)
        tw = np.stack([rng.integers(0, 3, V), rng.integers(0, 365, V),
                       rng.integers(0, 24, V)], axis=-1).astype(np.int32)
        tb = np.stack([rng.integers(0, 5, V), rng.integers(0, 365, V),
                       rng.integers(0, 24, V)], axis=-1).astype(np.int32)
        onehot = np.zeros(num_class, np.float32)
        onehot[lab] = 1.0
        return dict(codes=codes, visit_ids=visit_ids, pad_mask=pad,
                    gender=np.int32(rng.integers(0, 3)),
                    ethnicity=np.int32(rng.integers(0, 10)),
                    time_within=tw, time_between=tb,
                    label_onehot=onehot, label_raw=np.int32(lab))

    feats = [sample(i) for i in range(n)]

    def collate(fs):
        return EHRBatch(*[np.stack([f[k] for f in fs])
                          for k in EHRBatch._fields])

    n_train = int(train_frac * n) // batch * batch
    train = [collate(feats[i:i + batch]) for i in range(0, n_train, batch)]
    evalb = [collate(feats[i:i + batch])
             for i in range(n_train, n - batch + 1, batch)]
    return table, train, evalb


def make_pair(table, *, num_class=2, d=32, heads=4, hidden=64, layers=2,
              dropout=0.0, pe_dropout=0.0, C=16, V=5, seed=0, lr=1e-3,
              steps_per_epoch=1):
    """torch model + EHRTrainer with converted-identical params."""
    from medtok_tpu.ehr.torch_oracle import (
        build_torch_ehr_model,
        convert_torch_ehr_model,
    )
    from medtok_tpu.ehr.train import EHRTrainConfig, EHRTrainer

    tm = build_torch_ehr_model(
        table, num_class=num_class, input_dim=d, output_dim=d,
        num_heads=heads, hidden_dim=hidden, num_layers=layers,
        dropout=dropout, pe_dropout=pe_dropout, seed=seed,
    )
    params = convert_torch_ehr_model(tm)
    cfg = EHRTrainConfig(
        task="readmission", batch_size=16, num_layers=layers,
        hidden_dim=hidden, input_dim=d, output_dim=d, num_heads=heads,
        max_visits=V, max_medical_code=C, dropout=dropout,
        pe_dropout=pe_dropout, lr=lr, flash_attention=False, seed=seed,
    )
    trainer = EHRTrainer(cfg, table, num_class)
    trainer.tx = trainer._make_tx(steps_per_epoch=steps_per_epoch)
    return tm, trainer, params


def forward_parity(seed: int = 0, **sizes) -> dict:
    import jax

    table, train, _ = synthetic_task_batches(seed, **sizes)
    tm, trainer, params = make_pair(table, seed=seed)
    batch = train[0]
    import torch

    tm.eval()
    with torch.no_grad():
        t_emb, t_logits = tm(batch)
    f_emb, f_logits = trainer.model.apply({"params": params}, batch,
                                          train=False)
    emb_err = float(np.abs(t_emb.numpy() - np.asarray(f_emb)).max())
    logit_err = float(np.abs(t_logits.numpy() - np.asarray(f_logits)).max())
    return {"emb_max_abs_err": emb_err, "logits_max_abs_err": logit_err}


def quality_experiment(seed: int, *, epochs: int = 8, dropout: float = 0.0,
                       lr: float = 1e-3, **sizes) -> dict:
    """Same init, same batches, reference recipe both sides -> AUPRC pair."""
    import jax

    from medtok_tpu.ehr.torch_oracle import (
        torch_eval_probs,
        torch_train_epochs,
    )
    from medtok_tpu.ehr.train import compute_metrics

    table, train, evalb = synthetic_task_batches(seed, **sizes)
    spe = len(train)
    tm, trainer, params = make_pair(
        table, seed=seed, dropout=dropout, pe_dropout=dropout and 0.2,
        lr=lr, steps_per_epoch=spe,
    )

    # ---- torch side (reference loop) ----
    def batch_stream():
        while True:
            yield from train

    torch_train_epochs(tm, batch_stream(), task="readmission", lr=lr,
                       epochs=epochs, steps_per_epoch=spe, seed=seed)
    t_probs = torch_eval_probs(tm, evalb, "readmission")

    # ---- flax side (EHRTrainer step, same order) ----
    opt_state = trainer.tx.init(params)
    rng = jax.random.PRNGKey(seed)
    losses = []
    for e in range(epochs):
        for b in train:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, _ = trainer._train_step(
                params, opt_state, b, sub)
            losses.append(float(loss))
    f_probs = np.concatenate(
        [np.asarray(trainer._eval_step(params, b)) for b in evalb])

    raws = np.concatenate([np.asarray(b.label_raw) for b in evalb])
    t_m = compute_metrics("readmission", 2, raws, t_probs)
    f_m = compute_metrics("readmission", 2, raws, f_probs)
    return {
        "seed": seed,
        "torch_aupr": round(t_m["aupr"], 4),
        "flax_aupr": round(f_m["aupr"], 4),
        "torch_auc": round(t_m["auc"], 4),
        "flax_auc": round(f_m["auc"], 4),
        "aupr_abs_diff": round(abs(t_m["aupr"] - f_m["aupr"]), 4),
        "flax_loss_final": round(losses[-1], 5),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n", type=int, default=480)
    ap.add_argument("--report", default="docs/PARITY_REPORT.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    fwd = forward_parity(0, n=args.n)
    print("ehr_forward:", json.dumps(fwd))

    runs_det = [quality_experiment(s, epochs=args.epochs, dropout=0.0,
                                   n=args.n, lr=3e-3)
                for s in range(args.seeds)]
    runs_drop = [quality_experiment(s, epochs=args.epochs, dropout=0.5,
                                    n=args.n, lr=3e-3)
                 for s in range(args.seeds)]
    quality = {
        "recipe": "Adam + cosine(T_max=10, eta_min=1e-3), BCEWithLogits, "
                  "identical converted init + batch order both sides",
        "no_dropout": runs_det,
        "dropout_0.5": runs_drop,
        "no_dropout_max_aupr_diff": max(r["aupr_abs_diff"]
                                        for r in runs_det),
        "dropout_max_aupr_diff": max(r["aupr_abs_diff"] for r in runs_drop),
    }
    print("ehr_quality:", json.dumps(quality, indent=1))

    report = Path(args.report)
    merged = json.loads(report.read_text()) if report.exists() else {}
    merged["ehr_forward"] = fwd
    merged["ehr_quality"] = quality
    report.parent.mkdir(parents=True, exist_ok=True)
    report.write_text(json.dumps(merged, indent=1))
    print(f"merged into {report}")


if __name__ == "__main__":
    main()
