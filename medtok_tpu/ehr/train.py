"""EHR training: splits, weighted sampling, optax loop, metrics, early stop.

Mirrors the reference driver + Lightning module
(/root/reference/MedTok_EHR_Tutorial/MedTok_EHR.py:107-238;
EHRModel_token.py:374-436, 554-572): stratified 80/10/10 split (seed 42),
WeightedRandomSampler class balancing, CE for lenofstay / BCE-with-logits
otherwise, AUROC/AUPRC/F1 (micro / weighted at 0.2 for multi, binary at 0.5),
Adam + cosine annealing (T_max=10, eta_min=1e-3), early stop on val AUPRC
(patience 5), best-checkpoint-by-val-AUPRC.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from medtok_tpu.ehr.dataset import EHRBatch, EHRFeaturizer, make_label_vec
from medtok_tpu.ehr.model import EHRModel

MULTI_TASKS = ("lenofstay", "phenotype", "drugrec")


# ------------------------------------------------------------- metrics -----

def compute_metrics(task: str, num_class: int, label_raw, probs) -> dict:
    """(EHRModel_token.py:412-436).  probs: softmax for
    lenofstay/readmission/mortality, sigmoid otherwise."""
    from sklearn.metrics import average_precision_score, f1_score, roc_auc_score

    probs = np.asarray(probs)
    label_raw = np.asarray(label_raw)
    if task in MULTI_TASKS:
        if label_raw.ndim == 1:
            onehot = np.zeros((label_raw.size, num_class))
            onehot[np.arange(label_raw.size), label_raw.astype(int)] = 1
        else:
            onehot = label_raw
        auroc = roc_auc_score(onehot, probs, average="micro")
        aupr = average_precision_score(onehot, probs, average="micro")
        f1 = f1_score(onehot, (probs >= 0.2).astype(int), average="weighted")
    else:
        p1 = probs[:, 1]
        auroc = roc_auc_score(label_raw, p1)
        aupr = average_precision_score(label_raw, p1)
        f1 = f1_score(label_raw, (p1 > 0.5).astype(int))
    return {"auc": float(auroc), "aupr": float(aupr), "f1": float(f1)}


def task_probs(task: str, logits: jax.Array) -> jax.Array:
    if task in ("lenofstay", "readmission", "mortality"):
        return jax.nn.softmax(logits, axis=-1)
    return jax.nn.sigmoid(logits)


def task_loss(task: str, logits: jax.Array, label_onehot: jax.Array) -> jax.Array:
    if task == "lenofstay":
        return jnp.mean(
            optax.softmax_cross_entropy(logits, label_onehot)
        )
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits, label_onehot)
    )


# ----------------------------------------------------------- splitting -----

def stratified_split(labels: np.ndarray, task: str, seed: int = 42):
    """80/10/10 via two stratified splits (MedTok_EHR.py:163-175)."""
    from sklearn.model_selection import train_test_split

    strat = None if task in ("phenotype", "drugrec") else labels
    idx = np.arange(len(labels))
    train_idx, rest = train_test_split(
        idx, test_size=0.2, stratify=strat, random_state=seed
    )
    strat2 = None if strat is None else labels[rest]
    val_idx, test_idx = train_test_split(
        rest, test_size=0.5, stratify=strat2, random_state=seed
    )
    return train_idx, val_idx, test_idx


def sample_weights(labels: np.ndarray, task: str) -> np.ndarray:
    """Inverse-class-frequency weights (MedTok_EHR.py:183-189)."""
    if task in ("phenotype", "drugrec"):
        return np.ones(len(labels))
    counts = np.bincount(labels.astype(int))
    return (1.0 / counts)[labels.astype(int)]


def weighted_batches(
    feats: list[dict], weights: np.ndarray, featurizer: EHRFeaturizer,
    *, batch_size: int, rng: np.random.Generator,
) -> Iterator[EHRBatch]:
    """WeightedRandomSampler-with-replacement epoch (MedTok_EHR.py:190-193)."""
    n = len(feats)
    p = weights / weights.sum()
    order = rng.choice(n, size=n, replace=True, p=p)
    for start in range(0, n - batch_size + 1, batch_size):
        yield featurizer.collate([feats[i] for i in order[start:start + batch_size]])


# ---------------------------------------------------------------- loop ------

@dataclasses.dataclass
class EHRTrainConfig:
    task: str = "readmission"
    batch_size: int = 256
    epochs: int = 100
    lr: float = 1e-3
    num_layers: int = 4
    dropout: float = 0.5
    hidden_dim: int = 256
    input_dim: int = 64
    output_dim: int = 64
    num_heads: int = 4
    max_visits: int = 100
    max_medical_code: int = 2000
    early_stop_patience: int = 5
    seed: int = 42
    # Pallas flash attention in the encoder: True / False / "auto" (= the
    # measured HBM crossover, ops/flash_attention.py::choose_flash — flash
    # only where the dense [B,H,L,L] fp32 score tensors exceed the budget,
    # e.g. ~16 GB/layer at the reference B=256, L=2003; dense is FASTER
    # wherever it fits, so auto never picks flash at small shapes)
    flash_attention: bool | str = "auto"
    # attention matmul precision under flash: the training pipeline defaults
    # to single-pass bf16 ('default', 1.58x faster at B=256/Dh=16, ~8e-3 abs
    # — noise under dropout 0.5; the reference trains its tokenizer under
    # fp16 AMP, train_MedTok.py:99). Set 'highest' for exact-fp32 parity.
    flash_precision: str = "default"
    pe_dropout: float = 0.2   # PositionalEncoding rate (EHRModel_token.py:217)


class EHRTrainer:
    """``mesh``: optional jax.sharding.Mesh with a 'dp' axis — the train step
    then runs under shard_map with the batch sharded over devices and
    pmean'd loss/grads, the XLA/ICI equivalent of the reference's Lightning
    'ddp_find_unused_parameters_true' over all GPUs (MedTok_EHR.py:230)."""

    def __init__(self, cfg: EHRTrainConfig, embedding_table: np.ndarray,
                 num_class: int, mesh=None):
        self.cfg = cfg
        self.num_class = num_class
        if mesh is not None and mesh.size > 1:
            assert cfg.batch_size % mesh.size == 0, (
                f"batch_size {cfg.batch_size} not divisible by {mesh.size} devices"
            )
        self.mesh = mesh
        use_flash = cfg.flash_attention
        if use_flash == "auto":
            from medtok_tpu.ops.flash_attention import choose_flash

            # measured HBM crossover (dense is FASTER wherever its score
            # tensor fits — flash_speedup 0.89 at fitting shapes): flash
            # engages only where the dense path's fp32 scores blow the
            # budget. All num_layers' probs are saved as AD residuals, so
            # they all count toward the bwd-peak residency.
            L = cfg.max_medical_code + 3
            use_flash = choose_flash(
                cfg.batch_size, cfg.num_heads, L, L,
                training=True, resident_layers=cfg.num_layers,
            )
        self.model = EHRModel(
            embedding_table=jnp.asarray(embedding_table, jnp.float32),
            num_class=num_class,
            input_dim=cfg.input_dim, output_dim=cfg.output_dim,
            num_heads=cfg.num_heads, hidden_dim=cfg.hidden_dim,
            num_layers=cfg.num_layers, dropout=cfg.dropout,
            use_flash=bool(use_flash), flash_precision=cfg.flash_precision,
            pe_dropout=cfg.pe_dropout,
        )
        self.tx = self._make_tx(steps_per_epoch=1)
        self._train_step = self._build_train_step()
        self._eval_step = jax.jit(self._eval_step_impl)

    def _make_tx(self, steps_per_epoch: int) -> optax.GradientTransformation:
        """Adam + torch CosineAnnealingLR(T_max=10, eta_min=1e-3) parity,
        stepped per EPOCH (EHRModel_token.py:563-564 via Lightning's default
        per-epoch scheduler interval). torch's closed form
        lr_t = eta_min + (lr0-eta_min)*(1+cos(pi*epoch/T_max))/2 is PERIODIC
        (rises back after T_max) — not a monotonic decay."""
        cfg = self.cfg
        eta_min, t_max = 1e-3, 10.0
        spe = max(steps_per_epoch, 1)

        def sched(step):
            epoch = step // spe
            return eta_min + (cfg.lr - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * epoch / t_max)
            )

        self._lr_schedule = sched  # exposed for tests / logging
        return optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(sched),
        )

    def _build_train_step(self):
        if self.mesh is None or self.mesh.size == 1:
            return jax.jit(self._train_step_impl)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from medtok_tpu.parallel.mesh import DP_AXIS

        rep = P()
        bspec = EHRBatch(*([P(DP_AXIS)] * len(EHRBatch._fields)))

        def step(params, opt_state, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))

            def loss_fn(p):
                _, logits = self.model.apply(
                    {"params": p}, batch, train=True, rngs={"dropout": rng}
                )
                return task_loss(self.cfg.task, logits, batch.label_onehot), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = jax.lax.pmean(grads, DP_AXIS)
            loss = jax.lax.pmean(loss, DP_AXIS)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, task_probs(self.cfg.task, logits)

        sharded = shard_map(
            step, mesh=self.mesh,
            in_specs=(rep, rep, bspec, rep),
            out_specs=(rep, rep, rep, P(DP_AXIS)),
            check_vma=False,
        )
        return jax.jit(sharded)

    def init(self, example: EHRBatch):
        params = self.model.init(
            {"params": jax.random.PRNGKey(self.cfg.seed),
             "dropout": jax.random.PRNGKey(self.cfg.seed + 1)},
            example, train=True,
        )["params"]
        return params, self.tx.init(params)

    def _train_step_impl(self, params, opt_state, batch: EHRBatch, rng):
        def loss_fn(p):
            _, logits = self.model.apply(
                {"params": p}, batch, train=True, rngs={"dropout": rng}
            )
            return task_loss(self.cfg.task, logits, batch.label_onehot), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, task_probs(self.cfg.task, logits)

    def _eval_step_impl(self, params, batch: EHRBatch):
        _, logits = self.model.apply({"params": params}, batch, train=False)
        return task_probs(self.cfg.task, logits)

    def evaluate(self, params, batches: list[EHRBatch]) -> dict:
        probs, raws = [], []
        for b in batches:
            probs.append(np.asarray(self._eval_step(params, b)))
            raws.append(np.asarray(b.label_raw))
        return compute_metrics(
            self.cfg.task, self.num_class,
            np.concatenate(raws), np.concatenate(probs),
        )

    def fit(
        self,
        feats_train: list[dict], weights_train: np.ndarray,
        val_batches: list[EHRBatch],
        featurizer: EHRFeaturizer,
        *,
        log_fn: Callable[[int, dict], None] | None = None,
    ):
        cfg = self.cfg
        rng_np = np.random.default_rng(cfg.seed)
        self.tx = self._make_tx(
            steps_per_epoch=max(len(feats_train) // cfg.batch_size, 1)
        )
        self._train_step = self._build_train_step()
        example = featurizer.collate([feats_train[0]] * min(2, len(feats_train)))
        params, opt_state = self.init(example)
        key = jax.random.PRNGKey(cfg.seed + 2)

        best = {"aupr": -1.0}
        best_params = params
        patience = 0
        loss = jnp.asarray(float("nan"))  # no train batch yet (tiny datasets)
        for epoch in range(cfg.epochs):
            for batch in weighted_batches(
                feats_train, weights_train, featurizer,
                batch_size=cfg.batch_size, rng=rng_np,
            ):
                key, sub = jax.random.split(key)
                params, opt_state, loss, _ = self._train_step(
                    params, opt_state, batch, sub
                )
            metrics = self.evaluate(params, val_batches)
            if log_fn:
                log_fn(epoch, {"val": metrics, "loss": float(loss)})
            if metrics["aupr"] > best["aupr"]:
                best, best_params, patience = metrics, params, 0
            else:
                patience += 1
                if patience >= cfg.early_stop_patience:  # EarlyStopping
                    break
        return best_params, best


def prepare_task_features(
    dataset: list[list[dict]], labels: np.ndarray, num_class: int, task: str,
    *, vocab_size: int, max_visits: int = 100, max_medical_code: int = 2000,
) -> tuple[list[dict], EHRFeaturizer]:
    """First-sample-per-patient featurization (dataloader.py:114)."""
    featurizer = EHRFeaturizer(
        vocab_size=vocab_size, max_visits=max_visits,
        max_medical_code=max_medical_code,
    )
    feats = []
    for i, d in enumerate(dataset):
        vec = make_label_vec(
            labels[i] if task in MULTI_TASKS and labels.ndim == 2 else labels[i],
            num_class, task,
        )
        feats.append(featurizer.featurize(d[0], vec, labels[i]))
    return feats, featurizer
