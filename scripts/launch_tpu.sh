#!/usr/bin/env bash
# TPU-pod launcher — the run.sh (SLURM torchrun) equivalent for TPU VMs.
#
# Single host (one v5e-8 board): just run the CLI; jax sees all local chips
# and the trainer builds the (dp, tp) mesh over them.
#
# Multi-host (pod slices): run this script on every worker, e.g. with
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all -- bash launch_tpu.sh ...
# jax.distributed.initialize() picks up the TPU pod env automatically.
set -euo pipefail

export JAX_PLATFORMS=${JAX_PLATFORMS:-tpu}
exec python -m medtok_tpu.cli.train \
  --kg-path "${KG_PATH:-Dataset/primeKG/}" \
  --med-codes-pkg-map-path "${MED_CODES:-Dataset/medicalCode/all_codes_mappings.parquet}" \
  --text-vocab "${TEXT_VOCAB:?set TEXT_VOCAB to a bert-base-uncased vocab.txt}" \
  ${BERT_CKPT:+--bert-checkpoint "$BERT_CKPT"} \
  --results-dir "${RESULTS_DIR:-results}" \
  --global-batch-size "${GLOBAL_BATCH:-1024}" \
  --epochs "${EPOCHS:-50}" \
  "$@"
