#!/bin/bash
# Sustained production-shape training demonstration on the real chip
# (VERDICT r3 item 2). Three legs:
#   A: 2000 uninterrupted packed steps at B=1024 (ckpt rotation under way)
#   B: same trajectory, SIGKILLed mid-run after step ~1050, then resumed
#      from the rotated checkpoint and run to step 1200
#   compare: B's post-resume metrics vs A's, step-for-step -> resume_equal
# Writes docs/TRAIN_SUSTAINED.json (bench.py folds it into its output).
set -u
cd "$(dirname "$0")/.."
STEPS=${STEPS:-2000}
BATCH=${BATCH:-1024}
KILL_AT=${KILL_AT:-1050}
B_STEPS=${B_STEPS:-1200}
# KMEANS=1: the completed --kmeans mode (kmeans-init + norm-EMA codebook,
# VERDICT r4 item 6) — same three legs; the resume leg additionally proves
# the EMA codebook/cluster state (non-gradient, usage collection) restores
# bitwise, since the step-for-step trajectory depends on it.
KMEANS=${KMEANS:-0}
# REVIVAL=1 (implies KMEANS=1): dead-code revival on the EMA codebook
# (QuantizerConfig.codebook_revival) — the variant that keeps usage healthy.
REVIVAL=${REVIVAL:-0}
KM_FLAG=""
OUT_JSON=docs/TRAIN_SUSTAINED.json
if [ "$REVIVAL" = "1" ]; then
  KM_FLAG="--kmeans --revival"
  OUT_JSON=docs/TRAIN_SUSTAINED_KMEANS_REVIVAL.json
  ROOT=${ROOT:-/tmp/train_sustained_kmr}
elif [ "$KMEANS" = "1" ]; then
  KM_FLAG="--kmeans"
  OUT_JSON=docs/TRAIN_SUSTAINED_KMEANS.json
  ROOT=${ROOT:-/tmp/train_sustained_km}
fi
ROOT=${ROOT:-/tmp/train_sustained}
rm -rf "$ROOT"; mkdir -p "$ROOT"

echo "=== leg A: $STEPS uninterrupted steps ==="
timeout 7200 python scripts/train_sustained.py run $KM_FLAG \
  --workdir "$ROOT/a" --steps "$STEPS" --batch "$BATCH" \
  --log-every 20 --ckpt-every 500 2>&1 | tail -40

echo "=== leg B: run to ~$KILL_AT, SIGKILL, resume to $B_STEPS ==="
python scripts/train_sustained.py run $KM_FLAG \
  --workdir "$ROOT/b" --steps "$B_STEPS" --batch "$BATCH" \
  --log-every 20 --ckpt-every 500 > "$ROOT/b_phase1.log" 2>&1 &
BPID=$!
for i in $(seq 1 2000); do
  s=$(tail -1 "$ROOT/b/metrics.jsonl" 2>/dev/null \
      | python -c "import sys,json;print(json.load(sys.stdin)['step'])" \
      2>/dev/null || echo 0)
  if [ "$s" -ge "$KILL_AT" ]; then kill -9 "$BPID"; echo "SIGKILL at step $s"; break; fi
  if ! kill -0 "$BPID" 2>/dev/null; then echo "leg B exited early"; break; fi
  sleep 5
done
wait 2>/dev/null
tail -3 "$ROOT/b_phase1.log"
timeout 7200 python scripts/train_sustained.py run $KM_FLAG \
  --workdir "$ROOT/b" --steps "$B_STEPS" --batch "$BATCH" \
  --log-every 20 --ckpt-every 500 2>&1 | tail -15

echo "=== compare + report ==="
python scripts/train_sustained.py compare --a "$ROOT/a" --b "$ROOT/b" \
  --from-step 1001 --out "$ROOT/resume.json"
python scripts/train_sustained.py report --workdir "$ROOT/a" --batch "$BATCH" \
  --resume-json "$ROOT/resume.json" --out "$OUT_JSON"
echo "=== done ==="
