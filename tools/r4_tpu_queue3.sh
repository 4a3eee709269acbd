#!/bin/bash
# Round-4 TPU queue, part 3 — spare-chip follow-ups after queue2, in
# value order.  ONE TPU process at a time (CLAUDE.md); each step bounded
# by timeout.
#   fdhealthy — the eval-time fixed-dist (close-up) claim re-measured on
#               HEALTHY coarse heads: the round-3 mobj sweep trained at
#               raw_noise_std=0 and so measured degraded-guide models
#               (BASELINE.md caveat); noise-1 is the calibrated
#               dead-coarse mitigation.
#   occ500k   — the occupancy-grid path at the reference's 500k design
#               point (decay-500): exercises the occ sidecar
#               checkpoint/resume machinery at scale and extends the
#               occ==uniform convergence claim past 50k.
#   sctrain2  — third seed for the full-scale sample-budget matrix
#               (seeds 0/1 land via r4_tpu_queue2.sh).
# Usage: bash tools/r4_tpu_queue3.sh [step]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_tpu_queue3.log
step="${1:-all}"

run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

if [ "$step" = all ] || [ "$step" = probe ]; then
  timeout 580 python -c "import jax; print(jax.devices())" || {
    echo "relay down; aborting queue" | tee -a "$LOG"; exit 1; }
fi

if [ "$step" = all ] || [ "$step" = fdhealthy ]; then
  run timeout 4000 env PYTHONUNBUFFERED=1 python tools/fixed_dist_study.py \
      --scene multiobj --noise 1.0
fi

if [ "$step" = all ] || [ "$step" = occ500k ]; then
  run timeout 10000 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode occ --scene sparse --iters 500000 --lrate_decay 500 \
      --eval_every 10000 --ckpt_dir .ckpts/long500k_occ
fi

if [ "$step" = all ] || [ "$step" = sctrain2 ]; then
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what train --iters 12000 --budgets 192,96,48,24 --seed 2
fi
