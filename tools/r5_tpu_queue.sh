#!/bin/bash
# Round-5 TPU queue (VERDICT r4 "next round" items), in value order.
# ONE TPU process at a time (CLAUDE.md); each step bounded by timeout.
#   geo800    — item 2: train at the reference's full data geometry
#               (100-view 800^2, 64M-ray pool, 70k iters crossing the
#               epoch boundary; + precrop arm + final 800^2 eval).
#               Scene must be generated first (tools/geo800.py --what gen).
#   occ500k   — item 4: occupancy-grid path at the 500k design point
#               (sidecar stress across chunked resumes; occ==uniform
#               claim past 50k).  Auto-resumes; invoked twice so a
#               timeout costs one chunk.
#   depthab50 — item 6: depth A/B horizon extension to 50k, best arm
#               (is_joint) vs photometric control, 3 seeds.
#   ramp      — item 5: a scaled depth arm whose horizon CROSSES the
#               staged-decay window (start 4k, end 8k, 10k iters) so the
#               ramp demonstrably fires (lr emitted per cadence row).
#   sctrain2  — item 7: third seed of the full-scale sample-budget matrix.
#   bench     — item 3: validate the best-of-N eval bench; headline check.
# Usage: bash tools/r5_tpu_queue.sh [step]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_tpu_queue.log
step="${1:-all}"

run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

if [ "$step" = all ] || [ "$step" = probe ]; then
  timeout 580 python -c "import jax; print(jax.devices())" || {
    echo "relay down; aborting queue" | tee -a "$LOG"; exit 1; }
fi

if [ "$step" = all ] || [ "$step" = geo800 ]; then
  # two passes: a relay stall in pass 1 resumes from the latest ckpt
  run timeout 5800 env PYTHONUNBUFFERED=1 python tools/geo800.py --what train
  run timeout 5800 env PYTHONUNBUFFERED=1 python tools/geo800.py --what train
  run timeout 1500 env PYTHONUNBUFFERED=1 python tools/geo800.py --what precrop
  run timeout 1500 env PYTHONUNBUFFERED=1 python tools/geo800.py --what eval
fi

if [ "$step" = all ] || [ "$step" = occ500k ]; then
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode occ --scene sparse --iters 500000 --lrate_decay 500 \
      --eval_every 10000 --ckpt_dir .ckpts/long500k_occ
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode occ --scene sparse --iters 500000 --lrate_decay 500 \
      --eval_every 10000 --ckpt_dir .ckpts/long500k_occ
fi

if [ "$step" = all ] || [ "$step" = depthab50 ]; then
  for s in 0 1 2; do
    run timeout 4500 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
        --mode depth-ab --ab_arms photo,scjoint --iters 50000 \
        --eval_every 5000 --seed $s
  done
fi

if [ "$step" = all ] || [ "$step" = ramp ]; then
  run timeout 1500 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode depth --iters 10000 --eval_every 1000 \
      --start_decay 4000 --end_decay 8000
fi

if [ "$step" = all ] || [ "$step" = sctrain2 ]; then
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what train --iters 12000 --budgets 192,96,48,24 --seed 2
fi

if [ "$step" = all ] || [ "$step" = bench ]; then
  run timeout 1700 env PYTHONUNBUFFERED=1 python bench.py
fi
