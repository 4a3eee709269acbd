#!/bin/bash
# Round-4 TPU queue, part 2: the full-scale sample-budget study — the
# "decisive experiment" the round-3 tiny-scale section explicitly defers
# to (BASELINE.md "Sample-budget robustness"; run rows tiny:true).  Runs
# AFTER the constant-mode 500k design-point run frees the chip.  ONE
# TPU process at a time (CLAUDE.md); each step bounded by timeout.
# Usage: bash tools/r4_tpu_queue2.sh [step]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_tpu_queue2.log
step="${1:-all}"
SC=/tmp/sample_count_study

run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

if [ "$step" = all ] || [ "$step" = probe ]; then
  timeout 580 python -c "import jax; print(jax.devices())" || {
    echo "relay down; aborting queue" | tee -a "$LOG"; exit 1; }
fi

if [ "$step" = all ] || [ "$step" = sctrain ]; then
  # full-scale train arms: 160^2 multiobj scene, 8x256 net, 12k iters,
  # noise-1 (calibrated dead-coarse mitigation) — budgets 192 (the full
  # recipe), 96, 48, 24; recipe split 2:1 linear / 1:2 constant.
  # Seed 0 then seed 1 (the tiny table showed seed-dependent coarse
  # health; two seeds scope the claim).
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what train --iters 12000 --budgets 192,96,48,24 --seed 0
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what train --iters 12000 --budgets 192,96,48,24 --seed 1
fi

if [ "$step" = all ] || [ "$step" = sceval ]; then
  # eval-time budget sweep on the FULL-recipe (budget-192) trained
  # models — healthy coarse heads (noise-1), so this is the clean
  # version of the paper's serve-with-fewer-samples claim (the r3
  # fixdist-model sweep measured degraded-guide models).
  run timeout 3000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what eval --scales 1,2,4,8 \
      --exps $SC/sc_linear_128_64_s0,$SC/sc_constant_64_128_s0
  run timeout 3000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what eval --scales 1,2,4,8 \
      --exps $SC/sc_linear_128_64_s1,$SC/sc_constant_64_128_s1
fi

if [ "$step" = all ] || [ "$step" = scsplit ]; then
  # guide-counterfactual split probe at full scale on the budget-24
  # models (fixed total 24, importance share 16 -> 1)
  run timeout 3000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what split --splits 8:16,16:8,20:4,23:1 \
      --exps $SC/sc_linear_16_8_s0,$SC/sc_constant_8_16_s0
fi

if [ "$step" = all ] || [ "$step" = bench ]; then
  # headline regression check (keep the best round; relay round-0 often
  # stalled)
  run timeout 1700 env PYTHONUNBUFFERED=1 python bench.py
fi
