#!/bin/bash
# Round-3 TPU backlog — run when the axon relay comes back.
# ONE TPU process at a time (CLAUDE.md); each step bounded by timeout.
# Usage: bash tools/r3_tpu_queue.sh [step]   (default: all, in order)
#
# STATUS 2026-08-19: relay returned; bench / sbias / evalpallas /
# servebench / tw all RAN and are written up in BASELINE.md +
# convergence_runs.jsonl.  Still pending (need more TPU-hours than a
# session): sceval (must retrain /tmp/fixdist_mobj first — /tmp was
# wiped), sctrain, long500k.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_tpu_queue.log
step="${1:-all}"

run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

if [ "$step" = all ] || [ "$step" = probe ]; then
  # cheap liveness check first — do not queue real work into a dead relay
  timeout 580 python -c "import jax; print(jax.devices())" || {
    echo "relay still down; aborting queue" | tee -a "$LOG"; exit 1; }
fi

if [ "$step" = all ] || [ "$step" = bench ]; then
  # 1. flagship bench round (keep the best; relay round-0 often stalled)
  run timeout 1700 env PYTHONUNBUFFERED=1 python bench.py
fi

if [ "$step" = all ] || [ "$step" = sceval ]; then
  # 2. full-scale eval-time sample-budget sweep on the trained multiobj
  #    models (needs /tmp/fixdist_mobj from tools/fixed_dist_study.py
  #    --scene multiobj; retrain first if the ckpts were cleaned)
  run timeout 3000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what eval --src /tmp/fixdist_mobj --scales 1,2,4,8
fi

if [ "$step" = all ] || [ "$step" = sctrain ]; then
  # 3. full-scale low-budget train arms (fresh models, noise-rescued)
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/sample_count_study.py \
      --what train --iters 12000 --budgets 96,48
fi

if [ "$step" = all ] || [ "$step" = tw ]; then
  # 4. full-scale tau_weighted linear arm on the multiobj scene (compare
  #    vs the fixdist-mobj-linear baseline row in convergence_runs.jsonl)
  run timeout 3000 env PYTHONUNBUFFERED=1 python tools/fixed_dist_study.py \
      --scene multiobj --modes linear --color_mode tau_weighted \
      --ckpt_root /tmp/fixdist_mobj_tw --iters 15000
fi

if [ "$step" = all ] || [ "$step" = sbias ]; then
  # 5. sigma_bias_init validation: does +0.1 at init rescue the dead
  #    seeds {0,7} in both recipes (BASELINE.md collapse sweep) without
  #    hurting a healthy seed (1)?  And does it rescue linear-ci0 (the
  #    dynamic billboard collapse), which is NOT an init trap?
  run timeout 3000 env PYTHONUNBUFFERED=1 python tools/collapse_seed_sweep.py \
      --variants linear,constant --seed_list 0,7,1 --sigma_bias_init 0.1 \
      --ckpt_dir /tmp/collapse_sweep_sb
  run timeout 1500 env PYTHONUNBUFFERED=1 python tools/collapse_seed_sweep.py \
      --variants linear-ci0 --seed_list 0,1 --sigma_bias_init 0.1 \
      --ckpt_dir /tmp/collapse_sweep_sb
fi

if [ "$step" = all ] || [ "$step" = evalpallas ]; then
  # 6. does the VMEM-resident Pallas forward win at EVAL (no backward)?
  run timeout 2400 env PYTHONUNBUFFERED=1 python tools/eval_pallas_probe.py
fi

if [ "$step" = all ] || [ "$step" = servebench ]; then
  # 6b. artifact-vs-inprocess eval throughput (python-chunk dispatch cost)
  run timeout 2400 env PYTHONUNBUFFERED=1 python tools/serving_bench.py
fi

if [ "$step" = long500k ]; then
  # 7. (explicit only — ~3-4 h of TPU) the FULL design range: 500k iters
  #    with the blender recipe's real decay=500 profile on the sparse
  #    fixture; evals every 10k.  Run last / alone.
  run timeout 17000 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode linear --scene sparse --iters 500000 --lrate_decay 500 \
      --eval_every 10000
fi
