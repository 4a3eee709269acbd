#!/bin/bash
# Round-4 TPU backlog (VERDICT r3 "next round" items), to run AFTER the
# long500k run frees the chip.  ONE TPU process at a time (CLAUDE.md);
# each step bounded by timeout.
# Usage: bash tools/r4_tpu_queue.sh [step]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_tpu_queue.log
step="${1:-all}"

run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; }

if [ "$step" = all ] || [ "$step" = probe ]; then
  timeout 580 python -c "import jax; print(jax.devices())" || {
    echo "relay down; aborting queue" | tee -a "$LOG"; exit 1; }
fi

if [ "$step" = all ] || [ "$step" = long500k ]; then
  # item 1 — resume/continue the 500k design-point run if interrupted
  # (auto-resumes from .ckpts/long500k; no-op when already at 500k)
  run timeout 17000 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode linear --scene sparse --iters 500000 --lrate_decay 500 \
      --eval_every 10000 --ckpt_dir .ckpts/long500k
fi

if [ "$step" = all ] || [ "$step" = depthab ]; then
  # item 2 — depth-supervised vs photometric-only vs is_joint at real
  # scale (20k iters, identical compute; depth-RMSE + PSNR per arm)
  run timeout 9000 env PYTHONUNBUFFERED=1 python tools/convergence_run.py \
      --mode depth-ab --iters 20000 --eval_every 2000
fi

if [ "$step" = all ] || [ "$step" = kernel ]; then
  # item 3 — minimal-pass folded-head kernel: isolated pair + in-step
  run timeout 2400 env PYTHONUNBUFFERED=1 python tools/bench_kernel.py \
      --tiles 1024 --fold both
  run timeout 2400 env PYTHONUNBUFFERED=1 python tools/time_variants.py \
      --variants base,pallas,pallasfold
fi

if [ "$step" = all ] || [ "$step" = camemb ]; then
  # item 4 — camera-embedding study at FULL scale (replaces the
  # tiny-CPU-scale rows in convergence_runs.jsonl / BASELINE.md)
  run timeout 6000 env PYTHONUNBUFFERED=1 python tools/cam_embedding_study.py \
      --iters 8000
fi

if [ "$step" = all ] || [ "$step" = serveprof ]; then
  # item 5 — decompose the 0.78x fused-artifact gap (device-busy vs
  # wall, multi-platform vs native-only export, op tables)
  run timeout 3600 env PYTHONUNBUFFERED=1 python tools/serving_profile.py
fi

if [ "$step" = all ] || [ "$step" = bench ]; then
  # headline regression check after the kernel/config changes
  run timeout 1700 env PYTHONUNBUFFERED=1 python bench.py
fi
