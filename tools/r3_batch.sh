#!/bin/bash
# Round-3 TPU batch: runs the convergence/geometry studies SEQUENTIALLY
# (one TPU-attached process at a time). Logs under /tmp/r3_*.log; curves
# append to convergence_runs.jsonl.
cd /root/repo
export PYTHONUNBUFFERED=1
echo "[r3] llff study start $(date)"
timeout 3000 python tools/llff_study.py > /tmp/r3_llff.log 2>&1
echo "[r3] llff done rc=$? $(date)"
timeout 1800 python tools/mesh_from_trained.py > /tmp/r3_mesh.log 2>&1
echo "[r3] mesh done rc=$? $(date)"
timeout 3000 python tools/convergence_run.py --mode linear --scene sparse \
    --iters 50000 > /tmp/r3_50k_linear.log 2>&1
echo "[r3] 50k linear done rc=$? $(date)"
timeout 3000 python tools/convergence_run.py --mode occ --scene sparse \
    --iters 50000 > /tmp/r3_50k_occ.log 2>&1
echo "[r3] 50k occ done rc=$? $(date)"
echo "[r3] ALL DONE $(date)"
