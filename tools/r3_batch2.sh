#!/bin/bash
# Round-3 TPU batch 2: rerun the fixed llff study + the full-coverage
# mesh-from-trained run (fresh fixture + ckpt dirs).
cd /root/repo
export PYTHONUNBUFFERED=1
rm -rf tools/.cache/mesh_sphere /tmp/mesh_study2
echo "[r3b2] llff rerun start $(date)"
timeout 3000 python tools/llff_study.py > /tmp/r3_llff2.log 2>&1
echo "[r3b2] llff done rc=$? $(date)"
timeout 2400 python tools/mesh_from_trained.py --ckpt_root /tmp/mesh_study2 \
    > /tmp/r3_mesh2.log 2>&1
echo "[r3b2] mesh done rc=$? $(date)"
echo "[r3b2] ALL DONE $(date)"
