#!/usr/bin/env python
"""LLFF-recipe convergence study (VERDICT r2 item 2): drive the REAL CLI
(cli/run_plnerf) — NDC rays, raw_noise_std=1e0, pool batching, the exact
llff_linear / llff_constant recipe surface — on the synthetic forward-
facing fixture (plnerf.data.synthetic.make_llff_fixture, poses_bounds.npy
layout) and record held-out PSNR/SSIM curves to convergence_runs.jsonl.

Training runs in segments: each segment extends --num_iterations and
auto-resumes from the latest checkpoint, then the standalone ``test``
task renders the llffhold split — so the curve also exercises
resume + args.json round-trip + NDC eval through the production driver.

Usage: python tools/llff_study.py [--recipes linear,constant]
       [--segments 2000,4000,8000,12000]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
OUT = "convergence_runs.jsonl"


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def build_fixture():
    scene_dir = os.path.join(CACHE, "llff_ff")
    marker = os.path.join(scene_dir, "poses_bounds.npy")
    if not os.path.exists(marker):
        from plnerf.data.synthetic import make_llff_fixture

        print("rendering forward-facing fixture (one-time)...", flush=True)
        make_llff_fixture(scene_dir, n=12, H=120, W=160)
    return CACHE, "llff_ff"


def parse_metrics(path):
    vals = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"(\w+): ([-\d.einf]+)", line.strip())
            if m:
                try:
                    vals[m.group(1)] = float(m.group(2))
                except ValueError:
                    pass
    return vals


def run_recipe(mode: str, segments, ckpt_root: str):
    from plnerf.cli.run_plnerf import main as plnerf_main

    data_dir, scene_id = build_fixture()
    exp = f"llff_{mode}"
    ns, ni = (128, 64) if mode == "linear" else (64, 64)
    base = [
        "--dataset", "llff", "--factor", "1", "--llffhold", "8",
        "--N_rand", "1024", "--N_samples", str(ns),
        "--N_importance", str(ni), "--use_viewdirs",
        "--raw_noise_std", "1e0", "--mode", mode,
        "--color_mode", "midpoint",
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_root, "--expname", exp,
        "--mlp_dtype", "bfloat16", "--steps_per_dispatch", "100",
        "--i_print", "500", "--i_img", "10000000",
        "--i_testset", "10000000", "--i_video", "10000000",
        "--i_weights", str(segments[0]),
    ]
    t0 = time.time()
    for seg in segments:
        plnerf_main(base + ["--task", "train",
                            "--num_iterations", str(seg)])
        # dataset/data_dir/scene_id are _TEST_OVERRIDES (CLI wins over
        # args.json), so the llff surface must be respecified here
        plnerf_main([
            "--task", "test", "--ckpt_dir", ckpt_root, "--expname", exp,
            "--data_dir", data_dir, "--scene_id", scene_id,
            "--dataset", "llff",
        ])
        mdir = os.path.join(ckpt_root, exp,
                            f"test_images_{mode}_{ns}_{ni}{scene_id}")
        vals = parse_metrics(os.path.join(mdir, "metrics.txt"))
        emit({"run": f"llff-{mode}", "iter": seg,
              "psnr": round(vals.get("psnr", float("nan")), 2),
              "ssim": round(vals.get("ssim", float("nan")), 4),
              "final": seg == segments[-1],
              "elapsed_s": round(time.time() - t0, 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", default="linear,constant")
    ap.add_argument("--segments", default="2000,4000,8000,12000")
    ap.add_argument("--ckpt_root", default="/tmp/llff_study")
    args = ap.parse_args()
    segments = [int(s) for s in args.segments.split(",")]
    for mode in args.recipes.split(","):
        run_recipe(mode, segments, args.ckpt_root)


if __name__ == "__main__":
    main()
