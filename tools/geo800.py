#!/usr/bin/env python
"""Training at the reference's FULL data geometry (VERDICT r4 item 2 /
missing #2): the shipped recipes target ~100-view 800^2 blender scenes
(configs/blender_linear.txt; ray-pool build at reference
run_plnerf.py:1199-1221 — a ~64M-ray shuffled pool), but every executed
training run so far used <=160^2 / <=30-view fixtures.  This study runs
the REAL CLI at the real geometry on a procedural 800^2 scene:

  --what gen      render the 100-train/1-val/8-test 800^2 multi-object
                  scene to disk in blender layout.  Marched on the JAX
                  default backend (data/synthetic.render_scene_image_jax
                  — the numpy marcher costs ~160 s/view on this box's
                  single vCPU; the TPU does each view in <1 s).
  --what train    the flagship linear recipe (128+64, bf16, N_rand 1024,
                  decay-500) with use_batching: exercises the 64M-ray
                  pool build + host shuffle + device transfer + epoch
                  reshuffle (the default 70k iters crosses the ~62.5k-step
                  epoch boundary), with i_img/i_testset firing at real
                  800^2 shapes.  Chunked: rerunning auto-resumes from the
                  latest checkpoint.
  --what precrop  a short no_batching arm with precrop_iters 500 at
                  800^2 (precrop center-crop sampling at real shapes —
                  the reference recipe's own batching mode).
  --what eval     full 800^2 held-out test render (--task test) +
                  row emit.

``--mode constant`` (round 5) switches train/eval to the constant
recipe (blender_constant.txt: 64+128, no warmup) so the paper's core
linear-vs-constant comparison runs at the reference's real data
geometry — every earlier convergence comparison used <=160^2 fixtures.

Rows append to convergence_runs.jsonl (run=geo800-*).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "tools", ".cache")
OUT = os.path.join(REPO, "convergence_runs.jsonl")


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def gen_scene(name="geo800", H=800, W=800, n_train=100, n_val=1, n_test=8,
              density=80.0):
    """Blender-layout 800^2 multi-object scene (same geometry family as
    every convergence study: 4 spheres + checkered slab, radius-4
    cameras, phi in [-55, -12])."""
    import cv2

    from plnerf.data.synthetic import (pose_spherical_np,
                                       render_scene_image_jax)

    basedir = os.path.join(CACHE, name)
    done = os.path.join(basedir, "GEN_DONE")
    if os.path.exists(done):
        return CACHE, name
    os.makedirs(basedir, exist_ok=True)
    focal = 0.5 * W / np.tan(0.25)
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)
    rng = np.random.default_rng(0)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    n_all = sum(counts.values())
    k = 0
    t0 = time.time()
    for split, n in counts.items():
        frames = []
        d = os.path.join(basedir, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            theta = -180 + 360.0 * k / n_all
            phi = rng.uniform(-55, -12)
            c2w = pose_spherical_np(theta, phi, 4.0)
            img, _ = render_scene_image_jax(c2w, H, W, focal,
                                            density=density)
            cv2.imwrite(os.path.join(d, f"r_{i}.png"),
                        cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(
                            np.uint8), cv2.COLOR_RGB2BGR))
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
            k += 1
            if k % 10 == 0:
                print(f"[gen] {k}/{n_all} views "
                      f"({time.time() - t0:.0f} s)", flush=True)
        with open(os.path.join(basedir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x),
                       "frames": frames}, f)
    with open(done, "w") as f:
        f.write(f"{n_all} views in {time.time() - t0:.0f} s\n")
    print(f"[gen] DONE: {n_all} views at {H}x{W} in "
          f"{time.time() - t0:.0f} s", flush=True)
    return CACHE, name


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


def base_args(args, exp):
    # recipe shape follows each mode's own config (blender_linear.txt
    # 128+64 / blender_constant.txt 64+128); constant_init is the
    # linear recipe's warmup only
    ns, ni = (128, 64) if args.mode == "linear" else (64, 128)
    out = [
        "--dataset", "blender", "--data_dir", CACHE, "--scene_id",
        "geo800", "--ckpt_dir", args.ckpt_root, "--expname", exp,
        "--use_viewdirs", "--white_bkgd", "--mode", args.mode,
        "--N_samples", str(ns), "--N_importance", str(ni),
        "--N_rand", "1024", "--mlp_dtype", "bfloat16",
        "--lrate_decay", "500",
        "--testskip", "1", "--seed", "0",
    ]
    if args.mode == "linear":
        out += ["--constant_init", "1000"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", required=True,
                    choices=("gen", "train", "precrop", "eval"))
    ap.add_argument("--iters", type=int, default=70000,
                    help="train horizon; 70k crosses the ~62.5k-step "
                         "64M-ray pool epoch boundary")
    ap.add_argument("--ckpt_root", default=os.path.join(REPO, ".ckpts"))
    ap.add_argument("--mode", default="linear",
                    choices=("linear", "constant"),
                    help="train/eval arm recipe (round 5: the constant "
                         "arm puts the paper's core comparison at the "
                         "reference's real data geometry)")
    args = ap.parse_args()

    if args.what == "gen":
        gen_scene()
        return

    from plnerf.cli.run_plnerf import main as plnerf_main

    if not os.path.exists(os.path.join(CACHE, "geo800", "GEN_DONE")):
        raise SystemExit("scene not generated — run --what gen first")

    if args.what == "train":
        t0 = time.time()
        # raw_noise_std=1e0: the calibrated dead-coarse mitigation
        # (BASELINE.md) — the first geo800 attempt confirmed the seed-0
        # init trap fires at the real geometry too (coarse died at iter
        # ~3.1k, advisory printed organically); noise keeps both heads
        # alive so the study measures machinery AND a meaningful model
        plnerf_main(base_args(args, f"geo800_{args.mode}") + [
            "--task", "train", "--raw_noise_std", "1e0",
            "--num_iterations", str(args.iters),
            "--i_print", "1000", "--i_weights", "10000",
            "--i_img", "10000", "--i_testset", "25000",
            "--i_video", "100000000",
            "--steps_per_dispatch", "100",
        ])
        emit({"run": "geo800-train", "mode": args.mode,
              "iter": args.iters, "final": True,
              "elapsed_s": round(time.time() - t0, 1)})
    elif args.what == "precrop":
        t0 = time.time()
        plnerf_main(base_args(args, "geo800_precrop") + [
            "--task", "train", "--no_batching",
            "--precrop_iters", "500", "--precrop_frac", "0.5",
            "--num_iterations", "1000",
            "--i_print", "100", "--i_weights", "1000",
            "--i_img", "100000000", "--i_testset", "100000000",
            "--i_video", "100000000",
            "--steps_per_dispatch", "100",
        ])
        emit({"run": "geo800-precrop", "iter": 1000, "final": True,
              "elapsed_s": round(time.time() - t0, 1)})
    elif args.what == "eval":
        t0 = time.time()
        plnerf_main(base_args(args, f"geo800_{args.mode}") +
                    ["--task", "test"])
        ns, ni = (128, 64) if args.mode == "linear" else (64, 128)
        mdir = os.path.join(args.ckpt_root, f"geo800_{args.mode}",
                            f"test_images_{args.mode}_{ns}_{ni}geo800")
        vals = parse_metrics(os.path.join(mdir, "metrics.txt"))
        emit({"run": "geo800-eval", "mode": args.mode, "final": True,
              "psnr": round(vals.get("psnr", float("nan")), 2),
              "ssim": round(vals.get("ssim", float("nan")), 4),
              "psnr0": round(vals.get("psnr0", float("nan")), 2),
              "elapsed_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
