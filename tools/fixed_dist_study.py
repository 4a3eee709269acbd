#!/usr/bin/env python
"""Quadrature-stability study on TRAINED models — the paper's headline
experiment (reference run_plnerf.py:1497-1560 / README.md:2-11): train
the SAME scene in linear and constant modes, then run the
``test_fixed_dist`` sweep — evaluate at camera distances
{0.25, 0.5, 0.75, 1.0} with the reference's near planes
{1e-4, 0.5, 1.0, 2.0}.  The paper's thesis: piecewise-CONSTANT
quadrature destabilizes as the near plane drops toward the object
(sample intervals straddle the surface and the left-endpoint density
convention mis-integrates), while the piecewise-LINEAR closed-form
transmittance stays stable.

Scene: the full-coverage analytic sphere used by the mesh study
(tools/mesh_from_trained.build_scene, 160^2, 40 train views at camera
radius 4); fixed-dist eval renders the same sphere from radius
4 x dist.  Both models train the real recipes (linear 128+64 /
constant 64+128, bf16).  Results append to convergence_runs.jsonl
(run=fixdist-{mode}).
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

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
OUT = "convergence_runs.jsonl"
DISTS = (0.25, 0.5, 0.75, 1.0)


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def build_fixed_dist_eval(H=160, W=160, density=300.0, n_test=8):
    """radius_{dist}_test renders of the SAME sphere (+ a minimal train
    split the loader requires), blender_fixeddist layout."""
    import cv2

    from plnerf.data.synthetic import pose_spherical_np, render_sphere_image

    basedir = os.path.join(CACHE, "fixdist_eval")
    if os.path.exists(os.path.join(basedir,
                                   "transforms_radius1.0_train.json")):
        return CACHE, "fixdist_eval"
    os.makedirs(basedir, exist_ok=True)
    focal = 0.5 * W / np.tan(0.25)
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)
    rng = np.random.default_rng(5)

    def write_split(dist, split, n):
        frames = []
        d = os.path.join(basedir, f"radius_{dist}_{split}")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            theta = -180 + 360.0 * i / n
            phi = rng.uniform(-60, 60)
            c2w = pose_spherical_np(theta, phi, 4.0 * dist)
            img = render_sphere_image(
                c2w, H, W, focal, 1.0, density, white_bkgd=True,
                near=max(4.0 * dist - 1.5, 1e-3), far=4.0 * dist + 1.5)
            cv2.imwrite(os.path.join(d, f"r_{i}.png"),
                        cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(
                            np.uint8), cv2.COLOR_RGB2BGR))
            frames.append({"file_path": f"./radius_{dist}_{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(
                basedir, f"transforms_radius{dist}_{split}.json"),
                "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x),
                       "frames": frames}, f)

    for dist in DISTS:
        write_split(dist, "test", n_test)
    write_split(1.0, "train", 2)   # loader requires a train split
    return CACHE, "fixdist_eval"


def build_multiobj_scene(n_train=30, n_val=1, n_test=4, H=160, W=160,
                         density=80.0, name="fixdist_mobj"):
    """Blender-layout DETAILED scene: the round-2 multi-object fixture
    (4 varied-albedo spheres over a high-frequency checkered slab,
    data/synthetic._scene_sigma_rgb) written as transforms_*.json + pngs
    so the real CLI trains it.  Same pose distribution as
    make_multi_object_dataset (radius 4, phi in [-55, -12]).
    ``name`` keys the cache dir — size variants must not collide."""
    import cv2

    from plnerf.data.synthetic import pose_spherical_np, render_scene_image

    basedir = os.path.join(CACHE, name)
    if os.path.exists(os.path.join(basedir, "transforms_train.json")):
        return CACHE, name
    os.makedirs(basedir, exist_ok=True)
    focal = 0.5 * W / np.tan(0.25)
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)
    rng = np.random.default_rng(0)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    n_all = sum(counts.values())
    k = 0
    for split, n in counts.items():
        frames = []
        d = os.path.join(basedir, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            theta = -180 + 360.0 * k / n_all
            phi = rng.uniform(-55, -12)
            c2w = pose_spherical_np(theta, phi, 4.0)
            img, _ = render_scene_image(c2w, H, W, focal, density=density)
            cv2.imwrite(os.path.join(d, f"r_{i}.png"),
                        cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(
                            np.uint8), cv2.COLOR_RGB2BGR))
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
            k += 1
        with open(os.path.join(basedir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x),
                       "frames": frames}, f)
    return CACHE, name


def build_fixed_dist_eval_mobj(H=160, W=160, density=80.0, n_test=6):
    """radius_{dist}_test renders of the multi-object scene from camera
    radius 4 x dist.  phi is kept in [-80, -50] so the close-distance
    cameras (radius 1.0 at dist 0.25) stay OUTSIDE every object (the big
    sphere's top is at z=0.9; the nearest camera passes ~0.1-0.25 above
    it — exactly the close-up sample-placement stress the protocol
    wants).  GT is marched from near 1e-3 with 1024 steps so the
    close-up ground truth resolves the checker."""
    import cv2

    from plnerf.data.synthetic import pose_spherical_np, render_scene_image

    basedir = os.path.join(CACHE, "fixdist_mobj_eval")
    if os.path.exists(os.path.join(basedir,
                                   "transforms_radius1.0_train.json")):
        return CACHE, "fixdist_mobj_eval"
    os.makedirs(basedir, exist_ok=True)
    focal = 0.5 * W / np.tan(0.25)
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)
    rng = np.random.default_rng(7)

    def write_split(dist, split, n):
        frames = []
        d = os.path.join(basedir, f"radius_{dist}_{split}")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            theta = -180 + 360.0 * i / n
            phi = rng.uniform(-80, -50)
            c2w = pose_spherical_np(theta, phi, 4.0 * dist)
            img, _ = render_scene_image(
                c2w, H, W, focal, density=density,
                near=1e-3, far=4.0 * dist + 3.0, n_march=1024)
            cv2.imwrite(os.path.join(d, f"r_{i}.png"),
                        cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(
                            np.uint8), cv2.COLOR_RGB2BGR))
            frames.append({"file_path": f"./radius_{dist}_{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(
                basedir, f"transforms_radius{dist}_{split}.json"),
                "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x),
                       "frames": frames}, f)

    for dist in DISTS:
        write_split(dist, "test", n_test)
    write_split(1.0, "train", 2)   # loader requires a train split
    return CACHE, "fixdist_mobj_eval"


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15000)
    ap.add_argument("--ckpt_root", default="/tmp/fixdist_study")
    ap.add_argument("--scene", default="sphere",
                    choices=("sphere", "multiobj"),
                    help="sphere = smooth solid (training-time claim); "
                         "multiobj = detailed checkered-slab scene "
                         "(eval-time claim needs high-frequency content)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modes", default="linear,constant")
    ap.add_argument("--color_mode", default="midpoint",
                    help="linear-mode color convention (midpoint | left "
                         "| tau_weighted); non-default tags the exp/run "
                         "names")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="train-time raw_noise_std; 1.0 is the calibrated "
                         "dead-coarse mitigation (BASELINE.md) — use it to "
                         "measure the eval-time claim on HEALTHY coarse "
                         "heads (the round-3 mobj sweep trained at 0.0 and "
                         "so measured degraded-guide models); non-default "
                         "tags the exp/run names")
    args = ap.parse_args()

    from plnerf.cli.run_plnerf import main as plnerf_main

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mesh_from_trained import build_scene

    if args.scene == "sphere":
        data_dir, scene_id = build_scene()      # density-300 sphere
        eval_dir, eval_scene = build_fixed_dist_eval()
    else:
        data_dir, scene_id = build_multiobj_scene()
        eval_dir, eval_scene = build_fixed_dist_eval_mobj()

    recipes = [(m, 128, 64) if m == "linear" else (m, 64, 128)
               for m in args.modes.split(",")]
    tag = "" if args.scene == "sphere" else "-mobj"
    stag = "" if args.seed == 0 else f"_s{args.seed}"
    if args.color_mode != "midpoint":
        stag += f"_{args.color_mode}"
    if args.noise != 0.0:
        stag += f"_n{args.noise:g}"
    for mode, ns, ni in recipes:
        exp = f"fd{tag.replace('-', '_')}_{mode}{stag}"
        t0 = time.time()
        train_args = [
            "--task", "train", "--dataset", "blender", "--no_batching",
            "--use_viewdirs", "--white_bkgd", "--mode", mode,
            "--N_rand", "1024", "--N_samples", str(ns),
            "--N_importance", str(ni), "--precrop_iters", "500",
            "--data_dir", data_dir, "--scene_id", scene_id,
            "--ckpt_dir", args.ckpt_root, "--expname", exp,
            "--num_iterations", str(args.iters),
            "--i_weights", str(args.iters), "--i_print", "1000",
            "--i_img", "10000000", "--i_testset", "10000000",
            "--i_video", "10000000", "--testskip", "1",
            "--mlp_dtype", "bfloat16", "--steps_per_dispatch", "100",
            "--seed", str(args.seed),
            "--raw_noise_std", str(args.noise),
        ]
        if mode == "linear":
            train_args += ["--constant_init", "1000",
                           "--color_mode", args.color_mode]
        plnerf_main(train_args)
        train_s = time.time() - t0

        plnerf_main([
            "--task", "test_fixed_dist", "--ckpt_dir", args.ckpt_root,
            "--expname", exp, "--data_dir", data_dir,
            "--scene_id", scene_id, "--white_bkgd",
            "--eval_data_dir", eval_dir, "--eval_scene_id", eval_scene,
        ])
        rec = {"run": f"fixdist{tag}-{mode}{stag}", "iter": args.iters,
               "final": True, "train_s": round(train_s, 1)}
        for dist in DISTS:
            mdir = os.path.join(args.ckpt_root, exp,
                                f"test_images_dist{dist}_{scene_id}")
            vals = parse_metrics(os.path.join(mdir, "metrics.txt"))
            rec[f"psnr_d{dist}"] = round(vals.get("psnr", float("nan")), 2)
            rec[f"ssim_d{dist}"] = round(vals.get("ssim", float("nan")), 4)
            if "psnr0" in vals:
                rec[f"psnr0_d{dist}"] = round(vals["psnr0"], 2)
        rec["elapsed_s"] = round(time.time() - t0, 1)
        emit(rec)


if __name__ == "__main__":
    main()
