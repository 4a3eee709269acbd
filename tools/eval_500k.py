#!/usr/bin/env python
"""Paper eval protocols on the 500k DESIGN-POINT checkpoints (VERDICT r4
item 1): the 500k/decay-500 runs (.ckpts/long500k{,_const}, trained by
tools/convergence_run.py on the 160^2 SPARSE spheres scene) are the only
trained-to-completion models in the repo, yet the paper's two trained-model
protocols — ``test_fixed_dist`` (reference run_plnerf.py:1497-1560) and
``test_samples_error`` (:1562-1578 / :218-282) — had only ever run on
8-15k-iter models.  This tool closes that:

1. writes the sparse scene the 500k models were trained on to disk in
   blender layout (SAME cached renders/poses/splits convergence_run used);
2. builds a fixed-dist eval set for it (radius 4*dist test rings,
   dist in {0.25, 0.5, 0.75, 1.0}, reference near planes
   {1e-4, 0.5, 1.0, 2.0} — cli.run_plnerf.FIXED_DIST_NEAR);
3. converts each 500k tool-checkpoint (a {state, key, elapsed} msgpack)
   into a CLI exp dir holding the bare TrainState, so the REAL drivers'
   eval tasks load it through the production restore path;
4. runs ``--task test_fixed_dist`` and ``--task test_samples_error`` per
   mode and appends rows to convergence_runs.jsonl
   (run=fixdist500k-{mode} / samples500k-{mode}).

Eval-only TPU cost; no training.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "tools", ".cache")
OUT = os.path.join(REPO, "convergence_runs.jsonl")
DISTS = (0.25, 0.5, 0.75, 1.0)


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def write_sparse_scene(name="sparse500k"):
    """The EXACT dataset the 500k models trained on — cache-hit of
    make_multi_object_dataset(30, 6, 160^2, slab=False), written as
    transforms_{train,val,test}.json + pngs.  val reuses the first test
    view (the loader requires the split; no task here consumes it)."""
    import cv2

    from plnerf.data.synthetic import make_multi_object_dataset

    basedir = os.path.join(CACHE, name)
    if os.path.exists(os.path.join(basedir, "transforms_test.json")):
        return CACHE, name
    d = make_multi_object_dataset(n_train=30, n_test=6, H=160, W=160,
                                  cache_dir=CACHE, slab=False)
    H, W = d["images"].shape[1:3]
    focal = d["hwf"][2]
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)
    os.makedirs(basedir, exist_ok=True)
    splits = {"train": list(d["i_train"]),
              "val": [int(d["i_test"][0])],
              "test": list(d["i_test"])}
    for split, idxs in splits.items():
        frames = []
        sdir = os.path.join(basedir, split)
        os.makedirs(sdir, exist_ok=True)
        for j, gi in enumerate(idxs):
            img = d["images"][int(gi)]
            cv2.imwrite(os.path.join(sdir, f"r_{j}.png"),
                        cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(
                            np.uint8), cv2.COLOR_RGB2BGR))
            frames.append({"file_path": f"./{split}/r_{j}",
                           "transform_matrix":
                               np.asarray(d["poses"][int(gi)]).tolist()})
        with open(os.path.join(basedir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": float(camera_angle_x),
                       "frames": frames}, f)
    return CACHE, name


def build_fixed_dist_eval_sparse(H=160, W=160, density=80.0, n_test=6):
    """radius_{dist}_test rings of the SAME sparse scene from camera
    radius 4*dist (blender_fixeddist layout).  phi in [-80, -50] keeps
    the close cameras above the spheres — the close-up sample-placement
    stress the protocol wants; GT marched from near 1e-3 at 1024 steps."""
    import cv2

    from plnerf.data.synthetic import pose_spherical_np, render_scene_image

    basedir = os.path.join(CACHE, "fixdist_sparse_eval")
    if os.path.exists(os.path.join(basedir,
                                   "transforms_radius1.0_train.json")):
        return CACHE, "fixdist_sparse_eval"
    os.makedirs(basedir, exist_ok=True)
    focal = 0.5 * W / np.tan(0.25)
    camera_angle_x = 2.0 * np.arctan(0.5 * W / focal)
    rng = np.random.default_rng(11)

    def write_split(dist, split, n):
        frames = []
        d = os.path.join(basedir, f"radius_{dist}_{split}")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            theta = -180 + 360.0 * i / n
            phi = rng.uniform(-80, -50)
            c2w = pose_spherical_np(theta, phi, 4.0 * dist)
            img, _ = render_scene_image(
                c2w, H, W, focal, density=density, slab=False,
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
    return CACHE, "fixdist_sparse_eval"


def convert_ckpt(src_ckpt: str, exp_root: str, expname: str) -> int:
    """Tool checkpoint {state, key, elapsed} -> bare TrainState in a CLI
    exp dir (the state-dict subtree IS to_state_dict(TrainState), so no
    template round-trip is needed)."""
    import flax.serialization as fser

    with open(src_ckpt, "rb") as f:
        tree = fser.msgpack_restore(f.read())
    state_sd = tree["state"]
    step = int(np.asarray(state_sd["step"]))
    dst_dir = os.path.join(exp_root, expname)
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, f"{step:06d}.ckpt")
    if not os.path.exists(dst):
        with open(dst, "wb") as f:
            f.write(fser.msgpack_serialize(state_sd))
    return step


def parse_metrics(path):
    import re

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
    ap.add_argument("--exp_root", default="/tmp/eval500k")
    ap.add_argument("--linear_ckpt",
                    default=os.path.join(REPO, ".ckpts/long500k"))
    ap.add_argument("--constant_ckpt",
                    default=os.path.join(REPO, ".ckpts/long500k_const"))
    ap.add_argument("--tasks", default="test_fixed_dist,test_samples_error")
    args = ap.parse_args()

    from plnerf.checkpoint import io as ckio
    from plnerf.cli.config import config_parser, resolve_args
    from plnerf.cli.run_plnerf import main as plnerf_main

    data_dir, scene_id = write_sparse_scene()
    eval_dir, eval_scene = build_fixed_dist_eval_sparse()
    tasks = args.tasks.split(",")

    arms = [("linear", 128, 64, args.linear_ckpt),
            ("constant", 64, 128, args.constant_ckpt)]
    for mode, ns, ni, src_dir in arms:
        src = ckio.latest_checkpoint(src_dir)
        if src is None:
            print(f"SKIP {mode}: no checkpoint under {src_dir}")
            continue
        exp = f"eval500k_{mode}"
        step = convert_ckpt(src, args.exp_root, exp)
        # eval tasks reload the training args.json (reference quirk,
        # run_plnerf.py:937-975) — write one recording the recipe the
        # 500k run actually trained (tools/convergence_run.run_nvs)
        train_argv = [
            "--task", "train", "--ckpt_dir", args.exp_root,
            "--expname", exp, "--dataset", "blender",
            "--data_dir", data_dir, "--scene_id", scene_id,
            "--white_bkgd", "--use_viewdirs", "--mode", mode,
            "--N_samples", str(ns), "--N_importance", str(ni),
            "--N_rand", "1024", "--mlp_dtype", "bfloat16",
            "--lrate_decay", "500", "--num_iterations", "500000",
            "--testskip", "1",
        ]
        if mode == "linear":
            train_argv += ["--constant_init", "1000",
                           "--precrop_iters", "500"]
        resolve_args(config_parser().parse_args(train_argv))
        base_args = [
            "--ckpt_dir", args.exp_root, "--expname", exp,
            "--dataset", "blender", "--data_dir", data_dir,
            "--scene_id", scene_id, "--white_bkgd", "--use_viewdirs",
            "--mode", mode, "--N_samples", str(ns),
            "--N_importance", str(ni), "--mlp_dtype", "bfloat16",
            "--testskip", "1",
        ]
        if "test_fixed_dist" in tasks:
            t0 = time.time()
            plnerf_main(base_args + [
                "--task", "test_fixed_dist",
                "--eval_data_dir", eval_dir,
                "--eval_scene_id", eval_scene,
            ])
            rec = {"run": f"fixdist500k-{mode}", "iter": step,
                   "final": True}
            for dist in DISTS:
                mdir = os.path.join(
                    args.exp_root, exp,
                    f"test_images_dist{dist}_{scene_id}")
                vals = parse_metrics(os.path.join(mdir, "metrics.txt"))
                rec[f"psnr_d{dist}"] = round(
                    vals.get("psnr", float("nan")), 2)
                rec[f"ssim_d{dist}"] = round(
                    vals.get("ssim", float("nan")), 4)
                if "psnr0" in vals:
                    rec[f"psnr0_d{dist}"] = round(vals["psnr0"], 2)
            rec["elapsed_s"] = round(time.time() - t0, 1)
            emit(rec)
        if "test_samples_error" in tasks:
            t0 = time.time()
            plnerf_main(base_args + ["--task", "test_samples_error"])
            mdir = os.path.join(args.exp_root, exp,
                                f"test_samples_error_{ni}")
            vals = parse_metrics(
                os.path.join(mdir, "metrics_expecteddepth.txt"))
            emit({"run": f"samples500k-{mode}", "iter": step,
                  "final": True,
                  "importance_sampling_error": round(
                      vals.get("importance_sampling_error",
                               float("nan")), 4),
                  "elapsed_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
