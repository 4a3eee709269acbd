"""DTU-path convergence study: train the real recipes through the real
CLI on a synthetic DTU-layout scene.

Closes the last dataset-family gap in the convergence evidence: blender
(BASELINE.md round-2 studies) and LLFF (round-3 NDC study) both have
real-CLI convergence runs; the DTU path (components 1+25, reference
load_dtu.py:71-130 + run_plnerf.py:994-1018) had golden loader parity
and a 4-iter CLI smoke only.  This builds the round-2 multi-object
scene (4 spheres over a checkered slab, data/synthetic._scene_sigma_rgb)
in the EXACT DTU on-disk layout the loader consumes —
Rectified/scan{id}_train/rect_{i+1:03d}_3_r5000.png + Cameras/train
MVSNet text files with the un-inverted-extrinsic quirk and the K/4
convention (same encode math as tests/fixtures.make_dtu_scene, verified
golden vs the imported reference loader) — then trains linear (128+64)
and constant (64+128) recipes and runs ``--task test`` on the 7
held-out views.

Usage: python tools/dtu_convergence.py [--iters 8000] [--modes linear,constant]
Emits one JSONL record per mode (appended to convergence_runs.jsonl).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
SCENE_ID = 5
H = W = 128
NEAR, FAR = 2.0, 7.0


def emit(rec):
    line = json.dumps(rec)
    print(line)
    with open(os.path.join(os.path.dirname(CACHE), "..",
                           "convergence_runs.jsonl"), "a") as f:
        f.write(line + "\n")


def build_dtu_mobj_scene():
    """Multi-object scene in DTU Rectified layout (49 views, 128x128)."""
    import cv2

    from plnerf.data.dtu import N_VIEWS, _OPENCV2BLENDER
    from plnerf.data.synthetic import pose_spherical_np, render_scene_image

    root = os.path.join(CACHE, "dtu_mobj")
    img_dir = os.path.join(root, f"Rectified/scan{SCENE_ID}_train")
    cam_dir = os.path.join(root, "Cameras/train")
    if os.path.exists(os.path.join(cam_dir, f"{N_VIEWS - 1:08d}_cam.txt")):
        return root
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(cam_dir, exist_ok=True)

    focal = 0.5 * W / np.tan(0.25)
    sf = 1.0 / 200.0
    inv_cv2b = np.linalg.inv(_OPENCV2BLENDER)
    # near/far line: depth_min*sf = NEAR, depth_min + dint*192 -> FAR/sf
    depth_min = NEAR / sf
    dint = (FAR / sf - depth_min) / 192.0
    rng = np.random.default_rng(3)
    t0 = time.time()
    for i in range(N_VIEWS):
        theta = -180 + 360.0 * i / N_VIEWS
        phi = rng.uniform(-55, -12)
        c2w = pose_spherical_np(theta, phi, 4.0)
        img, _ = render_scene_image(c2w, H, W, focal, density=80.0,
                                    near=0.5, far=7.5, n_march=768)
        cv2.imwrite(os.path.join(img_dir, f"rect_{i + 1:03d}_3_r5000.png"),
                    cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        # encode: loader reads extr as-is (un-inverted quirk), applies
        # @ _OPENCV2BLENDER and scales translation by sf
        target = c2w.copy()
        target[:3, 3] /= sf
        file_extr = target @ inv_cv2b
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2],
                      [0, 0, 1]], np.float64) / 4.0
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.8f}" for v in row) for row in file_extr]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.8f}" for v in row) for row in K]
        lines += ["", f"{depth_min:.4f} {dint:.6f}"]
        with open(os.path.join(cam_dir, f"{i:08d}_cam.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"[scene] built {N_VIEWS} views in {time.time() - t0:.0f}s")
    return root


def parse_metrics(exp_dir):
    out = {}
    for d in sorted(os.listdir(exp_dir)):
        p = os.path.join(exp_dir, d, "metrics.txt")
        if d.startswith("test_images_") and os.path.exists(p):
            with open(p) as f:
                for line in f:
                    if ":" in line:
                        k, _, v = line.partition(":")
                        try:
                            out[k.strip()] = round(float(v), 4)
                        except ValueError:
                            pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--modes", default="linear,constant")
    ap.add_argument("--ckpt_dir", default="/tmp/dtu_conv")
    args = ap.parse_args()

    data_dir = build_dtu_mobj_scene()

    from plnerf.cli.run_plnerf import main as plnerf_main

    for mode in args.modes.split(","):
        ns, ni = (128, 64) if mode == "linear" else (64, 128)
        exp = f"dtu_{mode}"
        common = [
            "--dataset", "DTU", "--dtu_scene_id", str(SCENE_ID),
            "--num_train", "42", "--data_dir", data_dir,
            "--ckpt_dir", args.ckpt_dir, "--expname", exp,
            "--no_batching", "--use_viewdirs", "--white_bkgd",
            "--N_rand", "1024", "--N_samples", str(ns),
            "--N_importance", str(ni), "--mlp_dtype", "bfloat16",
            "--precrop_iters", "500", "--lrate", "5e-4",
            "--lrate_decay", "250",
        ]
        t0 = time.time()
        plnerf_main(common + [
            "--task", "train", "--mode", mode,
            "--num_iterations", str(args.iters),
            "--i_weights", str(args.iters), "--i_print", "1000",
            "--i_img", "999999", "--i_testset", "999999",
            "--i_video", "999999",
        ])
        train_s = time.time() - t0
        plnerf_main([
            "--task", "test", "--ckpt_dir", args.ckpt_dir,
            "--expname", exp, "--data_dir", data_dir, "--dataset", "DTU",
        ])
        m = parse_metrics(os.path.join(args.ckpt_dir, exp))
        emit({"run": f"dtu-mobj-{mode}", "iter": args.iters, "final": True,
              "train_s": round(train_s, 1), **m})


if __name__ == "__main__":
    main()
