#!/usr/bin/env python
"""Controlled ablation of the round-1 linear-mode fixture anomaly
(VERDICT.md weak #2): on the 64x64 analytic-sphere fixture trained for
1.5k iters, linear mode reported train 39.5 / test 22.0 PSNR while
constant reported 37.5 / 30.8.  Candidate causes to isolate:

  * fixture geometry (3 train views -> any method overfits; does the gap
    close with 12 views?)
  * test-time perturb=True (reference quirk preserved from
    run_plnerf.py:497)
  * constant_init warmup (default 1000 of the 1500 iters train in
    CONSTANT mode, then the run switches to linear for only 500)
  * midpoint vs left color compositing

Usage: python tools/ablate_linear.py [--only NAME] [--iters N] [--tiny]
Appends one JSON line per run to ablation_linear.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(name, mode, n_train, iters, constant_init, test_perturb,
            color_mode, tiny, seed=0):
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.data.synthetic import make_sphere_dataset
    from plnerf.eval import images as EI
    from plnerf.train import batching, step as train_step

    H = W = 32 if tiny else 64
    if tiny:
        mcfg = ModelConfig(netdepth=4, netwidth=64, skips=(2,), multires=6,
                           multires_views=2)
        ns, ni, n_rand = 32, 16, 256
    else:
        mcfg = ModelConfig()  # 8x256, full encoding — CLI defaults
        # recipe sampling counts (configs/blender_{linear,constant}.txt)
        ns, ni = (128, 64) if mode == "linear" else (64, 128)
        n_rand = 1024

    train_imgs, train_poses, hwf, K = make_sphere_dataset(
        n_views=n_train, H=H, W=W, seed=0)
    test_imgs, test_poses, _, _ = make_sphere_dataset(
        n_views=4, H=H, W=W, seed=1)

    rcfg = RenderConfig(
        n_samples=ns, n_importance=ni, mode=mode, color_mode=color_mode,
        white_bkgd=True, perturb=True, mlp_dtype="bfloat16",
    )
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg, lrate=5e-4)
    state = train_step.init_state(jax.random.key(seed), setup)

    images_j = jnp.asarray(train_imgs)
    poses_j = jnp.asarray(train_poses)
    i_train = jnp.arange(n_train)
    near, far = 2.0, 6.0

    n_inner = 50
    import dataclasses

    def make_fused(cfg_setup):
        base = train_step.build_one_step(cfg_setup)

        def fused(state, key):
            keys = jax.random.split(key, n_inner)

            def body(st, k):
                kb, ks = jax.random.split(k)
                rays, target, _ = batching.sample_one_image_batch(
                    images_j, poses_j, K, i_train, kb, n_rand, near, far,
                    True)
                return base(st, {"rays": rays, "target": target}, ks)

            st, metrics = jax.lax.scan(body, state, keys)
            return st, jax.tree.map(lambda m: m[-1], metrics)

        return jax.jit(fused, donate_argnums=(0,))

    setup_ci = dataclasses.replace(
        setup, rcfg=dataclasses.replace(rcfg, constant_init=True))
    fused_lin = make_fused(setup)
    fused_ci = make_fused(setup_ci) if constant_init > 0 else None

    key = jax.random.key(seed + 1)
    t0 = time.time()
    done = 0
    train_psnr = float("nan")
    while done < iters:
        key, ks = jax.random.split(key)
        use_ci = mode == "linear" and done < constant_init
        state, metrics = (fused_ci if use_ci else fused_lin)(state, ks)
        done += n_inner
        train_psnr = float(metrics["psnr"])  # value fetch closes the round
    train_s = time.time() - t0

    # eval exactly as round 1: render_images_with_metrics semantics
    test_rcfg = EI.test_render_config(rcfg, perturb=test_perturb)

    class DS:
        images = test_imgs
        poses = test_poses
        gt_depths = None
        gt_valid_depths = None

    ds = DS()
    ds.K = K
    ds.hwf = hwf
    ds.near, ds.far = near, far
    mm, _ = EI.render_images_with_metrics(
        state.params_coarse, state.params_fine, ds, list(range(4)),
        mcfg, test_rcfg, chunk=4096, verbose=False)
    rec = {
        "name": name, "mode": mode, "n_train": n_train, "iters": iters,
        "constant_init": constant_init, "test_perturb": test_perturb,
        "color_mode": color_mode,
        "train_psnr": round(train_psnr, 2),
        "test_psnr": round(float(mm.get("psnr")), 2),
        "test_ssim": round(float(mm.get("ssim")), 4),
        "train_seconds": round(train_s, 1),
    }
    return rec


GRID = {
    # round-1 reproduction
    "lin_base":   dict(mode="linear", n_train=3, constant_init=1000,
                       test_perturb=True, color_mode="midpoint"),
    "con_base":   dict(mode="constant", n_train=3, constant_init=0,
                       test_perturb=True, color_mode="midpoint"),
    # more train views
    "lin_12v":    dict(mode="linear", n_train=12, constant_init=1000,
                       test_perturb=True, color_mode="midpoint"),
    "con_12v":    dict(mode="constant", n_train=12, constant_init=0,
                       test_perturb=True, color_mode="midpoint"),
    # deterministic test-time sampling
    "lin_nopert": dict(mode="linear", n_train=3, constant_init=1000,
                       test_perturb=False, color_mode="midpoint"),
    # no constant-mode warmup
    "lin_noci":   dict(mode="linear", n_train=3, constant_init=0,
                       test_perturb=True, color_mode="midpoint"),
    # left-color compositing
    "lin_left":   dict(mode="linear", n_train=3, constant_init=1000,
                       test_perturb=True, color_mode="left"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default="ablation_linear.jsonl")
    args = ap.parse_args()

    names = [args.only] if args.only else list(GRID)
    for name in names:
        cfg = GRID[name]
        rec = run_one(name, iters=args.iters, tiny=args.tiny, **cfg)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
