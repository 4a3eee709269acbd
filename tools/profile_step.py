#!/usr/bin/env python
"""Profile the flagship training step on the TPU and print the top device
ops — the measurement tool behind BASELINE.md's compute-floor analysis
(VERDICT round 1, item 4).

Usage: python tools/profile_step.py [--mode linear|constant] [--rays N]
       [--steps K] [--remat] [--occ] [--grad_accum N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="linear",
                    choices=["linear", "constant"])
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--occ", action="store_true")
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--out", default="/tmp/plnerf_profile")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    ns, ni = (128, 64) if args.mode == "linear" else (64, 128)
    occ_cfg = None
    if args.occ:
        from plnerf.core import occgrid as og

        occ_cfg = og.OccGridConfig(resolution=128, candidates=96)
        ns = 32
    rcfg = RenderConfig(n_samples=ns, n_importance=ni, mode=args.mode,
                        white_bkgd=True, perturb=True,
                        mlp_dtype="bfloat16", remat_mlp=args.remat,
                        occ=occ_cfg)
    setup = train_step.TrainSetup(mcfg=ModelConfig(), rcfg=rcfg,
                                  accum_chunks=args.grad_accum)
    state = train_step.init_state(jax.random.key(0), setup)

    n = args.rays
    k1, k2 = jax.random.split(jax.random.key(1))
    rays_d = jax.random.normal(k1, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [jax.random.normal(k2, (n, 3)) * 0.1, rays_d,
         jnp.full((n, 1), 2.0), jnp.full((n, 1), 6.0), rays_d], axis=-1)
    batch = {"rays": rays, "target": jnp.full((n, 3), 0.5)}

    if args.occ:
        from plnerf.core import occgrid as og

        stepf = train_step.make_occ_train_step(setup)
        grid = og.init_grid([-1.5] * 3, [1.5] * 3, occ_cfg)

        def run(key):
            nonlocal state, grid
            state, grid, metrics = stepf(state, grid, batch, key)
            return metrics
    else:
        stepf = train_step.make_train_step(setup)

        def run(key):
            nonlocal state
            state, metrics = stepf(state, batch, key)
            return metrics

    key = jax.random.key(2)
    for _ in range(3):  # compile + settle
        metrics = run(key)
        float(metrics["loss"])

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for i in range(args.steps):
        key = jax.random.fold_in(key, i)
        metrics = run(key)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"[profile] {args.steps} steps in {dt:.3f} s = "
          f"{dt/args.steps*1e3:.2f} ms/step (loss {loss:.4f})")

    # newest xplane.pb under out/
    from plnerf.utils import xplane

    pbs = []
    for root, _, files in os.walk(args.out):
        pbs += [os.path.join(root, f) for f in files
                if f.endswith(".xplane.pb")]
    if not pbs:
        print("no xplane.pb written (profiler unsupported through relay?)")
        return
    path = max(pbs, key=os.path.getmtime)
    total = 0.0
    print(f"[profile] top device ops ({path}):")
    for name, ms in xplane.top_device_ops(path, k=args.top):
        total += ms
        print(f"  {ms/args.steps:9.3f} ms/step  {name[:90]}")
    print(f"  ---- accounted: {total/args.steps:.2f} ms/step")


if __name__ == "__main__":
    main()
