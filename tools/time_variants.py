#!/usr/bin/env python
"""Value-fetch-closed step timings for train-step variants (the no-profiler
companion to tools/profile_step.py; measurement protocol = bench.py).

Variants: baseline flagship, remat, grad-accum (2/4), 16k-ray accum — the
evidence base for BASELINE.md's compute-floor analysis (VERDICT round 1,
item 4).

Usage: python tools/time_variants.py [--rounds N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = 10
DISPATCHES = 5


def run_variant(label, rays, remat=False, accum=1, rounds=3,
                mode="linear", ns=128, ni=64, pallas=False, fold=False):
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    rcfg = RenderConfig(n_samples=ns, n_importance=ni, mode=mode,
                        white_bkgd=True, perturb=True,
                        mlp_dtype="bfloat16", remat_mlp=remat,
                        use_pallas_mlp=pallas, pallas_fold_heads=fold)
    setup = train_step.TrainSetup(mcfg=ModelConfig(), rcfg=rcfg,
                                  accum_chunks=accum)
    state = train_step.init_state(jax.random.key(0), setup)

    k1, k2 = jax.random.split(jax.random.key(1))
    rays_d = jax.random.normal(k1, (rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rb = jnp.concatenate(
        [jax.random.normal(k2, (rays, 3)) * 0.1, rays_d,
         jnp.full((rays, 1), 2.0), jnp.full((rays, 1), 6.0), rays_d],
        axis=-1)
    batch = {"rays": jnp.broadcast_to(rb, (INNER,) + rb.shape),
             "target": jnp.full((INNER, rays, 3), 0.5)}
    stepf = train_step.make_multi_train_step(setup, INNER)

    key = jax.random.key(2)
    for _ in range(2):
        state, metrics = stepf(state, batch, key)
        jax.block_until_ready(metrics["loss"])

    best = None
    floor = rays * (ns + ns + ni + 1) * 0.99e6 * 3 / 400e12
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(DISPATCHES):
            key = jax.random.fold_in(key, r * DISPATCHES + i)
            state, metrics = stepf(state, batch, key)
        float(metrics["loss"])          # value fetch closes the round
        dt = time.perf_counter() - t0
        per_step = dt / (DISPATCHES * INNER)
        ok = per_step >= floor
        print(f"[{label}] round {r}: {per_step*1e3:.2f} ms/step, "
              f"{rays/per_step:,.0f} rays/s"
              f"{'' if ok else '  [DISCARDED: below FLOP floor]'}",
              flush=True)
        if ok and (best is None or per_step < best):
            best = per_step
    if best is not None:
        print(f"[{label}] BEST {best*1e3:.2f} ms/step "
              f"{rays/best:,.0f} rays/s", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", default="base,remat,accum2,accum4,16k")
    args = ap.parse_args()
    v = set(args.variants.split(","))
    if "base" in v:
        run_variant("base 8192", 8192, rounds=args.rounds)
    if "remat" in v:
        run_variant("remat 8192", 8192, remat=True, rounds=args.rounds)
    if "accum2" in v:
        run_variant("accum2 8192", 8192, accum=2, rounds=args.rounds)
    if "accum4" in v:
        run_variant("accum4 8192", 8192, accum=4, rounds=args.rounds)
    if "16k" in v:
        run_variant("accum2 16384", 16384, accum=2, rounds=args.rounds)
    # in-step Pallas A/B at the round-2/3 measurement point (accum2):
    # XLA base vs split-schedule kernel vs minimal-pass folded kernel
    if "pallas" in v:
        run_variant("pallas accum2 8192", 8192, accum=2,
                    rounds=args.rounds, pallas=True)
    if "pallasfold" in v:
        run_variant("pallasfold accum2 8192", 8192, accum=2,
                    rounds=args.rounds, pallas=True, fold=True)


if __name__ == "__main__":
    main()
