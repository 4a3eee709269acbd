"""Benchmark: training-step ray throughput on the real TPU chip.

Headline metric (BASELINE.md): rays/sec/chip for the full hierarchical
training step at the blender recipe's sample counts (N_samples=64 +
N_importance=128, constant mode — the heavier of the two shipped recipes),
8x256 MLPs, viewdirs, white background — i.e. one fused jit containing
render (coarse+fine), loss, backward, and both Adam updates.

Baseline derivation (the reference publishes no numbers, BASELINE.md):
nerf-pytorch-style training on a V100 runs the 1024-ray / 64+192-eval step
at roughly 2.5-3 it/s => ~2,800 rays/s.  The north-star target is >=5x
V100 throughput on a v5e-8 at matched PSNR (BASELINE.json), i.e.
5 * 2800 = 14,000 rays/s aggregate => 1,750 rays/s/chip.  vs_baseline
reported here is measured_rays_per_sec_per_chip / 1750.

Prints exactly ONE JSON line on stdout.
"""
from __future__ import annotations

import json
import sys
import time


V100_REFERENCE_RAYS_PER_SEC = 2800.0
TARGET_MULTIPLier = 5.0
PER_CHIP_TARGET = TARGET_MULTIPLier * V100_REFERENCE_RAYS_PER_SEC / 8.0


def main():
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    n_rand = 4096          # per-chip ray batch (keeps the MXU fed)
    n_steps = 30

    mcfg = ModelConfig()
    rcfg = RenderConfig(
        n_samples=64, n_importance=128, mode="constant", color_mode="midpoint",
        white_bkgd=True, perturb=True, raw_noise_std=0.0,
        mlp_dtype="bfloat16",
    )
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg)
    state = train_step.init_state(jax.random.key(0), setup)
    stepf = train_step.make_train_step(setup)

    k1, k2 = jax.random.split(jax.random.key(1))
    rays_d = jax.random.normal(k1, (n_rand, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    origins = jax.random.normal(k2, (n_rand, 3)) * 0.1
    rays = jnp.concatenate(
        [origins, rays_d, jnp.full((n_rand, 1), 2.0),
         jnp.full((n_rand, 1), 6.0), rays_d], axis=-1,
    )
    batch = {"rays": rays, "target": jnp.full((n_rand, 3), 0.5)}

    # compile + warmup
    key = jax.random.key(2)
    state, metrics = stepf(state, batch, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        key = jax.random.fold_in(key, i)
        state, metrics = stepf(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = n_rand * n_steps / dt
    print(
        f"[bench] backend={jax.default_backend()} n_rand={n_rand} "
        f"steps={n_steps} dt={dt:.3f}s loss={float(metrics['loss']):.4f}",
        file=sys.stderr,
    )
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / PER_CHIP_TARGET, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
