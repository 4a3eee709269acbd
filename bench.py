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

Robustness: the axon TPU tunnel in this container intermittently stalls
RPCs for minutes (see memory: axon-tpu-relay-flakiness).  Measurement runs
in rounds with a SIGALRM watchdog; if the deadline fires after at least
one completed round, the best completed round is reported rather than
hanging the driver.

Prints exactly ONE JSON line on stdout.
"""
from __future__ import annotations

import json
import signal
import sys
import time


V100_REFERENCE_RAYS_PER_SEC = 2800.0
TARGET_MULTIPLIER = 5.0
PER_CHIP_TARGET = TARGET_MULTIPLIER * V100_REFERENCE_RAYS_PER_SEC / 8.0

N_RAND = 8192        # per-chip ray batch (16384 exceeds v5e HBM w/o remat)
INNER = 10           # optimization steps fused into one dispatch
                     # (lax.scan; amortizes the 30-45 ms tunnel dispatch
                     # latency against the ~2.4 ms device step)
STEPS_PER_ROUND = 20         # dispatches per round => 200 steps/round
N_ROUNDS = 3
DEADLINE_S = 420


class _Deadline(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Deadline()


def main():
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(DEADLINE_S)

    mcfg = ModelConfig()
    rcfg = RenderConfig(
        n_samples=64, n_importance=128, mode="constant",
        color_mode="midpoint", white_bkgd=True, perturb=True,
        raw_noise_std=0.0, mlp_dtype="bfloat16",
    )
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg)
    state = train_step.init_state(jax.random.key(0), setup)
    stepf = train_step.make_multi_train_step(setup, INNER)

    k1, k2 = jax.random.split(jax.random.key(1))
    rays_d = jax.random.normal(k1, (N_RAND, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    origins = jax.random.normal(k2, (N_RAND, 3)) * 0.1
    rays = jnp.concatenate(
        [origins, rays_d, jnp.full((N_RAND, 1), 2.0),
         jnp.full((N_RAND, 1), 6.0), rays_d], axis=-1,
    )
    batch = {
        "rays": jnp.broadcast_to(rays, (INNER,) + rays.shape),
        "target": jnp.full((INNER, N_RAND, 3), 0.5),
    }

    best = None  # fastest completed round (rays/sec)
    loss = float("nan")
    try:
        # compile + warmup (second call settles dispatch caches)
        key = jax.random.key(2)
        for _ in range(2):
            state, metrics = stepf(state, batch, key)
            jax.block_until_ready(metrics["loss"])
        print("[bench] warmup done", file=sys.stderr, flush=True)

        for r in range(N_ROUNDS):
            t0 = time.perf_counter()
            for i in range(STEPS_PER_ROUND):
                key = jax.random.fold_in(key, r * STEPS_PER_ROUND + i)
                state, metrics = stepf(state, batch, key)
            jax.block_until_ready(metrics["loss"])
            dt = time.perf_counter() - t0
            n_steps = STEPS_PER_ROUND * INNER
            rps = N_RAND * n_steps / dt
            loss = float(metrics["loss"])
            best = max(best or 0.0, rps)
            print(f"[bench] round {r}: {dt / n_steps * 1e3:.2f} "
                  f"ms/step, {rps:,.0f} rays/s", file=sys.stderr, flush=True)
    except _Deadline:
        print("[bench] deadline hit (tunnel stall?); reporting best "
              "completed round", file=sys.stderr, flush=True)
        if best is None:
            raise SystemExit("bench: no round completed before deadline")
    finally:
        signal.alarm(0)

    print(
        f"[bench] backend={jax.default_backend()} n_rand={N_RAND} "
        f"loss={loss:.4f}", file=sys.stderr, flush=True,
    )
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / PER_CHIP_TARGET, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
