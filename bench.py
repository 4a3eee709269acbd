"""Benchmark: training-step ray throughput on the real TPU chip.

Headline metric (BASELINE.md): rays/sec/chip for the full hierarchical
training step at the FLAGSHIP blender recipe — piecewise-linear mode with
N_samples=128 + N_importance=64 (configs/blender_linear.txt; 320 MLP
points/ray, the heavier of the two shipped recipes, plus the analytic
PL importance sampler) — 8x256 MLPs, viewdirs, white background: one
fused jit containing render (coarse+fine), loss, backward, and both Adam
updates, with INNER steps scan-fused per dispatch.

Baseline derivation (the reference publishes no numbers, BASELINE.md):
nerf-pytorch-style training on a V100 runs the 1024-ray / 64+192-eval step
at roughly 2.5-3 it/s => ~2,800 rays/s.  The north-star target is >=5x
V100 throughput on a v5e-8 at matched PSNR (BASELINE.json), i.e.
5 * 2800 = 14,000 rays/s aggregate => 1,750 rays/s/chip.  vs_baseline
reported here is measured_rays_per_sec_per_chip / 1750.

Measurement integrity: through this container's axon relay
``block_until_ready`` often acks BEFORE device completion (measured
"0.12 ms/step" rounds, 30x past the chip's peak FLOP/s), so each round is
closed by materializing the loss VALUE — a device->host fetch cannot
complete early.  The fetch itself can stall on the relay, which only
makes the measurement conservative.  Rounds are additionally validated
against a FLOP floor; a SIGALRM watchdog reports the best valid round if
the relay stalls outright.

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

N_RAND = 8192        # per-chip ray batch (16384 exceeds v5e HBM)
INNER = 10           # optimization steps fused into one dispatch (lax.scan)
STEPS_PER_ROUND = 10  # dispatches per round => 100 steps/round
N_ROUNDS = 3
DEADLINE_S = 420

# physical sanity floor: fwd+bwd+opt FLOPs per step / generous peak.
# points/step = N_RAND * (128 coarse + 192 fine); ~0.99 MFLOP per point
# forward for the 8x256 MLP pair; x3 for backward.
_FLOPS_PER_STEP = N_RAND * 320 * 0.99e6 * 3
_PEAK_FLOPS = 400e12            # ~2x the v5e bf16 peak: deliberately loose
MIN_STEP_S = _FLOPS_PER_STEP / _PEAK_FLOPS


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
        n_samples=128, n_importance=64, mode="linear",
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

    best = None  # fastest VALID completed round (rays/sec)
    try:
        # compile + warmup (second call settles dispatch caches)
        key = jax.random.key(2)
        for _ in range(2):
            state, metrics = stepf(state, batch, key)
            jax.block_until_ready(metrics["loss"])
        print(f"[bench] warmup done (flop floor {MIN_STEP_S*1e3:.1f} "
              f"ms/step)", file=sys.stderr, flush=True)

        n_steps = STEPS_PER_ROUND * INNER
        for r in range(N_ROUNDS):
            t0 = time.perf_counter()
            for i in range(STEPS_PER_ROUND):
                key = jax.random.fold_in(key, r * STEPS_PER_ROUND + i)
                state, metrics = stepf(state, batch, key)
            loss_val = float(metrics["loss"])   # forces real completion
            dt = time.perf_counter() - t0
            per_step = dt / n_steps
            rps = N_RAND * n_steps / dt
            valid = per_step >= MIN_STEP_S
            tag = "" if valid else "  [DISCARDED: faster than FLOP floor"\
                " => premature relay ack]"
            print(f"[bench] round {r}: {per_step*1e3:.2f} ms/step, "
                  f"{rps:,.0f} rays/s{tag}", file=sys.stderr, flush=True)
            if valid:
                best = max(best or 0.0, rps)
    except _Deadline:
        print("[bench] deadline hit (relay stall); reporting best valid "
              "round so far", file=sys.stderr, flush=True)
        if best is None:
            raise SystemExit("bench: no valid round completed")
    finally:
        signal.alarm(0)

    if best is None:
        raise SystemExit("bench: every round was below the FLOP floor "
                         "(relay acked early); no trustworthy measurement")
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / PER_CHIP_TARGET, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
