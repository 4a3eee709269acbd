"""Benchmark: training-step ray throughput on the real TPU chip.

Headline metric (BASELINE.md): rays/sec/chip for the full hierarchical
training step at the FLAGSHIP blender recipe — piecewise-linear mode with
N_samples=128 + N_importance=64 (configs/blender_linear.txt; 320 MLP
points/ray, the heavier of the two shipped recipes, plus the analytic
PL importance sampler) — 8x256 MLPs, viewdirs, white background: one
fused jit containing render (coarse+fine), loss, backward, and both Adam
updates, with INNER steps scan-fused per dispatch.

The single JSON line also carries ``extras`` (VERDICT round 1, item 8 —
the driver-captured record should not depend on hand-edited docs):
* ``constant_rays_per_sec``  — the constant recipe (64+128)
* ``occ_rays_per_sec``       — the flag-gated occupancy-grid path
  (32 grid-guided coarse + 64 importance; quality A/B lives in
  BASELINE.md, throughput here)
* ``eval_rays_per_sec``      — full-image 800x800 inference, linear recipe

Baseline derivation (the reference publishes no numbers, BASELINE.md):
nerf-pytorch-style training on a V100 runs the 1024-ray / 64+192-eval step
at roughly 2.5-3 it/s => ~2,800 rays/s.  The north-star target is >=5x
V100 throughput on a v5e-8 at matched PSNR (BASELINE.json), i.e.
5 * 2800 = 14,000 rays/s aggregate => 1,750 rays/s/chip.  vs_baseline
reported here is measured_rays_per_sec_per_chip / 1750 for the flagship.

Measurement integrity: through this container's axon relay
``block_until_ready`` often acks BEFORE device completion (measured
"0.12 ms/step" rounds, 30x past the chip's peak FLOP/s), so each round is
closed by materializing the loss VALUE — a device->host fetch cannot
complete early.  The fetch itself can stall on the relay, which only
makes the measurement conservative.  Rounds are additionally validated
against a per-config FLOP floor; a SIGALRM watchdog reports everything
measured so far if the relay stalls.  The flagship runs FIRST so the
primary metric survives any stall.

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
INNER = 10           # optimization steps fused into one dispatch (lax.scan)
STEPS_PER_ROUND = 5  # dispatches per round => 50 steps/round
# Deep relay stalls on a COLD process start measured 400-990 s in
# round 3 (the settle fetch absorbs them so no counted round is
# polluted); the global deadline must outlive one such stall plus the
# real measurement (~150 s of clean rounds).  If the invoking driver
# enforces a shorter timeout, that wins anyway — a generous value here
# only ever helps.
DEADLINE_S = 1500

# Results sink: updated after EVERY completed round so a relay stall (the
# SIGALRM deadline) can never lose an already-measured number — round 1
# once measured a valid flagship round and then lost it to a stall in a
# later config.
RESULTS: dict = {}

# physical sanity floor: ~0.99 MFLOP per MLP point forward (8x256 pair),
# x3 for backward, against a deliberately loose 2x-peak 400 TFLOP/s.
_PEAK_FLOPS = 400e12


def _min_step_s(points_per_ray: int) -> float:
    return N_RAND * points_per_ray * 0.99e6 * 3 / _PEAK_FLOPS


class _Deadline(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Deadline()


def _make_rays(n):
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(jax.random.key(1))
    rays_d = jax.random.normal(k1, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    origins = jax.random.normal(k2, (n, 3)) * 0.1
    return jnp.concatenate(
        [origins, rays_d, jnp.full((n, 1), 2.0), jnp.full((n, 1), 6.0),
         rays_d], axis=-1,
    )


def _bench_rounds(run_round, points_per_ray, label, n_rounds, key,
                  budget_s=180.0):
    """run_round() executes STEPS_PER_ROUND dispatches and returns the
    value-fetch-closed wall time.  Each CLEAN round immediately updates
    ``RESULTS[key]``.  Two pathologies are handled:

    * rounds FASTER than the per-config FLOP floor are premature relay
      acks -> discarded;
    * rounds slower than 50x the floor are relay STALLS (measured
      2.6-8.2 s/step vs the ~10x-floor real step) -> they do NOT become
      the recorded number while retries remain; the headline must not
      report a 410-second stalled round as throughput (observed once in
      round 3: flagship 996 rays/s, a 57x artifact).  If EVERY round
      stalled, the best stalled round is recorded anyway (conservative,
      but present) under a ``*_stalled`` marker in extras.

    Rounds stop at n_rounds or when the per-config time budget is spent
    AND a clean result exists."""
    floor = _min_step_s(points_per_ray)
    ceiling = 50.0 * floor          # relay-stall detector
    n_steps = STEPS_PER_ROUND * INNER
    spent = 0.0
    stalled_best = 0.0
    for r in range(n_rounds):
        dt = run_round(r)
        spent += dt
        per_step = dt / n_steps
        rps = N_RAND * n_steps / dt
        too_fast = per_step < floor
        stalled = per_step > ceiling
        tag = ""
        if too_fast:
            tag = "  [DISCARDED: faster than FLOP floor => premature " \
                "relay ack]"
        elif stalled:
            tag = "  [STALL: > 50x FLOP floor — retrying]"
        print(f"[bench] {label} round {r}: {per_step*1e3:.2f} ms/step, "
              f"{rps:,.0f} rays/s{tag}", file=sys.stderr, flush=True)
        if not too_fast and not stalled:
            RESULTS[key] = max(RESULTS.get(key, 0.0), rps)
        elif stalled:
            stalled_best = max(stalled_best, rps)
        if spent > budget_s and key in RESULTS:
            break
    if key not in RESULTS and stalled_best > 0.0:
        RESULTS[key] = stalled_best
        RESULTS[key + "_stalled"] = True
    return RESULTS.get(key)


def _bench_train(mode, n_samples, n_importance, n_rounds, occ=False):
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    mcfg = ModelConfig()
    occ_cfg = None
    if occ:
        from plnerf.core import occgrid as og

        occ_cfg = og.OccGridConfig(resolution=128, candidates=96)
    # production train-path default (round 4): the folded-head Pallas
    # kernel on TPU for LINEAR-mode recipes — measured 139.7 vs 148.8
    # ms/step vs XLA at the 8192-ray accum-2 point, quality parity in
    # the 8k convergence A/B (linear-sparse-pallasfold); occ-guided
    # linear gains too (122.4k vs 117.3k), but the constant recipe's
    # 64+128 budget LOSES ~5% with the kernel, so constant stays XLA
    # (mirrors cli/run_plnerf._resolve_pallas)
    pallas_on = (jax.default_backend() in ("tpu", "axon")
                 and mode == "linear")
    rcfg = RenderConfig(
        n_samples=n_samples, n_importance=n_importance, mode=mode,
        color_mode="midpoint", white_bkgd=True, perturb=True,
        raw_noise_std=0.0, mlp_dtype="bfloat16", occ=occ_cfg,
        use_pallas_mlp=pallas_on, pallas_fold_heads=pallas_on,
    )
    # Flagship runs with grad accumulation over 2 ray chunks: identical
    # recipe and update (mean of chunk means; equality-tested in
    # test_train_smoke), measured ~3% faster than the monolithic backward
    # at 8192 rays AND half the peak HBM (tools/time_variants.py).
    accum = 2 if (mode == "linear" and not occ) else 1
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg,
                                  accum_chunks=accum)
    state = train_step.init_state(jax.random.key(0), setup)

    rays = _make_rays(N_RAND)
    batch = {
        "rays": jnp.broadcast_to(rays, (INNER,) + rays.shape),
        "target": jnp.full((INNER, N_RAND, 3), 0.5),
    }

    if not occ:
        stepf = train_step.make_multi_train_step(setup, INNER)
        carry = state
    else:
        from plnerf.core import occgrid as og
        from plnerf.train.step import _apply_occ_update

        one = train_step.build_one_step(setup)

        def multi(carry, batch, key):
            keys = jax.random.split(key, INNER)

            def body(c, xs):
                st, grid = c
                b, k = xs
                st, m = one(st, dict(b, occ_grid=grid), k)
                grid, m = _apply_occ_update(setup, grid, b, m)
                return (st, grid), m

            carry, metrics = jax.lax.scan(body, carry, (batch, keys))
            return carry, jax.tree.map(lambda m: m[-1], metrics)

        stepf = jax.jit(multi, donate_argnums=(0,))
        carry = (state, og.init_grid([-1.5] * 3, [1.5] * 3, occ_cfg))

    key = jax.random.key(2)
    for _ in range(2):  # compile + settle dispatch caches
        carry, metrics = stepf(carry, batch, key)
        # VALUE fetch, not block_until_ready: the relay acks b_u_r before
        # device completion, so the common post-compile stall would
        # otherwise land inside the first COUNTED round's closing fetch
        # (measured once as a 410 s flagship round 0)
        float(metrics["loss"])

    def run_round(r):
        nonlocal carry, key
        t0 = time.perf_counter()
        for i in range(STEPS_PER_ROUND):
            key = jax.random.fold_in(key, r * STEPS_PER_ROUND + i)
            carry, metrics = stepf(carry, batch, key)
        float(metrics["loss"])   # value fetch forces real completion
        return time.perf_counter() - t0

    pts = n_samples + (n_samples + n_importance)
    label = f"{mode}{'-occ' if occ else ''} {n_samples}+{n_importance}"
    key_name = "flagship" if (mode == "linear" and not occ) else (
        "occ" if occ else "constant")
    return _bench_rounds(run_round, pts, label, n_rounds, key_name,
                         budget_s=200.0 if key_name == "flagship" else 90.0)


def _bench_eval(n_rounds=4, budget_s=120.0):
    """Full-image 800x800 inference, linear flagship recipe, bf16.

    Best-of-N rounds with the SAME relay guards as the train benches
    (VERDICT r4 weak #1: a single timed round, run LAST in the bench —
    exactly when the relay throttles to ~2.6 s/dispatch — once recorded
    143.7k rays/s while the serving profiler measured 156.4k for the
    identical path).  Each clean round updates ``RESULTS['eval']``
    immediately so a later stall cannot lose it; rounds faster than the
    forward FLOP floor are premature relay acks (discarded), rounds
    slower than 50x the floor are relay stalls (retried; recorded only
    if EVERY round stalled, under an ``eval_stalled`` marker)."""
    import numpy as np
    import jax

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.core.mlp import init_nerf_params
    from plnerf.eval import images as EI

    mcfg = ModelConfig()
    rcfg = RenderConfig(n_samples=128, n_importance=64, mode="linear",
                        white_bkgd=True, perturb=True,
                        mlp_dtype="bfloat16")
    pc = init_nerf_params(jax.random.key(0), mcfg)
    pf = init_nerf_params(jax.random.key(1), mcfg)
    H = W = 800
    focal = 0.5 * W / np.tan(0.25)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0

    def render():
        out = EI.render_image(pc, pf, c2w, (H, W, focal), K, mcfg, rcfg,
                              jax.random.key(3), chunk=32768)
        return float(np.asarray(out["rgb_map"]).sum())  # value fetch

    render()  # compile + settle (value fetch absorbs the post-compile
    # relay stall so it cannot land inside the first counted round)

    # eval FLOP floor: forward only, coarse 128 + fine 192 points/ray
    floor_s = H * W * 320 * 0.99e6 / _PEAK_FLOPS
    ceiling_s = 50.0 * floor_s
    spent = 0.0
    stalled_best = 0.0
    for r in range(n_rounds):
        t0 = time.perf_counter()
        render()
        dt = time.perf_counter() - t0
        spent += dt
        rps = H * W / dt
        too_fast = dt < floor_s
        stalled = dt > ceiling_s
        tag = ("  [DISCARDED: faster than FLOP floor]" if too_fast else
               "  [STALL: > 50x FLOP floor — retrying]" if stalled else "")
        print(f"[bench] eval 800x800 round {r}: {dt:.2f} s/img, "
              f"{rps:,.0f} rays/s{tag}", file=sys.stderr, flush=True)
        if not too_fast and not stalled:
            RESULTS["eval"] = max(RESULTS.get("eval", 0.0), rps)
        elif stalled:
            stalled_best = max(stalled_best, rps)
        if spent > budget_s and "eval" in RESULTS:
            break
    if "eval" not in RESULTS and stalled_best > 0.0:
        RESULTS["eval"] = stalled_best
        RESULTS["eval_stalled"] = True
    return RESULTS.get("eval")


def main():
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(DEADLINE_S)

    try:
        _bench_train("linear", 128, 64, n_rounds=4)
        _bench_train("constant", 64, 128, n_rounds=3)
        _bench_train("linear", 32, 64, n_rounds=3, occ=True)
        _bench_eval()
    except _Deadline:
        print("[bench] deadline hit (relay stall); reporting what "
              "completed", file=sys.stderr, flush=True)
    finally:
        signal.alarm(0)

    flagship = RESULTS.get("flagship")
    constant = RESULTS.get("constant")
    occ = RESULTS.get("occ")
    eval_rps = RESULTS.get("eval")
    if flagship is None:
        raise SystemExit("bench: no valid flagship round completed "
                         "(relay acked early or stalled); no trustworthy "
                         "measurement")
    extras = {}
    if constant:
        extras["constant_rays_per_sec"] = round(constant, 1)
    if occ:
        extras["occ_rays_per_sec"] = round(occ, 1)
    if eval_rps:
        extras["eval_rays_per_sec"] = round(eval_rps, 1)
        if RESULTS.get("eval_stalled"):
            extras["eval_all_rounds_stalled"] = True
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(flagship, 1),
        "unit": "rays/s",
        "vs_baseline": round(flagship / PER_CHIP_TARGET, 3),
        "extras": extras,
    }
    if RESULTS.get("flagship_stalled"):
        # every flagship round was relay-stalled: the value is a floor,
        # not a throughput measurement — say so in the record
        result["extras"]["flagship_all_rounds_stalled"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
