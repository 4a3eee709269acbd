#!/usr/bin/env python
"""Isolated fused-MLP kernel timings vs the XLA path at flagship scale
(2.63M points = 8192 rays x 321 samples, 8x256 viewdirs MLP, bf16).

Measures forward and forward+backward (sum-of-raw loss) for:
* XLA apply_mlp (the production path)
* Pallas fused kernel at tile sizes given by --tiles

Value-fetch closed (bench.py protocol).  Informs kernels/fused_mlp.py
tuning (BASELINE.md compute-floor section).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, label, rounds=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    best = None
    for r in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        v = float(out)              # value fetch
        dt = time.perf_counter() - t0
        print(f"[{label}] round {r}: {dt*1e3:.2f} ms (val {v:.3e})",
              flush=True)
        best = dt if best is None else min(best, dt)
    print(f"[{label}] BEST {best*1e3:.2f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192 * 321)
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--what", default="fwd,fwdbwd")
    ap.add_argument("--fold", default="both", choices=["both", "on", "off"],
                    help="head schedule: folded minimal-pass vs split "
                         "(fused_mlp.apply fold_heads)")
    ap.add_argument("--xla", action="store_true", default=True)
    ap.add_argument("--no-xla", dest="xla", action="store_false")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig
    from plnerf.core.mlp import apply_mlp, init_nerf_params
    from plnerf.kernels import fused_mlp

    cfg = ModelConfig()
    params = init_nerf_params(jax.random.key(0), cfg)
    N = args.n
    kx, kv = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (N, cfg.input_ch), jnp.float32)
    v = jax.random.normal(kv, (N, cfg.input_ch_views), jnp.float32)
    what = set(args.what.split(","))

    # x/v MUST be jit arguments, not closures: closed-over device arrays
    # embed as jaxpr constants and a 660 MB literal stalls compilation
    if args.xla:
        if "fwd" in what:
            f = jax.jit(lambda p, a, b: apply_mlp(p, a, b, cfg,
                                                  jnp.bfloat16).sum())
            bench(f_bound(f, params, x, v), "xla fwd")
        if "fwdbwd" in what:
            def loss(p, a, b):
                return apply_mlp(p, a, b, cfg, jnp.bfloat16).sum()

            bench(f_bound(_pair_fn(loss), params, x, v), "xla fwd+bwd")

    folds = {"both": (False, True), "on": (True,),
             "off": (False,)}[args.fold]
    for tile in [int(t) for t in args.tiles.split(",") if t]:
        for fold in folds:
            tag = f"tile={tile} fold={int(fold)}"
            if "fwd" in what:
                f = jax.jit(lambda p, a, b, t=tile, fh=fold: fused_mlp.apply(
                    p, a, b, cfg, jnp.bfloat16, tile=t,
                    fold_heads=fh).sum())
                bench(f_bound(f, params, x, v), f"pallas fwd {tag}")
            if "fwdbwd" in what:
                def loss(p, a, b, t=tile, fh=fold):
                    return fused_mlp.apply(p, a, b, cfg, jnp.bfloat16,
                                           tile=t, fold_heads=fh).sum()

                bench(f_bound(_pair_fn(loss), params, x, v),
                      f"pallas fwd+bwd {tag}")


def _pair_fn(loss):
    """value_and_grad folded into one scalar so the primal forward cannot
    be DCE'd: with grad alone, a custom-vjp forward whose residuals don't
    depend on its output is dead code — measured: the 'pair' then times
    the backward kernel only."""
    import jax

    def f(p, a, b):
        val, grads = jax.value_and_grad(loss)(p, a, b)
        return val + jax.tree.reduce(lambda s, t: s + t.sum(), grads, 0.0)

    return jax.jit(f)


def f_bound(f, *a):
    return lambda: f(*a)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
