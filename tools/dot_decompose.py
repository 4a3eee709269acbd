#!/usr/bin/env python
"""Mosaic per-dot-shape decomposition of the fused forward kernel's
64-vs-45 ms residual (VERDICT r2 item 1: a profile, not hypothesis
elimination).

The forward kernel (kernels/fused_mlp._kernel) executes, per [T=512]
tile, this exact dot sequence (bf16 operands, f32 accum):

    1x [T,128]@[128,256]   L0 (embedded x, padded 63->128)
    4x [T,256]@[256,256]   L1-L4
    1x [T,128]@[128,256] + 1x [T,256]@[256,256]   L5 skip (split blocks)
    2x [T,256]@[256,256]   L6, L7
    1x [T,256]@[256,384]   fused feature|alpha head
    1x [T,256]@[256,128] + 1x [T,128]@[128,128]   views layer (split)
    1x [T,128]@[128,128]   rgb head

Experiments (all at N = 8192*321 rows, resident weights, value-closed):
  A. per-shape throughput: each distinct (K, N_out) dot alone, repeated
     D times per tile -> TFLOP/s per shape.
  B. the full mixed-shape sequence (same dots, no bias/relu/concat) ->
     does SUM(per-shape) predict it, or is there a shape-SWITCHING cost?
  C. the real forward kernel (fused_mlp._forward) for reference.
  D. knobs on B: dimension_semantics=("parallel",), tile size.

Interpretation: if B ~= sum(A) ~= C, the residual is per-shape MXU
inefficiency of the narrow/mixed-K dots (table = the profile).  If
B >> sum(A), the cost is switching between dot shapes.  If C >> B, the
cost is in what the real kernel adds (bias/relu/stores).
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 8192 * 321
T = 512

# the forward's dot walk: (K, N_out, count)
WALK = [
    (128, 256, 2),   # L0 + skip x-block
    (256, 256, 7),   # L1-L4, skip h-block, L6, L7
    (256, 384, 1),   # fused feature|alpha head
    (256, 128, 1),   # views-layer feature block
    (128, 128, 2),   # views-layer v block + rgb head
]


class _Stall(Exception):
    pass


def _alarm(_s, _f):
    raise _Stall()


def bench(fn, label, rounds=4, deadline=240):
    """Per-experiment SIGALRM watchdog (bench.py pattern): a relay stall
    skips THIS experiment instead of killing the whole probe run."""
    import signal

    import jax

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(deadline)
    try:
        out = fn()
        jax.block_until_ready(out)
        best = None
        for r in range(rounds):
            t0 = time.perf_counter()
            out = fn()
            float(out.reshape(-1)[0])  # value fetch (relay-proof)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
    except _Stall:
        print(f"[{label}] STALLED (> {deadline}s) — skipped", flush=True)
        return None
    finally:
        signal.alarm(0)
    print(f"[{label}] best {best * 1e3:8.2f} ms", flush=True)
    return best


def make_shape_kernel(k, n_out, reps):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        acc = jnp_zeros((x_ref.shape[0], n_out))
        for i in range(reps):
            acc = acc + dot_bf16(x_ref[:], refs[i][:])
        out_ref[:] = acc

    return kernel


def dot_bf16(a, b):
    import jax

    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp_f32())


def jnp_zeros(shape):
    import jax.numpy as jnp

    return jnp.zeros(shape, jnp.float32)


def jnp_f32():
    import jax.numpy as jnp

    return jnp.float32


def run_shape(k, n_out, reps, tile, semantics=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.key(0), (N_ROWS, k)).astype(jnp.bfloat16)
    ws = [jax.random.normal(jax.random.key(i + 1), (k, n_out)).astype(
        jnp.bfloat16) * 0.05 for i in range(reps)]
    params = {}
    if semantics is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))

    @jax.jit
    def f(x, *ws):
        return pl.pallas_call(
            make_shape_kernel(k, n_out, reps),
            grid=(N_ROWS // tile,),
            in_specs=[pl.BlockSpec((tile, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * reps,
            out_specs=pl.BlockSpec((tile, n_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_ROWS, n_out), jnp.float32),
            **params,
        )(x, *ws)

    flops = 2 * N_ROWS * k * n_out * reps
    dt = bench(lambda: f(x, *ws), f"shape K={k:3d} N={n_out:3d} x{reps}"
               + (f" sem={semantics}" if semantics else "")
               + (f" tile={tile}" if tile != T else ""))
    if dt is None:
        return None, None
    tput = flops / dt / 1e12
    per_pass = dt / reps
    print(f"    -> {tput:6.1f} TFLOP/s   {per_pass * 1e3:6.2f} ms per "
          "single-dot pass over all rows", flush=True)
    return per_pass, tput


def make_mixed_kernel():
    """The forward's exact dot sequence, weights resident, no bias/relu."""
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        w = [r[:] for r in refs[:-1]]
        x = x_ref[:]                                   # [T, 128]
        h = dot_bf16(x, w[0]).astype(x.dtype)          # L0   [T,256]
        for i in range(1, 5):                          # L1-L4
            h = dot_bf16(h, w[i]).astype(x.dtype)
        h = (dot_bf16(x, w[5]) + dot_bf16(h, w[6])).astype(x.dtype)  # skip
        h = dot_bf16(h, w[7]).astype(x.dtype)          # L6
        h = dot_bf16(h, w[8]).astype(x.dtype)          # L7
        fa = dot_bf16(h, w[9])                         # head [T,384]
        feature = fa[:, :256].astype(x.dtype)
        hv = (dot_bf16(feature, w[10])
              + dot_bf16(x, w[11])).astype(x.dtype)    # views [T,128]
        rgb = dot_bf16(hv, w[12])                      # rgb [T,128]
        out_ref[:, :128] = rgb
        out_ref[:, 128:] = fa[:, 256:]

    return kernel


def run_mixed(tile, semantics=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shapes = [(128, 256)] + [(256, 256)] * 4 + [(128, 256), (256, 256),
              (256, 256), (256, 256), (256, 384), (256, 128), (128, 128),
              (128, 128)]
    ws = [jax.random.normal(jax.random.key(i + 1), s).astype(jnp.bfloat16)
          * 0.05 for i, s in enumerate(shapes)]
    x = jax.random.normal(jax.random.key(0), (N_ROWS, 128)).astype(
        jnp.bfloat16)
    params = {}
    if semantics is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))

    @jax.jit
    def f(x, *ws):
        return pl.pallas_call(
            make_mixed_kernel(),
            grid=(N_ROWS // tile,),
            in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ws),
            out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_ROWS, 256), jnp.float32),
            **params,
        )(x, *ws)

    flops = 2 * N_ROWS * sum(k * n for k, n in shapes)
    label = "mixed-sequence" + (f" sem={semantics}" if semantics else "") \
        + (f" tile={tile}" if tile != T else "")
    dt = bench(lambda: f(x, *ws), label)
    if dt is not None:
        print(f"    -> {flops / dt / 1e12:6.1f} TFLOP/s effective",
              flush=True)
    return dt


MERGED_SHAPES = [(128, 256)] + [(256, 256)] * 4 + [(384, 256)] \
    + [(256, 256)] * 2 + [(256, 384), (384, 128), (128, 128)]


def make_merged_kernel(use_concat):
    """11-dot variant: the skip and views layers each run ONE wide dot on a
    [T, 384] operand instead of two split-block dots.  Two operand
    strategies: a VMEM scratch buffer written in place (h into lanes
    0..255 once, x into 256..383 once — no per-use copy) vs
    jnp.concatenate (the round-2 concat kernel's strategy, a [T,384]
    VPU materialization per use).  The per-dot fixed-cost model
    (t ~= 2.28 + 1.21*(K*N/32768) ms) predicts the merge saves
    2 x 2.28 ms if the operand is free."""
    def kernel(x_ref, *refs):
        buf = refs[-1]
        out_ref = refs[-2]
        w = [r[:] for r in refs[:-2]]
        x = x_ref[:]                                   # [T, 128]
        h = dot_bf16(x, w[0]).astype(x.dtype)          # L0
        for i in range(1, 5):                          # L1-L4
            h = dot_bf16(h, w[i]).astype(x.dtype)
        if use_concat:
            import jax.numpy as jnp
            h = dot_bf16(jnp.concatenate([h, x], axis=1),
                         w[5]).astype(x.dtype)         # skip merged
        else:
            buf[:, :256] = h
            buf[:, 256:] = x
            h = dot_bf16(buf[:], w[5]).astype(x.dtype)
        h = dot_bf16(h, w[6]).astype(x.dtype)          # L6
        h = dot_bf16(h, w[7]).astype(x.dtype)          # L7
        fa = dot_bf16(h, w[8])                         # head [T,384]
        feature = fa[:, :256].astype(x.dtype)
        if use_concat:
            import jax.numpy as jnp
            hv = dot_bf16(jnp.concatenate([feature, x], axis=1),
                          w[9]).astype(x.dtype)        # views merged
        else:
            buf[:, :256] = feature                     # lanes 256: keep x
            hv = dot_bf16(buf[:], w[9]).astype(x.dtype)
        rgb = dot_bf16(hv, w[10])                      # [T,128]
        out_ref[:, :128] = rgb
        out_ref[:, 128:] = fa[:, 256:]

    return kernel


def run_merged(tile, use_concat=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ws = [jax.random.normal(jax.random.key(i + 1), s).astype(jnp.bfloat16)
          * 0.05 for i, s in enumerate(MERGED_SHAPES)]
    x = jax.random.normal(jax.random.key(0), (N_ROWS, 128)).astype(
        jnp.bfloat16)

    @jax.jit
    def f(x, *ws):
        return pl.pallas_call(
            make_merged_kernel(use_concat),
            grid=(N_ROWS // tile,),
            in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ws),
            out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_ROWS, 256), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tile, 384), jnp.bfloat16)],
        )(x, *ws)

    flops = 2 * N_ROWS * sum(k * n for k, n in MERGED_SHAPES)
    label = ("merged-sequence (11 dots, "
             + ("concat" if use_concat else "scratch-buf") + ")"
             + (f" tile={tile}" if tile != T else ""))
    dt = bench(lambda: f(x, *ws), label)
    if dt is not None:
        print(f"    -> {flops / dt / 1e12:6.1f} TFLOP/s effective",
              flush=True)
    return dt


def run_real_forward(tile):
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig
    from plnerf.core.mlp import init_nerf_params
    from plnerf.kernels import fused_mlp

    cfg = ModelConfig()
    params = init_nerf_params(jax.random.key(0), cfg)
    kx, kv = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (N_ROWS, cfg.input_ch), jnp.float32)
    v = jax.random.normal(kv, (N_ROWS, cfg.input_ch_views), jnp.float32)

    f = jax.jit(lambda p, a, b: fused_mlp.apply(
        p, a, b, cfg, jnp.bfloat16, tile=tile).sum())
    return bench(lambda: f(params, x, v), f"REAL forward tile={tile}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="shapes,mixed,real")
    ap.add_argument("--tile", type=int, default=T)
    args = ap.parse_args()
    what = set(args.what.split(","))

    per_pass_times = []
    if "shapes" in what:
        print("=== A. per-shape throughput (resident weights) ===")
        for k, n_out, count in WALK:
            per_pass, tput = run_shape(k, n_out, 13, args.tile)
            if per_pass is not None:
                per_pass_times.append((k, n_out, count, per_pass, tput))
        total = sum(c * p for _, _, c, p, _ in per_pass_times)
        print(f"--- predicted forward matmul time: {total * 1e3:.2f} ms "
              "(sum of count x per-shape pass) ---", flush=True)

    if "mixed" in what:
        print("=== B. exact mixed-shape sequence ===")
        run_mixed(args.tile)
        print("=== D. knobs ===")
        run_mixed(args.tile, semantics="parallel")
        run_mixed(args.tile, semantics="arbitrary")
        if args.tile == 512:
            run_mixed(1024)
            run_mixed(2048)

    if "merged" in what:
        print("=== E. merged-dot hypothesis (skip/views as ONE wide dot) ===")
        run_mixed(args.tile)     # in-session split baseline (13 dots)
        for k, n_out in [(384, 256), (384, 128)]:
            run_shape(k, n_out, 13, args.tile)
        run_merged(args.tile, use_concat=False)
        run_merged(args.tile, use_concat=True)

    if "real" in what:
        print("=== C. real forward kernel ===")
        run_real_forward(args.tile)


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
