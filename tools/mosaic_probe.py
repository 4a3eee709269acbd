"""Isolate the Mosaic matmul throughput wall: time pallas kernels that do
NOTHING but matmuls on a resident weight set, at flagship scale.

Variants per tile: (a) 13 chained [T,256]@[256,256] dots (dependency
chain, like the MLP); (b) 13 independent dots (no chain); (c) chained
dots + bias + relu (the MLP's actual per-layer op).  All bf16 operands,
f32 accum.  N = 2.63M rows to match the NeRF forward's work.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192 * 321
D = 13          # dots per tile pass (~ the MLP's count)
W = 256


def make_kernel(variant):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]

        def dot(h, w):
            return jax.lax.dot_general(
                h.astype(jnp.bfloat16), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        x = x_ref[:]
        if variant == "chained":
            h = x
            for i in range(D):
                h = dot(h, wrefs[i][:])
            out_ref[:] = h
        elif variant == "independent":
            acc = jnp.zeros_like(x, dtype=jnp.float32)
            for i in range(D):
                acc = acc + dot(x, wrefs[i][:])
            out_ref[:] = acc
        else:  # mlp-like: bias + relu between chained dots
            h = x
            for i in range(D):
                h = jnp.maximum(dot(h, wrefs[i][:]) + 0.01, 0.0)
            out_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "tile"))
def run(x, ws, variant, tile):
    n_tiles = x.shape[0] // tile
    return pl.pallas_call(
        make_kernel(variant),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * D,
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], W), jnp.float32),
    )(x, *ws)


def main():
    x = jax.random.normal(jax.random.key(0), (N, W), jnp.float32)
    x = x.astype(jnp.bfloat16)
    ws = [jax.random.normal(jax.random.key(i + 1), (W, W)).astype(
        jnp.bfloat16) * 0.05 for i in range(D)]
    flops = 2 * N * W * W * D
    for tile in (512, 1024):
        for variant in ("chained", "independent", "mlp"):
            out = run(x, ws, variant, tile)
            jax.block_until_ready(out)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(x, ws, variant, tile)
                float(out[0, 0])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"tile {tile} {variant:12s}: {best*1e3:7.2f} ms  "
                  f"{flops/best/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
