"""Sinusoidal positional encoding.

Behavior matches the reference ``Embedder`` (run_nerf_helpers.py:24-72):
log-spaced frequency bands 2^0 .. 2^(multires-1), channel order
``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]`` with the raw input
included first.  The depth-experiments variant
(depth_supervised_exps/model/run_nerf_helpers.py:100-147) additionally
multiplies the argument by pi: ``sin(pi * f * x)``.

Implemented as a single broadcast + interleave (no Python loop over
frequency lambdas): everything fuses into the downstream matmul under XLA.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def freq_bands(multires: int) -> np.ndarray:
    """Log-spaced bands 2**linspace(0, multires-1, multires)."""
    return 2.0 ** np.linspace(0.0, multires - 1, multires)


def embed(x: jnp.ndarray, multires: int, pi_bands: bool = False) -> jnp.ndarray:
    """gamma(x): [..., d] -> [..., d * (1 + 2*multires)].

    Channel order matches the reference embedder exactly (input first, then
    per-frequency sin, cos blocks of d channels each).
    """
    if multires <= 0:
        return x
    bands = jnp.asarray(freq_bands(multires), dtype=x.dtype)
    if pi_bands:
        bands = bands * np.pi
    # [..., F, d]
    xb = x[..., None, :] * bands[:, None]
    s, c = jnp.sin(xb), jnp.cos(xb)
    # interleave per-frequency: [..., F, 2, d] -> [..., 2F*d]
    sc = jnp.stack([s, c], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)


def embed_dim(d: int, multires: int) -> int:
    if multires <= 0:
        return d
    return d * (1 + 2 * multires)
