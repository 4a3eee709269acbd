"""Volume-rendering quadrature: piecewise-constant (vanilla NeRF) and the
paper's piecewise-linear reformulation, plus compositing (``raw2outputs``).

Behavioral reference:
* ``compute_weights`` (constant)        — run_plnerf.py:504-513
* ``compute_weights_piecewise_linear``  — run_plnerf.py:516-550
* ``raw2outputs``                       — run_plnerf.py:553-624

Shapes (R rays, S samples):
  constant: weights [R, S]
  linear:   z is augmented with near/far -> S+2 boundary values, S+1
            intervals; tau [R, S+2], T [R, S+2], weights [R, S+1].

The per-ray cumulative product is expressed with ``jnp.cumprod`` which XLA
lowers to a log-depth scan on TPU; with S<=256 this is a handful of VPU
passes and is never the bottleneck (the MLP is).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

TAU_NEAR = 1e-10  # tau at the near boundary (reference run_plnerf.py:528)
TAU_FAR = 1e10    # tau at the far boundary ("will hit an opaque surface")


def compute_weights_constant(
    sigma: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
    noise: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Classic NeRF alpha compositing weights. sigma: [R, S] raw density."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma + noise) * dists)
    ones = jnp.ones_like(alpha[..., :1])
    trans = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    return alpha * trans


def compute_weights_piecewise_linear(
    sigma: jnp.ndarray, z_vals: jnp.ndarray, near: jnp.ndarray,
    far: jnp.ndarray, rays_d: jnp.ndarray, noise: jnp.ndarray | float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Piecewise-linear-density weights with exact closed-form transmittance.

    sigma: [R, S]; z_vals: [R, S]; near/far: [R, 1].
    Returns (weights [R, S+1], tau [R, S+2], T [R, S+2]).

    Under linear density the integral over an interval is the trapezoid
    0.5*(tau_i + tau_{i+1})*(s_{i+1}-s_i), so the per-interval attenuation is
    exp(-that) exactly, and T is its cumulative product.
    """
    z_aug = jnp.concatenate([near, z_vals, far], axis=-1)        # [R, S+2]
    dists = z_aug[..., 1:] - z_aug[..., :-1]                     # [R, S+1]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    tau = jnp.concatenate(
        [
            jnp.full_like(sigma[..., :1], TAU_NEAR),
            sigma + noise,
            jnp.full_like(sigma[..., :1], TAU_FAR),
        ],
        axis=-1,
    )
    tau = jax.nn.relu(tau)                                       # [R, S+2]

    interval_ave_tau = 0.5 * (tau[..., 1:] + tau[..., :-1])      # [R, S+1]
    expr = jnp.exp(-interval_ave_tau * dists)                    # [R, S+1]

    ones = jnp.ones_like(expr[..., :1])
    T = jnp.cumprod(jnp.concatenate([ones, expr], axis=-1), axis=-1)  # [R, S+2]
    weights = (1.0 - expr) * T[..., :-1]                         # [R, S+1]
    return weights, tau, T


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    rays_d: jnp.ndarray,
    mode: str,
    color_mode: str = "midpoint",
    noise: jnp.ndarray | float = 0.0,
    white_bkgd: bool = False,
    farcolorfix: bool = False,
):
    """Composite raw network output into per-ray maps.

    raw: [R, S, 4]; z_vals: [R, S]; near/far: [R, 1]; rays_d: [R, 3].
    ``noise`` is the already-drawn density regularization noise (the JAX
    analogue of the reference's in-function randn; RNG lives with the
    caller).

    Returns dict with rgb, disp, acc, weights, depth, tau, T (tau/T None in
    constant mode), mirroring the reference 7-tuple (run_plnerf.py:553-624).
    """
    rgb = jax.nn.sigmoid(raw[..., :3])  # [R, S, 3]

    if mode == "linear":
        weights, tau, T = compute_weights_piecewise_linear(
            raw[..., 3], z_vals, near, far, rays_d, noise
        )
        first = rgb[:, :1, :]
        if farcolorfix:
            last = jnp.zeros_like(rgb[:, -1:, :])
        else:
            last = rgb[:, -1:, :]
        if color_mode == "midpoint":
            rgb_cat = jnp.concatenate([first, rgb, last], axis=1)  # [R, S+2, 3]
            rgb_used = 0.5 * (rgb_cat[:, 1:, :] + rgb_cat[:, :-1, :])  # [R, S+1, 3]
        elif color_mode == "left":
            rgb_used = jnp.concatenate([first, rgb], axis=1)       # [R, S+1, 3]
        elif color_mode == "tau_weighted":
            # TPU-native extra (no reference analogue): weight each
            # interval's endpoint colors by their densities — absorption
            # mass sits where tau is large, so at a hard empty->object
            # interface the interval takes the object's color instead of
            # smearing it with background.  Measured (BASELINE.md
            # quadrature-error study): fixes linear's rgb error on
            # binary media (matches constant at N<=128, 1.6x better at
            # 512) while keeping the O(h^2) rate on smooth media (at a
            # ~40x constant-factor penalty vs midpoint there — opt-in).
            rgb_cat = jnp.concatenate([first, rgb, last], axis=1)
            tl, tr = tau[..., :-1, None], tau[..., 1:, None]
            mid = 0.5 * (rgb_cat[:, 1:, :] + rgb_cat[:, :-1, :])
            tw = (tl * rgb_cat[:, :-1, :] + tr * rgb_cat[:, 1:, :]) / (
                tl + tr + 1e-12)
            # empty intervals carry ~no weight; keep midpoint there so
            # the division never amplifies noise
            rgb_used = jnp.where((tl + tr) < 1e-9, mid, tw)
        else:
            raise ValueError(f"unknown color_mode {color_mode!r}")
        rgb_map = jnp.sum(weights[..., None] * rgb_used, axis=-2)

        z_aug = jnp.concatenate([near, z_vals, far], axis=-1)
        z_mid = 0.5 * (z_aug[..., 1:] + z_aug[..., :-1])
        depth_map = jnp.sum(weights * z_mid, axis=-1)
    elif mode == "constant":
        weights = compute_weights_constant(raw[..., 3], z_vals, rays_d, noise)
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
        depth_map = jnp.sum(weights * z_vals, axis=-1)
        tau = None
        T = None
    else:
        raise ValueError(f"unknown mode {mode!r}")

    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "weights": weights,
        "depth_map": depth_map,
        "tau": tau,
        "T": T,
    }
