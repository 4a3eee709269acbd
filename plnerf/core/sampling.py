"""Stratified and importance samplers.

* ``stratified_z_vals``      — coarse pass sampling (run_plnerf.py:683-705)
* ``sample_pdf``             — classic NeRF inverse-CDF over mid-bins
                               (run_nerf_helpers.py:241-284)
* ``sample_pdf_reformulation`` — the paper's analytic, differentiable
  inverse-CDF for piecewise-linear density (run_nerf_helpers.py:340-445):
  per-interval case split on the sign of the tau slope with closed-form
  quadratic roots, epsilon-clamped everywhere so gradients stay finite, and
  a NaN fallback to the left bin edge.
* ``joint`` variants share one uniform draw across all rays of the batch
  (depth_supervised_exps/model/run_nerf_helpers.py:397-868).

TPU-first design notes: the per-ray ``searchsorted`` is expressed as a
vectorized comparison-count (``sum(cdf <= u)``) — an O(N*B) VPU-friendly
broadcast instead of a serial binary search; all gathers are
``take_along_axis`` with clipped indices (the reference's det path can
produce an out-of-range gather at u=1.0; clipping reproduces the in-range
behavior and makes the edge case well-defined).

RNG discipline: samplers take the uniform draws ``u`` explicitly.  Use
``draw_u`` to generate them from a jax PRNG key (matching det / random /
joint semantics), or feed cached / numpy-seeded values for parity tests and
the depth-supervision cached-u path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    lindisp: bool = False,
    t_rand: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Coarse z values: linspace in depth (or disparity), optionally
    stratified-jittered within mid-bins.  near/far: [R, 1].

    t_rand: [R, S] uniforms for the jitter, or None for no perturbation.
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)

    if t_rand is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def draw_u(
    key: jax.Array, n_rays: int, n_samples: int, det: bool, joint: bool = False
) -> jnp.ndarray:
    """Uniform draws for the importance samplers, [n_rays, n_samples].

    det: linspace(0, 1, n) broadcast to all rays (reference det path).
    joint: one random vector shared by every ray (depth-exps joint mode).
    """
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        return jnp.broadcast_to(u, (n_rays, n_samples))
    if joint:
        u = jax.random.uniform(key, (n_samples,))
        return jnp.broadcast_to(u, (n_rays, n_samples))
    return jax.random.uniform(key, (n_rays, n_samples))


def searchsorted_right(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Batched searchsorted(side='right'): for each u, the number of cdf
    entries <= u.  cdf: [R, B] (sorted along -1), u: [R, N] -> int32 [R, N].

    Vectorized comparison-count: O(N*B) elementwise ops on the VPU beats a
    per-ray serial binary search on TPU for the bin counts used here
    (B <= ~260).
    """
    return jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )


def _gather(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """vals: [R, B], idx: [R, N] -> [R, N], indices clipped to range.

    Written as a masked sum rather than take_along_axis: profiled on v5e,
    XLA lowers the per-ray gathers here to ~16 ms fusions per 1M elements,
    while this comparison-select form fuses into a single VPU pass (the
    same structure as searchsorted_right, which never shows in profiles).
    """
    idx = jnp.clip(idx, 0, vals.shape[-1] - 1)
    b = jnp.arange(vals.shape[-1], dtype=idx.dtype)
    mask = idx[..., :, None] == b  # [R, N, B]
    return jnp.sum(
        jnp.where(mask, vals[..., None, :], 0.0), axis=-1
    )


def sample_pdf(
    bins: jnp.ndarray, weights: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """Classic NeRF inverse-CDF sampling (piecewise-constant weights).

    bins: [R, B] (z mid-points), weights: [R, B-1], u: [R, N] in [0, 1].
    Mirrors reference sample_pdf (run_nerf_helpers.py:241-284).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B]

    inds = searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = _gather(cdf, below)
    cdf_above = _gather(cdf, above)
    bins_below = _gather(bins, below)
    bins_above = _gather(bins, above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def _pw_linear_sample_increasing(s_left, s_right, T_left, tau_left, tau_right,
                                 u, epsilon):
    """Closed-form root of int tau(t) dt = -ln((1-u)/T_left), tau increasing.
    Reference: run_nerf_helpers.py:340-349."""
    ln_term = -jnp.log(
        jnp.maximum(epsilon, (1.0 - u) / jnp.maximum(epsilon, T_left))
    )
    discriminant = tau_left ** 2 + (
        2.0 * (tau_right - tau_left) * ln_term
        / jnp.maximum(epsilon, s_right - s_left)
    )
    t = (
        (s_right - s_left)
        * (-tau_left + jnp.sqrt(jnp.maximum(epsilon, discriminant)))
        / jnp.maximum(epsilon, tau_right - tau_left)
    )
    t = jnp.clip(t, epsilon, s_right - s_left)
    return s_left + t


def _pw_linear_sample_decreasing(s_left, s_right, T_left, tau_left, tau_right,
                                 u, epsilon):
    """Decreasing-tau branch. Reference: run_nerf_helpers.py:352-361."""
    ln_term = -jnp.log(
        jnp.maximum(epsilon, (1.0 - u) / jnp.maximum(epsilon, T_left))
    )
    discriminant = tau_left ** 2 - (
        2.0 * (tau_left - tau_right) * ln_term
        / jnp.maximum(epsilon, s_right - s_left)
    )
    t = (
        (s_right - s_left)
        * (tau_left - jnp.sqrt(jnp.maximum(epsilon, discriminant)))
        / jnp.maximum(epsilon, tau_left - tau_right)
    )
    t = jnp.clip(t, epsilon, s_right - s_left)
    return s_left + t


def sample_pdf_reformulation(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    tau: jnp.ndarray,
    T: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    u: jnp.ndarray,
    zero_threshold: float = 1e-4,
    epsilon: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Analytic inverse-CDF for the piecewise-linear density model.

    bins: [R, S] (coarse z_vals, WITHOUT near/far), weights: [R, S+1],
    tau: [R, S+2], T: [R, S+2], near/far: [R, 1], u: [R, N].

    Returns (samples, T_below, tau_below, bin_below), all [R, N].  The
    samples are differentiable w.r.t. tau and T — this is the paper's
    differentiable-quantile property that the sample-based depth loss
    trains through (see SURVEY.md section 3.3).

    Mirrors reference sample_pdf_reformulation (run_nerf_helpers.py:364-445)
    including the cdf[..., -1] = 1.0 overwrite (:374) and the NaN fallback
    to the left bin edge (:432).
    """
    bins_aug = jnp.concatenate([near, bins, far], axis=-1)  # [R, S+2]

    cdf = jnp.cumsum(weights, axis=-1)                      # weights ARE the pdf
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    cdf = cdf.at[..., -1].set(1.0)                          # [R, S+2]

    inds = searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    s_left = _gather(bins_aug, below)
    s_right = _gather(bins_aug, above)
    T_left = _gather(T, below)
    tau_left = _gather(tau, below)
    tau_right = _gather(tau, above)

    tau_diff = tau[..., 1:] - tau[..., :-1]                 # [R, S+1]
    tau_diff_g = _gather(tau_diff, below)

    increasing = _pw_linear_sample_increasing(
        s_left, s_right, T_left, tau_left, tau_right, u, epsilon
    )
    decreasing = _pw_linear_sample_decreasing(
        s_left, s_right, T_left, tau_left, tau_right, u, epsilon
    )

    # Constant interval -> left edge; then overwrite with the closed-form
    # branches where the slope is significant (three nested wheres, same
    # selection order as the reference's samples1/2/3 chain).
    samples = jnp.where(jnp.abs(tau_diff_g) < zero_threshold, s_left, -1.0)
    samples = jnp.where(tau_diff_g >= zero_threshold, increasing, samples)
    samples = jnp.where(tau_diff_g <= -zero_threshold, decreasing, samples)
    samples = jnp.where(jnp.isnan(samples), s_left, samples)

    return samples, T_left, tau_left, s_left


def sample_pdf_reformulation_cdf(
    bins, weights, near, far
) -> jnp.ndarray:
    """The (already-normalized-by-fiat) CDF used by the reformulated
    sampler; exposed for tests and the importance-sampling-error eval."""
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    return cdf.at[..., -1].set(1.0)
