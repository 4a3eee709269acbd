"""Training losses.

* photometric MSE / PSNR (reference run_nerf_helpers.py:17-18)
* sample-based space-carving loss between predicted termination quantiles
  and depth hypotheses (reference depth_supervised_exps/model/
  run_nerf_helpers.py:52-86), with per-ray or joint (per-image) hypothesis
  selection, optional validity mask and distance threshold.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def space_carving_loss(
    pred_depth: jnp.ndarray,
    target_hypothesis: jnp.ndarray,
    is_joint: bool = False,
    mask: Optional[jnp.ndarray] = None,
    norm_p: int = 2,
    threshold: float = 0.0,
) -> jnp.ndarray:
    """pred_depth: [R, N] quantiles; target_hypothesis: [H, R, 1] or [H, R, N].

    The "norm" is over a singleton trailing axis, i.e. an absolute
    difference for any p (matching the reference's torch.norm over the
    unsqueezed last dim).
    """
    if target_hypothesis.shape[-1] == 1:
        target = jnp.broadcast_to(
            target_hypothesis,
            target_hypothesis.shape[:-1] + (pred_depth.shape[-1],),
        )
    else:
        target = target_hypothesis

    distances = jnp.abs(pred_depth[None, :, :] - target)  # [H, R, N]

    if mask is not None:
        distances = distances * mask[None, :, None]

    if threshold > 0:
        distances = jnp.where(distances < threshold, 0.0, distances)

    if is_joint:
        # hypothesis chosen per image: mean over rays, min over hypotheses,
        # mean over quantiles
        quantile_mean = jnp.mean(distances, axis=1)     # [H, N]
        samples_min = jnp.min(quantile_mean, axis=0)    # [N]
        return jnp.mean(samples_min)
    # each (ray, quantile) picks its best hypothesis
    best_hyp = jnp.min(distances, axis=0)               # [R, N]
    return jnp.mean(jnp.mean(best_hyp, axis=-1))


def get_space_carving_idx(
    pred_depth: jnp.ndarray,
    target_hypothesis: jnp.ndarray,
    is_joint: bool = False,
    mask: Optional[jnp.ndarray] = None,
    norm_p: int = 2,
    threshold: float = 0.0,
) -> jnp.ndarray:
    """Best-hypothesis index per ray (or per image with ``is_joint``) —
    reference depth_supervised_exps/model/run_nerf_helpers.py:19-49, used
    by the hypothesis-caching (cimle) path.

    pred_depth: [H, W, N]; target_hypothesis: [n_hyp, H, W, 1].
    Returns int32 indices shaped [H, W, N] (joint mode broadcasts the one
    per-image argmin)."""
    n_points = pred_depth.shape[-1]
    target = jnp.broadcast_to(
        target_hypothesis,
        target_hypothesis.shape[:-1] + (n_points,),
    )
    distances = jnp.abs(pred_depth[None] - target)     # [n_hyp, H, W, N]

    if mask is not None:
        distances = distances * mask[None]
    if threshold > 0:
        distances = jnp.where(distances < threshold, 0.0, distances)

    if is_joint:
        total = jnp.mean(distances, axis=(1, 2))       # [n_hyp, N]
        best = jnp.argmin(total, axis=0)               # [N]
        return jnp.broadcast_to(best, pred_depth.shape).astype(jnp.int32)
    return jnp.argmin(distances, axis=0).astype(jnp.int32)
