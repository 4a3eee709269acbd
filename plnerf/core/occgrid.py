"""Occupancy-grid empty-space skipping (round-2 perf lever).

No reference equivalent — the reference samples uniformly along every ray
(run_plnerf.py:683-705) and spends MLP evaluations on empty space.  This
is the NerfAcc-style optimization (PAPERS.md) re-designed for TPU/XLA
static shapes: instead of GPU-style sample *compaction* (dynamic shapes,
divergent rays), the grid reshapes WHERE a fixed number of coarse samples
land:

* a coarse density grid (per-voxel EMA of observed density) is updated FOR
  FREE from the densities the train step already computes at its ray
  samples (no extra MLP evals; one fused scatter per step);
* at sampling time each ray evaluates ``occ_candidates`` uniform candidate
  bins against the grid (a cheap global gather, zero MLP cost) and places
  its ``n_samples`` stratified samples by inverse-CDF over
  ``occupied + floor`` bin weights — occupied intervals get nearly all
  samples, empty space keeps a small floor probability so mistakes can be
  corrected (no death spiral) and newly-revealed geometry is found.

The net effect: the flagship linear recipe reaches the same quality with a
fraction of the coarse samples (e.g. 32 guided vs 128 uniform), cutting
MLP FLOPs nearly 2x.  Flag-gated (``--occ_grid``); the exact-reference
uniform path stays the default so parity tests are untouched.

Everything here is jit-compilable with static shapes and runs unchanged
under GSPMD sharding (the grid is replicated; updates psum via the
gradient-style all-reduce of scatter-max — each chip scatters its local
samples, and the EMA uses the elementwise max across chips implicitly
because updates commute through max).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import sampling


@dataclasses.dataclass(frozen=True)
class OccGridConfig:
    """Static configuration (jit-static; hashable)."""
    resolution: int = 128        # G: grid is [G, G, G]
    candidates: int = 128        # M: uniform candidate bins per ray
    # Per-observation EMA coefficient: a visited voxel blends
    # decay*old + (1-decay)*obs (update_grid touches visited voxels only,
    # so this can be aggressive without starving unvisited cells).  At
    # 0.7 an empty visited voxel carves in ~7 observations and a
    # transient density spike of 80 clears in ~25 — pure max-EMA needed
    # ~85, and a measured mid-training spike held 40% of the grid
    # falsely occupied for thousands of steps.
    decay: float = 0.7
    threshold: float = 1e-2      # density above which a cell is occupied
    # PDF floor for unoccupied candidate bins.  Besides the death-spiral
    # escape hatch, floor samples are the coarse network's ONLY training
    # signal in empty space — raising 0.01 -> 0.03 measured +0.6 dB PSNR
    # and +0.03 SSIM on the sparse-scene A/B at unchanged throughput
    # (BASELINE.md); too high and guidance degenerates toward uniform.
    floor: float = 0.03
    warmup: int = 256            # driver: plain sampling for first N steps


def init_grid(aabb_min, aabb_max, cfg: OccGridConfig):
    """Fresh grid state (a plain dict pytree so orbax/np round-trips it).

    Density starts ABOVE threshold everywhere: unvisited space is presumed
    occupied until training samples prove otherwise.  ``occ`` is the
    derived (dilated, thresholded) occupancy the sampler actually gathers
    from — kept in the state so eval renders don't recompute it per chunk.
    """
    g = cfg.resolution
    return {
        "density": jnp.full((g, g, g), 10.0 * cfg.threshold, jnp.float32),
        "occ": jnp.ones((g, g, g), jnp.float32),
        "aabb_min": jnp.asarray(aabb_min, jnp.float32),
        "aabb_max": jnp.asarray(aabb_max, jnp.float32),
    }


def _dilate_max3(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 3x3x3 max-pool (SAME): one-voxel conservative dilation."""
    for axis in range(3):
        win = [1, 1, 1]
        win[axis] = 3
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, tuple(win),
                                  (1, 1, 1), "SAME")
    return x


def refresh_occ(grid, cfg: OccGridConfig):
    """Recompute the sampled occupancy field from the density EMA:
    threshold, then dilate by one voxel.  Dilation is the conservative
    answer to candidate-bin aliasing — ``occupancy_along_rays`` tests one
    midpoint per bin, and a bin slightly longer than a voxel can midpoint-
    test the empty neighbor of a thin occupied structure (the convergence
    fixture's ground slab is ~5 voxels thick at 128^3) and starve it."""
    occ = (grid["density"] > cfg.threshold).astype(jnp.float32)
    return {**grid, "occ": _dilate_max3(occ)}


def _voxel_index(grid, pts, g: int):
    """pts [..., 3] -> (flat int32 index [...], in-bounds mask [...])."""
    rel = (pts - grid["aabb_min"]) / (grid["aabb_max"] - grid["aabb_min"])
    idx = jnp.floor(rel * g).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    flat = (idx[..., 0] * g + idx[..., 1]) * g + idx[..., 2]
    return flat, inb


def update_grid(grid, pts: jnp.ndarray, sigma: jnp.ndarray,
                cfg: OccGridConfig):
    """Blend VISITED voxels toward this step's per-cell max observation
    (mean-EMA), then refresh the dilated occupancy field.

    Visited-only: a voxel's EMA advances only when this step carries a
    fresh observation for it.  Global decay starves voxels between
    revisits (guided sampling revisits each occupied voxel rarely on
    large scenes), flipping real geometry to empty faster than floor
    samples can rediscover it.  Mean-EMA (not scatter-max-keep-max): a
    transient density hallucination — observed mid-training to flip 40%
    of the grid occupied in under 1k steps — enters at weight (1-decay)
    and clears in ~log(thr/spike)/log(decay) fresh observations (~25 at
    0.7) instead of ~85 under max-EMA, while a persistently-occupied
    voxel's EMA stays pinned near its true density.  Stale-occupied
    voxels self-correct: being marked occupied, they keep receiving
    guided samples, so they ARE visited and blend toward fresh (low)
    observations.  Never-visited voxels keep the optimistic init —
    uniform-equivalent sampling there.

    pts: [..., 3]; sigma: [...] (post-activation, e.g. relu'd raw sigma).
    Out-of-bounds points are dropped.  One fused scatter + a separable
    max-pool per step — cheap next to the MLP evals that produced sigma.
    """
    g = cfg.resolution
    sigma = jax.lax.stop_gradient(sigma).reshape(-1)
    flat, inb = _voxel_index(grid, jax.lax.stop_gradient(pts).reshape(-1, 3), g)
    inb = inb.reshape(-1)
    contrib = jnp.where(inb, sigma, -jnp.inf)
    dens = grid["density"].reshape(-1)
    obs = jnp.full_like(dens, -jnp.inf).at[flat].max(contrib)
    visited = obs > -jnp.inf
    blended = cfg.decay * dens + (1.0 - cfg.decay) * jnp.maximum(obs, 0.0)
    dens = jnp.where(visited, blended, dens)
    return refresh_occ({**grid, "density": dens.reshape(g, g, g)}, cfg)


def occupancy_along_rays(grid, rays_o, rays_d, near, far, m: int,
                         cfg: OccGridConfig):
    """Candidate-bin occupancy per ray.

    Returns (edges [R, M+1] z values, occ [R, M] in {0,1}).  Bin midpoints
    are tested against the grid with a single global gather.
    """
    t = jnp.linspace(0.0, 1.0, m + 1, dtype=near.dtype)
    edges = near * (1.0 - t) + far * t                       # [R, M+1]
    mids = 0.5 * (edges[..., 1:] + edges[..., :-1])          # [R, M]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mids[..., None]
    flat, inb = _voxel_index(grid, pts, cfg.resolution)
    occ = grid["occ"].reshape(-1)[flat]                      # [R, M]
    return edges, occ * inb.astype(jnp.float32)


def occ_guided_z_vals(grid, rays_o, rays_d, near, far, n_samples: int,
                      t_rand, cfg: OccGridConfig):
    """Place ``n_samples`` per ray by stratified inverse-CDF over the
    candidate-bin weights ``occ + floor``.  Replaces
    ``sampling.stratified_z_vals`` when the grid is active; output is
    sorted ascending (u is increasing, the CDF is monotone).

    t_rand: [R, n_samples] uniforms (stratified jitter) or None for the
    deterministic mid-bin rule (perturb=False).

    Returns ``(z_vals [R, n_samples], occ_ray_frac scalar)`` — the mean
    occupied candidate-bin fraction over the batch, the degenerate-
    guidance signal (cli/run_plnerf advisory), surfaced from the gather
    the sampler performs anyway (recomputing it post-update in the train
    step measured a 7.5% throughput regression on the occ bench path).
    """
    edges, occ = occupancy_along_rays(grid, rays_o, rays_d, near, far,
                                      cfg.candidates, cfg)
    w = occ + cfg.floor
    offs = (t_rand if t_rand is not None
            else jnp.full((rays_o.shape[0], n_samples), 0.5, near.dtype))
    u = (jnp.arange(n_samples, dtype=near.dtype) + offs) / n_samples
    return sampling.sample_pdf(edges, w, u), jnp.mean(occ)
