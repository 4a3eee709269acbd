"""Ray-batch construction for training, designed to run inside jit.

Two policies, matching the reference:

* ``no_batching`` (blender configs): pick one training image per step and
  N_rand pixels from it, with an optional central precrop for early iters
  (run_plnerf.py:1251-1280).  Here the pixel selection AND the ray
  generation happen on-device inside the train jit — no host transfer per
  step.  Deviation (documented): pixels are drawn with replacement
  (jax.random.randint) instead of numpy choice without replacement;
  duplicate probability for 1024 of 640k pixels is <0.2% per batch and
  statistically immaterial.
* ``use_batching`` (llff configs): a pre-shuffled global pool of rays from
  all training images, consumed in contiguous slices with on-device
  reshuffling between epochs (run_plnerf.py:1199-1249).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rays as raysmod


def select_pixels(
    key: jax.Array, H: int, W: int, n_rand: int, precrop: bool,
    precrop_frac: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random pixel (row, col) indices, optionally from the central crop."""
    ky, kx = jax.random.split(key)
    if precrop:
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)
        y = jax.random.randint(ky, (n_rand,), H // 2 - dH, H // 2 + dH)
        x = jax.random.randint(kx, (n_rand,), W // 2 - dW, W // 2 + dW)
    else:
        y = jax.random.randint(ky, (n_rand,), 0, H)
        x = jax.random.randint(kx, (n_rand,), 0, W)
    return y, x


def rays_for_pixels(K, c2w, y, x, pixel_center: bool = False):
    """Ray origins/directions for selected pixels (OpenGL convention,
    matching core.rays.get_rays)."""
    K = jnp.asarray(K, jnp.float32)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if pixel_center:
        xf = xf + 0.5
        yf = yf + 0.5
    dirs = jnp.stack(
        [(xf - K[0, 2]) / K[0, 0], -(yf - K[1, 2]) / K[1, 1], -jnp.ones_like(xf)],
        axis=-1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def sample_one_image_batch(
    images: jnp.ndarray,      # [N, H, W, 3]
    poses: jnp.ndarray,       # [N, 3, 4] (or [N, 4, 4])
    K,
    i_train: jnp.ndarray,     # [T] training image indices
    key: jax.Array,
    n_rand: int,
    near: float,
    far: float,
    use_viewdirs: bool,
    precrop: bool = False,
    precrop_frac: float = 0.5,
    ndc: bool = False,
    focal: float = 0.0,
):
    """One-image ray batch, fully on device.  Returns (rays [R, 8|11],
    target [R, 3], img_idx).  With ``ndc`` the packed origins/directions
    are NDC-warped while viewdirs stay world-space (reference render()
    front-end, run_plnerf.py:145-155)."""
    H, W = images.shape[1], images.shape[2]
    kimg, kpix = jax.random.split(key)
    ti = jax.random.randint(kimg, (), 0, i_train.shape[0])
    img_i = i_train[ti]
    c2w = poses[img_i][:3, :4]

    y, x = select_pixels(kpix, H, W, n_rand, precrop, precrop_frac)
    rays_o, rays_d = rays_for_pixels(K, c2w, y, x)
    target = images[img_i, y, x]

    viewdirs = None
    if use_viewdirs:
        # always from the PRE-NDC world direction
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        rays_o, rays_d = raysmod.ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    packed = raysmod.pack_rays(rays_o, rays_d, near, far, viewdirs)
    return packed, target, img_i


def build_ray_pool(images: np.ndarray, poses: np.ndarray, K, i_train,
                   seed: int = 0) -> np.ndarray:
    """Host-side pre-shuffled pool [M, 9]: (o, d, rgb) per ray for all
    training images (reference run_plnerf.py:1199-1221).

    Stated deviation: the reference consumes EVERY pool ray each epoch,
    ending with one short batch before reshuffling (run_plnerf.py:1244-1248).
    The TPU driver consumes the epoch tail with full-``n_rand`` remainder
    steps (single-step dispatches) and reshuffles once fewer than ``n_rand``
    rays remain, skipping only that sub-batch remainder (< 1024 of millions
    of i.i.d.-shuffled rays per epoch — statistically neutral).  A short
    final batch would change the ray-batch shape and force a second jit
    cache per phase.
    """
    rows = []
    for i in np.asarray(i_train):
        ro, rd = raysmod.get_rays_np(
            images.shape[1], images.shape[2], K, poses[i][:3, :4]
        )
        rows.append(
            np.concatenate(
                [ro.reshape(-1, 3), rd.reshape(-1, 3), images[i].reshape(-1, 3)],
                axis=-1,
            )
        )
    pool = np.concatenate(rows, 0).astype(np.float32)
    np.random.default_rng(seed).shuffle(pool)
    return pool


def pool_batch(pool: jnp.ndarray, i_batch: jnp.ndarray, n_rand: int,
               near: float, far: float, use_viewdirs: bool):
    """Contiguous slice from the shuffled pool, on device.

    Pool rows are [o, d, rgb] (9 cols) or, for NDC pools,
    [ndc_o, ndc_d, rgb, world_viewdirs] (12 cols) — viewdirs must come
    from the pre-NDC world direction, matching the eval front-end."""
    rows = jax.lax.dynamic_slice(
        pool, (i_batch, 0), (n_rand, pool.shape[1])
    )
    rays_o, rays_d, target = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    viewdirs = None
    if use_viewdirs:
        vd = rows[:, 9:12] if pool.shape[1] >= 12 else rays_d
        viewdirs = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    packed = raysmod.pack_rays(rays_o, rays_d, near, far, viewdirs)
    return packed, target
