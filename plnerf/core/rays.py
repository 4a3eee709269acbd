"""Camera ray generation and NDC projection.

Matches the reference ray conventions exactly:

* ``get_rays`` — pinhole rays from a 3x3 intrinsic matrix K and a camera-to-
  world matrix, OpenGL-style axes (x right, y up, looking down -z), pixel
  corners (reference run_nerf_helpers.py:162-181).
* ``get_rays_pixelcenter`` — depth-experiments variant with (fx,fy,cx,cy)
  vector intrinsics, pixel centers (+0.5) and ``H - (j+0.5) - cy`` for y
  (depth_supervised_exps/model/run_nerf_helpers.py:243-272).
* ``ndc_rays`` — LLFF forward-facing rays to the NDC box
  (run_nerf_helpers.py:184-201).

All functions are pure jnp and shape-polymorphic; they can run on host
(numpy inputs) or inside jit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K, c2w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image ray grid. Returns (rays_o, rays_d), each [H, W, 3]."""
    K = jnp.asarray(K, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)],
        axis=-1,
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_pixelcenter(
    H: int, W: int, intrinsic, c2w, coords: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-exps convention: intrinsic = (fx, fy, cx, cy), pixel centers.

    coords: optional [N, 2] integer (row, col) pixel coordinates; when given,
    returns [N, 3] rays instead of the full grid.
    """
    intrinsic = jnp.asarray(intrinsic, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    fx, fy, cx, cy = intrinsic[0], intrinsic[1], intrinsic[2], intrinsic[3]
    if coords is None:
        i, j = jnp.meshgrid(
            jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32),
            indexing="xy",
        )
    else:
        coords = jnp.asarray(coords)
        i = coords[:, 1].astype(jnp.float32)
        j = coords[:, 0].astype(jnp.float32)
    dirs = jnp.stack(
        [((i + 0.5) - cx) / fx, (H - (j + 0.5) - cy) / fy, -jnp.ones_like(i)],
        axis=-1,
    )
    rays_d = jnp.einsum("...c,rc->...r", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Project rays into NDC space (LLFF forward-facing scenes)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w):
    """Numpy twin of ``get_rays`` for host-side ray-pool building
    (reference run_nerf_helpers.py:174-181)."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    dirs = np.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
    )
    rays_d = np.einsum("hwc,rc->hwr", dirs, np.asarray(c2w)[:3, :3])
    rays_o = np.broadcast_to(np.asarray(c2w)[:3, -1], rays_d.shape)
    return rays_o, rays_d


def pack_rays(rays_o, rays_d, near, far, viewdirs=None, extra=None):
    """Pack per-ray rows ``[o(3), d(3), near, far, viewdirs(3)?, extra...]``
    matching the reference ray-row layout (run_plnerf.py:157-164)."""
    n = jnp.broadcast_to(jnp.asarray(near, jnp.float32), rays_d[..., :1].shape)
    f = jnp.broadcast_to(jnp.asarray(far, jnp.float32), rays_d[..., :1].shape)
    parts = [rays_o, rays_d, n, f]
    if viewdirs is not None:
        parts.append(viewdirs)
    if extra is not None:
        parts.append(extra)
    return jnp.concatenate(parts, axis=-1)
