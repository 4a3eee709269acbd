"""Synthetic analytic scenes for tests and demos: a constant-density
sphere rendered by independent numpy ray-marching.  Lets the end-to-end
trainer be validated without shipping dataset files."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def pose_spherical_np(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Camera-to-world on a sphere looking at the origin (same convention
    as the blender loaders' pose_spherical, load_blender.py:29-34)."""
    t, p = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rx = np.eye(4, dtype=np.float32)
    rx[1, 1], rx[1, 2] = np.cos(p), -np.sin(p)
    rx[2, 1], rx[2, 2] = np.sin(p), np.cos(p)
    ry = np.eye(4, dtype=np.float32)
    ry[0, 0], ry[0, 2] = np.cos(t), -np.sin(t)
    ry[2, 0], ry[2, 2] = np.sin(t), np.cos(t)
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ ry @ rx @ trans


def render_sphere_image(
    c2w: np.ndarray, H: int, W: int, focal: float,
    radius: float = 1.0, density: float = 20.0,
    color=(0.8, 0.3, 0.2), near: float = 2.0, far: float = 6.0,
    n_march: int = 256, white_bkgd: bool = True,
) -> np.ndarray:
    """Independent numpy volume rendering of a homogeneous sphere."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)

    t = np.linspace(near, far, n_march, dtype=np.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    sigma = density * (np.linalg.norm(pts, axis=-1) < radius)

    dt = (far - near) / (n_march - 1) * np.linalg.norm(rays_d, axis=-1)[..., None]
    alpha = 1 - np.exp(-sigma * dt)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1
    )[..., :-1]
    w = alpha * trans
    rgb = w.sum(-1)[..., None] * np.asarray(color, np.float32)
    if white_bkgd:
        rgb = rgb + (1 - w.sum(-1))[..., None]
    return rgb.astype(np.float32)


def make_sphere_dataset(
    n_views: int = 8, H: int = 48, W: int = 48, seed: int = 0,
    radius: float = 1.0, density: float = 20.0,
) -> Tuple[np.ndarray, np.ndarray, list, np.ndarray]:
    """Images + poses + hwf + K for a hemisphere of views at distance 4."""
    focal = 0.5 * W / np.tan(0.25)  # ~fov 28deg
    rng = np.random.default_rng(seed)
    thetas = np.linspace(-180, 180, n_views, endpoint=False)
    phis = rng.uniform(-45, -15, n_views)
    poses = np.stack([pose_spherical_np(t, p, 4.0) for t, p in zip(thetas, phis)])
    images = np.stack([
        render_sphere_image(p, H, W, focal, radius, density) for p in poses
    ])
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)
    return images, poses.astype(np.float32), [H, W, focal], K


# ---------------------------------------------------------------------------
# Multi-object convergence fixture (round 2): spheres of varied albedo over
# a checkered ground slab, plus analytic expected-depth maps.  Used by
# tools/convergence_run.py to validate real-recipe training at 128-200^2
# for 5-10k iters in {constant, linear, depth} modes (VERDICT.md item 5).
# ---------------------------------------------------------------------------

_SCENE_SPHERES = [
    # (center, radius, albedo)
    ((0.0, 0.0, 0.35), 0.55, (0.85, 0.25, 0.2)),
    ((0.9, -0.45, 0.05), 0.32, (0.2, 0.45, 0.9)),
    ((-0.85, 0.55, -0.05), 0.28, (0.95, 0.8, 0.15)),
    ((-0.15, -0.9, -0.12), 0.22, (0.2, 0.8, 0.35)),
]
_SLAB_Z = (-0.55, -0.38)        # thin ground slab (tests sharp boundaries)
_SLAB_R = 1.6                    # slab extent |x|,|y| < R


def _scene_sigma_rgb(pts: np.ndarray, density: float, slab: bool = True):
    """Density + albedo of the multi-object scene at points [..., 3].
    ``slab=False`` drops the ground slab — an object-centric scene whose
    rays are mostly empty space (the regime empty-space skipping targets;
    real blender scenes are ~90% empty along a ray)."""
    sigma = np.zeros(pts.shape[:-1], np.float32)
    rgb = np.zeros(pts.shape[:-1] + (3,), np.float32)
    for (c, r, a) in _SCENE_SPHERES:
        inside = (np.linalg.norm(pts - np.asarray(c, np.float32), axis=-1)
                  < r)
        sigma = np.where(inside, density, sigma)
        rgb = np.where(inside[..., None], np.asarray(a, np.float32), rgb)
    if not slab:
        return sigma, rgb
    z = pts[..., 2]
    slab = ((z > _SLAB_Z[0]) & (z < _SLAB_Z[1])
            & (np.abs(pts[..., 0]) < _SLAB_R)
            & (np.abs(pts[..., 1]) < _SLAB_R))
    checker = ((np.floor(pts[..., 0] * 2.5) + np.floor(pts[..., 1] * 2.5))
               % 2).astype(np.float32)
    slab_rgb = np.where(checker[..., None] > 0,
                        np.asarray((0.9, 0.9, 0.9), np.float32),
                        np.asarray((0.25, 0.25, 0.3), np.float32))
    sigma = np.where(slab, density, sigma)
    rgb = np.where(slab[..., None], slab_rgb, rgb)
    return sigma, rgb


def render_scene_image(
    c2w: np.ndarray, H: int, W: int, focal: float,
    density: float = 80.0, near: float = 2.0, far: float = 6.0,
    n_march: int = 512, white_bkgd: bool = True, row_chunk: int = 16,
    slab: bool = True,
):
    """Numpy volume render of the multi-object scene.  Returns
    (rgb [H,W,3], depth [H,W]) where depth is the expected termination
    distance (sum w * t, matching the renderer's depth_map convention)."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    rays_d = (dirs @ c2w[:3, :3].T).astype(np.float32)
    rays_o = np.broadcast_to(c2w[:3, 3].astype(np.float32), rays_d.shape)
    t = np.linspace(near, far, n_march, dtype=np.float32)

    rgb_out = np.zeros((H, W, 3), np.float32)
    depth_out = np.zeros((H, W), np.float32)
    for r0 in range(0, H, row_chunk):
        r1 = min(H, r0 + row_chunk)
        pts = (rays_o[r0:r1, :, None, :]
               + rays_d[r0:r1, :, None, :] * t[:, None])
        sigma, rgb = _scene_sigma_rgb(pts, density, slab=slab)
        dt = (far - near) / (n_march - 1) * np.linalg.norm(
            rays_d[r0:r1], axis=-1)[..., None]
        alpha = 1 - np.exp(-sigma * dt)
        trans = np.cumprod(
            np.concatenate(
                [np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1
        )[..., :-1]
        w = alpha * trans
        rgb_px = (w[..., None] * rgb).sum(-2)
        acc = w.sum(-1)
        depth_out[r0:r1] = (w * t).sum(-1)
        if white_bkgd:
            rgb_px = rgb_px + (1 - acc)[..., None]
        rgb_out[r0:r1] = rgb_px
    return rgb_out, depth_out


def make_multi_object_dataset(
    n_train: int = 30, n_test: int = 6, H: int = 160, W: int = 160,
    seed: int = 0, density: float = 80.0, cache_dir: str | None = None,
    slab: bool = True,
):
    """Train/test splits of the multi-object scene with GT depth maps.
    Returns dict(images, poses, depths, hwf, K, i_split, near, far).
    Renders are cached to ``cache_dir`` keyed by the geometry params."""
    import os

    focal = 0.5 * W / np.tan(0.25)
    key = (f"mobj_{n_train}_{n_test}_{H}x{W}_{seed}_{density:g}"
           + ("" if slab else "_noslab"))
    cache = os.path.join(cache_dir, key + ".npz") if cache_dir else None
    if cache and os.path.exists(cache):
        z = np.load(cache)
        return {k: z[k] for k in z.files} | {
            "hwf": [H, W, focal], "near": 2.0, "far": 6.0}

    rng = np.random.default_rng(seed)
    n = n_train + n_test
    thetas = np.linspace(-180, 180, n, endpoint=False)
    phis = rng.uniform(-55, -12, n)
    order = rng.permutation(n)
    poses = np.stack([
        pose_spherical_np(thetas[k], phis[k], 4.0) for k in order
    ]).astype(np.float32)
    images, depths = [], []
    for p in poses:
        rgb, d = render_scene_image(p, H, W, focal, density=density,
                                    slab=slab)
        images.append(rgb)
        depths.append(d)
    images = np.stack(images)
    depths = np.stack(depths)
    i_split = (np.arange(n_train), np.arange(n_train, n))
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    out = {"images": images, "poses": poses, "depths": depths, "K": K,
           "i_train": i_split[0], "i_test": i_split[1]}
    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(cache, **out)
    return out | {"hwf": [H, W, focal], "near": 2.0, "far": 6.0}


# ---------------------------------------------------------------------------
# forward-facing (LLFF-style) fixture: textured planes over a depth range,
# written in the exact poses_bounds.npy + images/ layout so data/llff.py
# loads it unmodified (VERDICT r2 item 2; reference layout load_llff.py).
# ---------------------------------------------------------------------------

def _ff_sigma_rgb(pts: np.ndarray, density: float = 80.0):
    """Density + albedo of the forward-facing scene: three textured planes
    staggered in depth (front card, mid stripes, full background checker)
    plus a sphere for parallax.  Cameras live near z=0 looking down -z."""
    sigma = np.zeros(pts.shape[:-1], np.float32)
    rgb = np.zeros(pts.shape[:-1] + (3,), np.float32)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]

    # background plane, z in [-5.2, -5.0]: coarse checker
    m = (z > -5.2) & (z < -5.0)
    checker = ((np.floor(x * 1.2) + np.floor(y * 1.2)) % 2).astype(np.float32)
    c = np.where(checker[..., None] > 0,
                 np.asarray((0.75, 0.75, 0.7), np.float32),
                 np.asarray((0.2, 0.35, 0.25), np.float32))
    sigma = np.where(m, density, sigma)
    rgb = np.where(m[..., None], c, rgb)

    # mid plane card, z in [-3.0, -2.9]: diagonal stripes
    m = ((z > -3.0) & (z < -2.9)
         & (x > -0.3) & (x < 1.0) & (y > -0.8) & (y < 0.6))
    stripes = (np.floor((x + y) * 5.0) % 2).astype(np.float32)
    c = np.where(stripes[..., None] > 0,
                 np.asarray((0.25, 0.35, 0.9), np.float32),
                 np.asarray((0.95, 0.95, 0.95), np.float32))
    sigma = np.where(m, density, sigma)
    rgb = np.where(m[..., None], c, rgb)

    # parallax sphere
    m = np.linalg.norm(
        pts - np.asarray((0.5, -0.3, -2.4), np.float32), axis=-1) < 0.35
    sigma = np.where(m, density, sigma)
    rgb = np.where(m[..., None], np.asarray((0.2, 0.75, 0.3), np.float32),
                   rgb)

    # front card, z in [-1.8, -1.7]: fine checker
    m = ((z > -1.8) & (z < -1.7)
         & (x > -0.6) & (x < 0.1) & (y > -0.5) & (y < 0.3))
    checker = ((np.floor(x * 8.0) + np.floor(y * 8.0)) % 2).astype(
        np.float32)
    c = np.where(checker[..., None] > 0,
                 np.asarray((0.9, 0.2, 0.15), np.float32),
                 np.asarray((0.95, 0.8, 0.2), np.float32))
    sigma = np.where(m, density, sigma)
    rgb = np.where(m[..., None], c, rgb)
    return sigma, rgb


def _lookat_c2w(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Standard NeRF camera axes: columns [right, up, backward, eye]."""
    eye = np.asarray(eye, np.float32)
    b = eye - np.asarray(target, np.float32)
    b = b / np.linalg.norm(b)
    r = np.cross(np.asarray(up, np.float32), b)
    r = r / np.linalg.norm(r)
    u = np.cross(b, r)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = r, u, b, eye
    return c2w


def render_ff_image(c2w: np.ndarray, H: int, W: int, focal: float,
                    near: float = 0.5, far: float = 7.0,
                    n_march: int = 640, row_chunk: int = 16):
    """Numpy volume render of the forward-facing scene (GT generator)."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1)
    rays_d = (dirs @ c2w[:3, :3].T).astype(np.float32)
    rays_o = np.broadcast_to(c2w[:3, 3].astype(np.float32), rays_d.shape)
    t = np.linspace(near, far, n_march, dtype=np.float32)
    out = np.zeros((H, W, 3), np.float32)
    for r0 in range(0, H, row_chunk):
        r1 = min(H, r0 + row_chunk)
        pts = (rays_o[r0:r1, :, None, :]
               + rays_d[r0:r1, :, None, :] * t[:, None])
        sigma, rgb = _ff_sigma_rgb(pts)
        dt = (far - near) / (n_march - 1) * np.linalg.norm(
            rays_d[r0:r1], axis=-1)[..., None]
        alpha = 1 - np.exp(-sigma * dt)
        trans = np.cumprod(np.concatenate(
            [np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1
        )[..., :-1]
        w = alpha * trans
        out[r0:r1] = (w[..., None] * rgb).sum(-2) + (1 - w.sum(-1))[..., None]
    return out


def make_llff_fixture(basedir: str, n: int = 12, H: int = 120, W: int = 160,
                      seed: int = 0) -> str:
    """Write the forward-facing fixture in the LLFF on-disk layout:
    images/NNN.png + poses_bounds.npy ([N, 17]: 3x5 pose in the LLFF
    (down, right, back) column order + [near, far] bounds — the inverse of
    data/llff._load_data's column fixup), so load_llff_data consumes it
    with factor=1.  Cameras jitter around z=0 looking at (0, 0, -3.2)."""
    import os

    import cv2

    img_dir = os.path.join(basedir, "images")
    os.makedirs(img_dir, exist_ok=True)
    focal = 0.85 * W
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n):
        # deterministic spread + jitter: good parallax coverage
        gx = (k % 4 - 1.5) / 1.5 * 0.35
        gy = (k // 4 - 1.0) * 0.3
        eye = np.array([gx + rng.uniform(-0.05, 0.05),
                        gy + rng.uniform(-0.05, 0.05),
                        rng.uniform(-0.08, 0.08)], np.float32)
        c2w = _lookat_c2w(eye, (0.0, 0.0, -3.2))
        img = render_ff_image(c2w, H, W, focal)
        cv2.imwrite(os.path.join(img_dir, f"{k:03d}.png"),
                    cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        r, u, b, tvec = (c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3])
        m = np.stack([-u, r, b, tvec,
                      np.array([H, W, focal], np.float32)], axis=1)  # 3x5
        close = 1.7 - float(eye[2]) - 0.3
        inf = 5.2 - float(eye[2]) + 0.3
        rows.append(np.concatenate([m.reshape(-1), [close, inf]]))
    np.save(os.path.join(basedir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return basedir


def render_scene_image_jax(
    c2w: np.ndarray, H: int, W: int, focal: float,
    density: float = 80.0, near: float = 2.0, far: float = 6.0,
    n_march: int = 512, white_bkgd: bool = True, row_chunk: int = 25,
    slab: bool = True,
):
    """``render_scene_image`` marched on the default JAX backend — same
    scene, same t grid, same compositing, to float32 precision.  Exists
    because the numpy marcher costs ~160 s per 800^2 view on this box's
    single vCPU while the TPU does it in well under a second: the
    full-data-geometry study (VERDICT r4 item 2) needs ~109 such views.
    Parity vs the numpy marcher is tested (tests/test_data_loaders.py).

    Returns (rgb [H,W,3], depth [H,W]) as numpy arrays."""
    import jax
    import jax.numpy as jnp

    assert H % row_chunk == 0, "row_chunk must divide H"

    def march_rows(rays_o, rays_d):
        t = jnp.linspace(near, far, n_march, dtype=jnp.float32)
        pts = (rays_o[..., None, :]
               + rays_d[..., None, :] * t[:, None])          # [rc,W,S,3]
        sigma = jnp.zeros(pts.shape[:-1], jnp.float32)
        rgb = jnp.zeros(pts.shape[:-1] + (3,), jnp.float32)
        for (c, r, a) in _SCENE_SPHERES:
            inside = jnp.linalg.norm(
                pts - jnp.asarray(c, jnp.float32), axis=-1) < r
            sigma = jnp.where(inside, density, sigma)
            rgb = jnp.where(inside[..., None],
                            jnp.asarray(a, jnp.float32), rgb)
        if slab:
            z = pts[..., 2]
            in_slab = ((z > _SLAB_Z[0]) & (z < _SLAB_Z[1])
                       & (jnp.abs(pts[..., 0]) < _SLAB_R)
                       & (jnp.abs(pts[..., 1]) < _SLAB_R))
            checker = ((jnp.floor(pts[..., 0] * 2.5)
                        + jnp.floor(pts[..., 1] * 2.5)) % 2)
            slab_rgb = jnp.where(
                checker[..., None] > 0,
                jnp.asarray((0.9, 0.9, 0.9), jnp.float32),
                jnp.asarray((0.25, 0.25, 0.3), jnp.float32))
            sigma = jnp.where(in_slab, density, sigma)
            rgb = jnp.where(in_slab[..., None], slab_rgb, rgb)
        dt = (far - near) / (n_march - 1) * jnp.linalg.norm(
            rays_d, axis=-1)[..., None]
        alpha = 1 - jnp.exp(-sigma * dt)
        trans = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1),
            -1)[..., :-1]
        w = alpha * trans
        rgb_px = (w[..., None] * rgb).sum(-2)
        acc = w.sum(-1)
        depth = (w * t).sum(-1)
        if white_bkgd:
            rgb_px = rgb_px + (1 - acc)[..., None]
        return rgb_px, depth

    @jax.jit
    def march_image(rays_o, rays_d):
        # ONE dispatch per image: lax.map serializes the row chunks
        # in-device (peak memory = one chunk's march), so a relay-
        # throttled link pays one round trip per VIEW, not one per
        # chunk (measured ~2.6 s/dispatch when throttled)
        ro = rays_o.reshape(H // row_chunk, row_chunk, W, 3)
        rd = rays_d.reshape(H // row_chunk, row_chunk, W, 3)
        rgb_px, depth = jax.lax.map(lambda ab: march_rows(*ab), (ro, rd))
        return rgb_px.reshape(H, W, 3), depth.reshape(H, W)

    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack(
        [(i - W / 2) / focal, -(j - H / 2) / focal, -np.ones_like(i)], -1
    )
    rays_d = (dirs @ c2w[:3, :3].T).astype(np.float32)
    rays_o = np.broadcast_to(
        c2w[:3, 3].astype(np.float32), rays_d.shape).copy()
    rgb_out, depth_out = march_image(rays_o, rays_d)
    return np.asarray(rgb_out), np.asarray(depth_out)
