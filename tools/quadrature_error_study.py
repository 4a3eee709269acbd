#!/usr/bin/env python
"""Quadrature truncation error vs sample count — the paper's core math
claim measured directly, no networks.

PL-NeRF's thesis (paper §4; reference compute_weights_piecewise_linear,
run_plnerf.py:516-550) is that piecewise-LINEAR transmittance quadrature
is a consistent estimator of the volume-rendering integral while the
classic piecewise-CONSTANT left-endpoint rule carries an O(h) bias.
Every training study entangles that with optimization dynamics; this
tool strips all of it away: evaluate an ANALYTIC density/albedo field at
the same N sample points and composite with both shipped quadratures
(core/quadrature.raw2outputs), then compare against a dense float64
reference integral (n=32768 trapezoid transmittance).

Fields:
* ``smooth`` — sum of Gaussian blobs with smooth albedo: the regime the
  paper's Taylor argument assumes (tau continuous).  Expected: linear
  error decays ~2x faster per octave (O(h^2) vs O(h) pointwise).
* ``hard``  — the binary multi-object fixture field
  (data/synthetic._scene_sigma_rgb): discontinuous tau, both rules
  degrade toward O(h); measures the practical gap on this repo's
  standard scene.

Fairness controls: identical deterministic stratified-midpoint z sets
feed both modes; rays are restricted to those the reference integral
fully saturates (T(far) < 1e-4) so the two modes' different far-boundary
conventions (linear's opaque TAU_FAR=1e10 interval, constant's 1e10
last dist) contribute nothing; white_bkgd off; float64 end to end so
only truncation error remains.

Rows -> convergence_runs.jsonl (run=quadrature-error).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "convergence_runs.jsonl")

NEAR, FAR = 2.0, 6.0

_BLOBS = [  # (center, radius, amplitude, base color)
    ((0.0, 0.0, 0.0), 0.9, 28.0, (0.8, 0.3, 0.2)),
    ((0.9, 0.5, -0.2), 0.5, 40.0, (0.2, 0.7, 0.3)),
    ((-0.8, -0.4, 0.3), 0.6, 33.0, (0.25, 0.35, 0.85)),
    ((0.2, -0.9, -0.4), 0.4, 50.0, (0.85, 0.8, 0.25)),
]


def smooth_sigma_rgb(pts: np.ndarray):
    """C-infinity density + albedo field on [..., 3] points."""
    sigma = np.zeros(pts.shape[:-1])
    rgb_acc = np.zeros(pts.shape[:-1] + (3,))
    wsum = np.full(pts.shape[:-1], 1e-12)
    for (c, r, a, col) in _BLOBS:
        d2 = ((pts - np.asarray(c)) ** 2).sum(-1)
        w = a * np.exp(-0.5 * d2 / r**2)
        sigma += w
        rgb_acc += w[..., None] * np.asarray(col)
        wsum += w
    rgb = rgb_acc / wsum[..., None]
    # smooth spatial tint so color varies within each blob too
    rgb = 0.75 * rgb + 0.25 * (0.5 + 0.35 * np.sin(1.7 * pts))
    return sigma, np.clip(rgb, 1e-4, 1 - 1e-4)


def hard_sigma_rgb(pts: np.ndarray):
    from plnerf.data.synthetic import _scene_sigma_rgb

    sigma, rgb = _scene_sigma_rgb(pts.astype(np.float32), density=80.0)
    return sigma.astype(np.float64), np.clip(
        rgb.astype(np.float64), 1e-4, 1 - 1e-4)


def make_rays(n_side=48, radius=4.0):
    from plnerf.data.synthetic import pose_spherical_np

    c2w = pose_spherical_np(37.0, -32.0, radius)
    focal = 0.5 * n_side / np.tan(0.25)
    i, j = np.meshgrid(np.arange(n_side, dtype=np.float64),
                       np.arange(n_side, dtype=np.float64), indexing="xy")
    dirs = np.stack([(i - n_side / 2) / focal,
                     -(j - n_side / 2) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T.astype(np.float64)
    rays_o = np.broadcast_to(c2w[:3, 3].astype(np.float64), rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def reference_render(field, rays_o, rays_d, n_dense=32768, chunk=128):
    """Dense f64 reference: T from cumulative-trapezoid of tau along the
    ray (arc length), rgb = sum (T_i - T_{i+1}) * c_mid.  Chunked over
    rays (the [R, n_dense, 3] point tensor would be ~2 GB otherwise)."""
    t = np.linspace(NEAR, FAR, n_dense)
    t_mid = 0.5 * (t[1:] + t[:-1])
    outs = []
    for r0 in range(0, len(rays_o), chunk):
        ro, rd = rays_o[r0:r0 + chunk], rays_d[r0:r0 + chunk]
        pts = ro[:, None, :] + rd[:, None, :] * t[None, :, None]
        sigma, rgb = field(pts)
        norm = np.linalg.norm(rd, axis=-1)[:, None]
        dt = (t[1:] - t[:-1])[None, :] * norm
        seg = 0.5 * (sigma[:, 1:] + sigma[:, :-1]) * dt      # trapezoid
        T = np.exp(-np.concatenate(
            [np.zeros((len(ro), 1)), np.cumsum(seg, -1)], -1))
        dT = T[:, :-1] - T[:, 1:]
        c_mid = 0.5 * (rgb[:, 1:] + rgb[:, :-1])
        outs.append(((dT[..., None] * c_mid).sum(1),
                     (dT * t_mid[None, :]).sum(1), T[:, -1]))
    rgb_ref = np.concatenate([o[0] for o in outs])
    depth_ref = np.concatenate([o[1] for o in outs])
    T_far = np.concatenate([o[2] for o in outs])
    return rgb_ref, depth_ref, T_far


def _z_for(n: int, R: int, convention: str, rng=None):
    """Sample placements.  ``linspace`` is the production perturb=0
    convention (reference run_plnerf.py:683-705 / core/sampling.py);
    ``stratified`` is perturb=1 (uniform within mid-bins, per ray);
    ``midpoint`` is the deterministic composite-midpoint placement kept
    as a diagnostic (it makes the constant rule super-convergent — see
    BASELINE.md discussion)."""
    t = np.linspace(NEAR, FAR, n)
    z = np.broadcast_to(t, (R, n)).copy()
    if convention == "linspace":
        return z
    if convention == "midpoint":
        tm = NEAR + (np.arange(n) + 0.5) / n * (FAR - NEAR)
        return np.broadcast_to(tm, (R, n)).copy()
    # stratified: jitter within mid-bins, the sampler's perturb=1 rule
    mids = 0.5 * (t[1:] + t[:-1])
    upper = np.concatenate([mids, [FAR]])
    lower = np.concatenate([[NEAR], mids])
    u = rng.random((R, n))
    return lower + (upper - lower) * u


def estimate(field, rays_o, rays_d, z: np.ndarray, mode: str,
             color_mode: str = "midpoint"):
    """Composite through the production raw2outputs on the given z
    (identical z feeds both modes)."""
    import jax.numpy as jnp

    from plnerf.core.quadrature import raw2outputs

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    sigma, rgb = field(pts)
    raw = np.concatenate(
        [np.log(rgb / (1.0 - rgb)), sigma[..., None]], axis=-1)
    R = len(rays_o)
    near = np.full((R, 1), NEAR)
    far = np.full((R, 1), FAR)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(near),
                      jnp.asarray(far), jnp.asarray(rays_d), mode=mode,
                      color_mode=color_mode, white_bkgd=False)
    return (np.asarray(out["rgb_map"]), np.asarray(out["depth_map"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fields", default="smooth,hard")
    ap.add_argument("--counts", default="8,16,32,64,128,256,512")
    ap.add_argument("--n_side", type=int, default=48)
    ap.add_argument("--conventions", default="linspace,stratified",
                    help="z placements: linspace (perturb=0), stratified "
                         "(perturb=1, averaged over --draws), midpoint "
                         "(diagnostic)")
    ap.add_argument("--draws", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    counts = [int(c) for c in args.counts.split(",")]
    rays_o, rays_d = make_rays(args.n_side)
    for fname in args.fields.split(","):
        field = smooth_sigma_rgb if fname == "smooth" else hard_sigma_rgb
        t0 = time.time()
        rgb_ref, depth_ref, T_far = reference_render(field, rays_o, rays_d)
        keep = T_far < 1e-4          # saturated rays only (see docstring)
        print(f"[{fname}] {keep.sum()}/{len(keep)} saturated rays",
              flush=True)
        for conv in args.conventions.split(","):
            for n in counts:
                rec = {"run": "quadrature-error", "field": fname,
                       "z": conv, "n": n, "rays": int(keep.sum())}
                for mode in ("linear", "constant"):
                    if conv == "stratified":
                        rng = np.random.default_rng(11)
                        acc_rgb = acc_depth = 0.0
                        for _ in range(args.draws):
                            z = _z_for(n, len(rays_o), conv, rng)
                            rgb_e, depth_e = estimate(
                                field, rays_o, rays_d, z, mode)
                            acc_rgb += ((rgb_e - rgb_ref)[keep] ** 2).mean()
                            acc_depth += (
                                (depth_e - depth_ref)[keep] ** 2).mean()
                        rec[f"rgb_mse_{mode}"] = float(
                            acc_rgb / args.draws)
                        rec[f"depth_mse_{mode}"] = float(
                            acc_depth / args.draws)
                    else:
                        z = _z_for(n, len(rays_o), conv)
                        rgb_e, depth_e = estimate(
                            field, rays_o, rays_d, z, mode)
                        rec[f"rgb_mse_{mode}"] = float(
                            ((rgb_e - rgb_ref)[keep] ** 2).mean())
                        rec[f"depth_mse_{mode}"] = float(
                            ((depth_e - depth_ref)[keep] ** 2).mean())
                rec["mse_ratio_c_over_l"] = round(
                    rec["rgb_mse_constant"] / rec["rgb_mse_linear"], 3)
                rec["elapsed_s"] = round(time.time() - t0, 1)
                with open(OUT, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
