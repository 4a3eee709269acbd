"""The volumetric renderer: coarse pass -> hierarchical importance
resampling -> fine pass, as a single jit-compilable function with static
shapes — no Python chunk loops in the hot path (the reference's
``batchify_rays``/``batchify`` memory chunking, run_plnerf.py:68-107, is
replaced by ``lax.map`` over fixed-size megachunks in the eval renderer
(eval/images.py _render_flat) and by XLA's own tiling inside a chunk).

Behavioral reference: ``render_rays`` (run_plnerf.py:627-758) and the
depth-supervision variant (depth_supervised_exps/
run_nerf_sample_based_depth.py:792-958), unified here with the variant
behaviors as explicit RenderConfig options.

RNG: a single jax PRNG key is split deterministically into
(perturb, coarse-noise, resample-u, fine-noise, pred-hyp-u) streams.  The
``overrides`` dict lets tests and the cached-u depth path inject exact
arrays for any stream (the JAX analogue of the reference's ``pytest=True``
seeded-numpy hooks and ``load_u``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import mlp, occgrid, quadrature, sampling
from .config import ModelConfig, RenderConfig


def _maybe(overrides: Optional[Dict[str, Any]], name: str):
    if overrides is None:
        return None
    return overrides.get(name)


def render_rays(
    params_coarse,
    params_fine,
    ray_batch: jnp.ndarray,
    key: jax.Array,
    mcfg: ModelConfig,
    rcfg: RenderConfig,
    cached_u: Optional[jnp.ndarray] = None,
    cam_embedding: Optional[jnp.ndarray] = None,
    overrides: Optional[Dict[str, Any]] = None,
    mcfg_fine: Optional[ModelConfig] = None,
    occ_grid=None,
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays.

    ray_batch: [R, 8] (``[o, d, near, far]``) or [R, 11] (+viewdirs).
    Returns the reference's ret dict: rgb_map/disp_map/acc_map/depth_map,
    coarse ``*0`` variants, z_std, and (when configured) raw, weights,
    z_vals, pred_hyp, u.
    """
    kp, knc, ku, knf, kh = jax.random.split(key, 5)
    R = ray_batch.shape[0]
    rays_o, rays_d = ray_batch[:, 0:3], ray_batch[:, 3:6]
    near, far = ray_batch[:, 6:7], ray_batch[:, 7:8]
    viewdirs = ray_batch[:, 8:11] if (rcfg.use_viewdirs and ray_batch.shape[-1] > 8) else None

    m = rcfg.effective_mode

    # ---- coarse sampling ----
    t_rand = _maybe(overrides, "t_rand")
    if t_rand is None and rcfg.perturb:
        t_rand = jax.random.uniform(kp, (R, rcfg.n_samples))
    if rcfg.occ is not None and occ_grid is not None:
        # occupancy-guided placement (core/occgrid.py); no reference
        # equivalent — flag-gated TPU perf path, uniform stays default
        z_vals, occ_ray_frac = occgrid.occ_guided_z_vals(
            occ_grid, rays_o, rays_d, near, far, rcfg.n_samples, t_rand,
            rcfg.occ,
        )
    else:
        z_vals = sampling.stratified_z_vals(
            near, far, rcfg.n_samples, rcfg.lindisp, t_rand
        )

    def run(params, z, noise_key, cfg=mcfg):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]

        def query(p, x):
            return mlp.query_network(
                p, x, viewdirs, cfg, cam_embedding,
                dtype=(jnp.bfloat16 if rcfg.mlp_dtype == "bfloat16"
                       else jnp.float32),
                use_pallas=rcfg.use_pallas_mlp,
                pallas_fold_heads=rcfg.pallas_fold_heads,
            )

        if rcfg.remat_mlp:
            query = jax.checkpoint(query)
        raw = query(params, pts)
        noise = 0.0
        if rcfg.raw_noise_std > 0.0:
            ov = _maybe(overrides, "noise")
            noise = (
                ov if ov is not None
                else jax.random.normal(noise_key, raw[..., 3].shape) * rcfg.raw_noise_std
            )
        out = quadrature.raw2outputs(
            raw, z, near, far, rays_d, m, rcfg.color_mode, noise,
            rcfg.white_bkgd, rcfg.farcolorfix,
        )
        out["raw"] = raw
        return out

    out_c = run(params_coarse, z_vals, knc)

    ret: Dict[str, jnp.ndarray] = {}
    # Dead-coarse detector (free): fraction of raw coarse densities that
    # pass the relu.  0.0 means relu kills every density gradient and
    # the coarse geometry can never recover — measured on every seed-0
    # fixture run in BOTH modes (BASELINE.md "dead-coarse anatomy"; the
    # downstream damage is mode-dependent: constant loses all gradients,
    # linear keeps color alive via the forced far boundary but its
    # importance samples collapse into the final interval).  Scalar;
    # eval renderers filter it out (eval/images._IMAGE_KEYS), the train
    # step surfaces it as a metric and the CLI raises an advisory.
    ret["sigma0_pos_frac"] = jnp.mean(
        (out_c["raw"][..., 3] > 0).astype(jnp.float32))
    det = not rcfg.perturb

    def resample(out, z, u):
        """Importance-sample new z values (one per column of u) from a
        pass's weights."""
        if m == "linear":
            samples, _, _, _ = sampling.sample_pdf_reformulation(
                z, out["weights"], out["tau"], out["T"], near, far, u,
                rcfg.zero_tol, rcfg.epsilon,
            )
        else:
            z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
            samples = sampling.sample_pdf(z_mid, out["weights"][..., 1:-1], u)
        return samples

    if rcfg.n_importance > 0:
        u = _maybe(overrides, "u")
        if u is None:
            u = sampling.draw_u(ku, R, rcfg.n_importance, det)
        z_samples = resample(out_c, z_vals, u)
        z_samples = jax.lax.stop_gradient(z_samples)  # detach (run_plnerf.py:728)
        z_samples = jnp.clip(z_samples, near, far)

        z_fine = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        params_f = params_fine if params_fine is not None else params_coarse
        cfg_f = mcfg if (mcfg_fine is None or params_fine is None) else mcfg_fine
        out_f = run(params_f, z_fine, knf, cfg_f)

        for k_ in ("rgb_map", "disp_map", "acc_map", "depth_map"):
            ret[k_] = out_f[k_]
        ret["rgb0"] = out_c["rgb_map"]
        ret["disp0"] = out_c["disp_map"]
        ret["acc0"] = out_c["acc_map"]
        ret["depth0"] = out_c["depth_map"]
        ret["z_std"] = jnp.std(z_samples, axis=-1)
        if rcfg.retraw:
            ret["raw"] = out_f["raw"]

        if rcfg.occ is not None:
            # density observations for the occupancy-grid EMA update (the
            # occ train step consumes + pops these; free — no extra evals)
            if occ_grid is not None:
                ret["occ_ray_frac"] = occ_ray_frac
            ret["occ_z"] = jnp.concatenate([z_vals, z_fine], axis=-1)
            ret["occ_sigma"] = jax.nn.relu(jnp.concatenate(
                [out_c["raw"][..., 3], out_f["raw"][..., 3]], axis=-1))

        if rcfg.compute_pred_hyp:
            # Depth-supervision quantiles from the FINE weights; NOT detached
            # — gradients flow through the analytic inverse-CDF into tau/T
            # (depth script render_rays :920-934).
            uh = cached_u
            if uh is None:
                uh = _maybe(overrides, "u_hyp")
            if uh is None:
                uh = sampling.draw_u(kh, R, rcfg.n_importance, det, rcfg.is_joint)
            pred_hyp = resample(out_f, z_fine, uh)
            ret["pred_hyp"] = pred_hyp
            ret["u"] = uh
            w = out_f["weights"]
            ret["weights"] = w[..., 1:] if (m == "linear" and rcfg.trim_first_weight) else w
            ret["z_vals"] = z_fine
            ret["weights0"] = out_c["weights"]
            ret["z_vals0"] = z_vals
    else:
        for k_ in ("rgb_map", "disp_map", "acc_map", "depth_map"):
            ret[k_] = out_c[k_]
        if rcfg.retraw:
            ret["raw"] = out_c["raw"]
        if rcfg.occ is not None:
            if occ_grid is not None:
                ret["occ_ray_frac"] = occ_ray_frac
            ret["occ_z"] = z_vals
            ret["occ_sigma"] = jax.nn.relu(out_c["raw"][..., 3])
        if rcfg.compute_pred_hyp:
            uh = cached_u
            if uh is None:
                uh = _maybe(overrides, "u_hyp")
            if uh is None:
                uh = sampling.draw_u(kh, R, rcfg.n_samples, det, rcfg.is_joint)
            pred_hyp = resample(out_c, z_vals, uh)
            ret["pred_hyp"] = pred_hyp
            ret["u"] = uh
            w = out_c["weights"]
            ret["weights"] = w[..., 1:] if (m == "linear" and rcfg.trim_first_weight) else w
            ret["z_vals"] = z_vals
    return ret


def make_ray_batch(rays_o, rays_d, near, far, use_viewdirs: bool,
                   ndc: bool = False, H: int = 0, W: int = 0,
                   focal: float = 0.0):
    """Flatten + pack rays the way the reference ``render`` frontend does
    (run_plnerf.py:136-164): viewdirs from pre-NDC directions, normalized;
    optional NDC warp with near=1."""
    from . import rays as raysmod

    sh = rays_d.shape
    viewdirs = None
    if use_viewdirs:
        viewdirs = rays_d
        viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    if ndc:
        rays_o, rays_d = raysmod.ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    packed = raysmod.pack_rays(rays_o, rays_d, near, far, viewdirs)
    return packed, sh[:-1]
