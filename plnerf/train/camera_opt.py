"""Test-time camera-embedding optimization (reference
depth_supervised_exps/run_nerf_sample_based_depth.py:311-347):
freeze the NeRF, optimize a per-image camera embedding by photometric loss
over the full image in random pixel batches; Adam(lr=0.5) with a
ReduceLROnPlateau(max, factor=0.5, patience=3) schedule on PSNR; keep the
best-PSNR embedding.

TPU design: one jitted step = (render batch + loss + grad + Adam update on
the embedding only); the per-epoch batch loop is a ``lax.map`` over a fixed
partition of the pixel grid.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..core import render
from ..core import rays as raysmod
from ..core.config import ModelConfig, RenderConfig
from ..utils.misc import img2mse, mse2psnr


def optimize_camera_embedding(
    params_c,
    params_f,
    image: np.ndarray,            # [H, W, 3]
    pose,                         # [3|4, 4]
    intrinsic,                    # (fx, fy, cx, cy) vector or K matrix
    mcfg: ModelConfig,
    rcfg: RenderConfig,
    near: float,
    far: float,
    n_rand: int = 1024,
    epochs: int = 100,
    lr: float = 0.5,
    seed: int = 0,
    verbose: bool = False,
) -> jnp.ndarray:
    """Returns the best embedding [input_ch_cam]."""
    H, W = image.shape[:2]
    intrinsic = np.asarray(intrinsic, np.float32)
    if intrinsic.ndim == 2:
        intrinsic = np.array(
            [intrinsic[0, 0], intrinsic[1, 1], intrinsic[0, 2],
             intrinsic[1, 2]], np.float32)

    rays_o, rays_d = raysmod.get_rays_pixelcenter(
        H, W, intrinsic, jnp.asarray(pose)[:3, :4])
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    packed = raysmod.pack_rays(
        rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), near, far,
        viewdirs.reshape(-1, 3))
    target = jnp.asarray(image.reshape(-1, 3), jnp.float32)

    # fixed random partition into 2*n_rand batches (reference uses
    # create_random_subsets(range(H*W), 2*N_rand))
    n = packed.shape[0]
    bs = min(2 * n_rand, n)
    n_batches = n // bs
    perm = np.random.default_rng(seed).permutation(n)[: n_batches * bs]
    rays_b = jnp.asarray(packed[perm].reshape(n_batches, bs, -1))
    target_b = jnp.asarray(target[perm].reshape(n_batches, bs, 3))

    rcfg = dataclasses.replace(rcfg, perturb=False, raw_noise_std=0.0,
                               compute_pred_hyp=False)
    tx = optax.adam(learning_rate=1.0)  # lr applied via scale below
    emb0 = jnp.zeros((mcfg.input_ch_cam,), jnp.float32)
    opt0 = tx.init(emb0)

    @jax.jit
    def epoch(emb, opt_state, lr_scale, key):
        def loss_fn(e):
            def one(args):
                rb, tb, k = args
                ret = render.render_rays(
                    params_c, params_f, rb, k, mcfg, rcfg,
                    cam_embedding=e)
                return img2mse(ret["rgb_map"], tb)

            keys = jax.random.split(key, n_batches)
            losses = jax.lax.map(one, (rays_b, target_b, keys))
            return jnp.sum(losses)

        loss, g = jax.value_and_grad(loss_fn)(emb)
        updates, opt_state = tx.update(g, opt_state, emb)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        emb = optax.apply_updates(emb, updates)
        return emb, opt_state, loss

    emb, opt_state = emb0, opt0
    best_emb, max_psnr = emb0, -jnp.inf
    lr_scale, plateau = float(lr), 0
    key = jax.random.PRNGKey(seed)
    for i in range(epochs):
        key, k = jax.random.split(key)
        emb, opt_state, loss = epoch(emb, opt_state, lr_scale, k)
        psnr = float(mse2psnr(loss / n_batches))
        if psnr > float(max_psnr):
            max_psnr, best_emb, plateau = psnr, emb, 0
            if verbose:
                print(f"  cam-opt step {i}: PSNR {psnr:.2f}")
        else:
            plateau += 1
            if plateau > 3:            # ReduceLROnPlateau(patience=3)
                lr_scale *= 0.5
                plateau = 0
    return best_emb
