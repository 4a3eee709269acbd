"""Occupancy-grid empty-space skipping (core/occgrid.py): grid update
semantics, guided sample placement, and the end-to-end occ train step.
No reference equivalent — this is the flag-gated TPU perf path; the
default uniform sampling (parity-tested elsewhere) is untouched."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from plnerf.core import occgrid as og
from plnerf.core import render
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.core.mlp import init_nerf_params


CFG = og.OccGridConfig(resolution=16, candidates=32, decay=0.5,
                       threshold=0.1, floor=0.01)


def test_update_grid_scatter_max_and_decay():
    grid = og.init_grid([-1, -1, -1], [1, 1, 1], CFG)
    d0 = float(grid["density"][0, 0, 0])

    pts = jnp.array([[0.99, 0.99, 0.99],    # last voxel
                     [5.0, 0.0, 0.0]])       # out of bounds -> dropped
    sigma = jnp.array([7.0, 100.0])
    grid = og.update_grid(grid, pts, sigma, CFG)
    # mean-EMA toward the per-cell max observation: 0.5*1.0 + 0.5*7
    assert abs(float(grid["density"][15, 15, 15]) - 4.0) < 1e-6
    # nothing got the OOB 100
    assert float(grid["density"].max()) == 4.0
    # visited-only: voxels with no fresh observation keep their EMA
    # (global decay starves geometry between revisits — see update_grid)
    assert abs(float(grid["density"][0, 0, 0]) - d0) < 1e-6
    # low observation pulls the EMA down (spike robustness)
    grid = og.update_grid(grid, pts[:1], jnp.array([1.0]), CFG)
    assert abs(float(grid["density"][15, 15, 15]) - 2.5) < 1e-6
    assert abs(float(grid["density"][0, 0, 0]) - d0) < 1e-6
    # multiple samples in one voxel aggregate by max before blending
    grid2 = og.init_grid([-1, -1, -1], [1, 1, 1], CFG)
    grid2 = og.update_grid(
        grid2, jnp.array([[0.99] * 3, [0.95] * 3]), jnp.array([2.0, 9.0]),
        CFG)
    assert abs(float(grid2["density"][15, 15, 15]) - 5.0) < 1e-6


def test_refresh_occ_thresholds_and_dilates():
    grid = og.init_grid([-1, -1, -1], [1, 1, 1], CFG)
    grid["density"] = jnp.zeros_like(grid["density"]).at[8, 8, 8].set(1.0)
    grid = og.refresh_occ(grid, CFG)
    occ = np.asarray(grid["occ"])
    # the occupied voxel plus its one-voxel neighborhood (27 cells)
    assert occ.sum() == 27
    assert occ[8, 8, 8] == 1 and occ[7, 9, 8] == 1 and occ[8, 8, 9] == 1
    assert occ[8, 8, 10] == 0 and occ[6, 8, 8] == 0


def test_occ_guided_samples_concentrate_in_occupied_slab():
    cfg = dataclasses.replace(CFG, floor=0.01)
    grid = og.init_grid([-2, -2, -2], [2, 2, 2], cfg)
    # empty everywhere except a slab x in [0.5, 1.0] (rays travel +x)
    grid["density"] = jnp.zeros_like(grid["density"])
    g = cfg.resolution
    xs = (jnp.arange(g) + 0.5) / g * 4.0 - 2.0
    occ_x = (xs > 0.5) & (xs < 1.0)
    grid["density"] = jnp.where(occ_x[:, None, None], 1.0,
                                grid["density"])
    grid = og.refresh_occ(grid, cfg)

    R, N = 8, 64
    rays_o = jnp.tile(jnp.array([[-2.0, 0.0, 0.0]]), (R, 1))
    rays_d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (R, 1))
    near = jnp.zeros((R, 1))
    far = jnp.full((R, 1), 4.0)   # x from -2 to 2
    t_rand = jax.random.uniform(jax.random.key(0), (R, N))
    z, orf = og.occ_guided_z_vals(grid, rays_o, rays_d, near, far, N,
                                  t_rand, cfg)
    # the sampler surfaces the occupied-bin fraction (advisory signal):
    # the dilated slab covers ~(1.3-0.2)/4 of each ray
    assert 0.15 < float(orf) < 0.45, float(orf)
    assert z.shape == (R, N)
    assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)      # sorted
    assert float(z.min()) >= 0.0 and float(z.max()) <= 4.0
    x = np.asarray(rays_o[:, :1] + z * rays_d[:, :1])        # x coords
    # refresh_occ dilates the slab by one voxel (0.25) each side
    frac_in = np.mean((x > 0.2) & (x < 1.3))
    # occupied (dilated) slab is ~1/4 of the range but gets the vast
    # majority of the samples
    assert frac_in > 0.85, frac_in
    # the floor keeps SOME samples outside (death-spiral escape hatch)
    assert frac_in < 1.0
    # deterministic path (perturb=False) also works
    z_det, _ = og.occ_guided_z_vals(grid, rays_o, rays_d, near, far, N,
                                    None, cfg)
    assert np.all(np.isfinite(np.asarray(z_det)))


def _ray_batch(key, n_rays):
    k1, k2 = jax.random.split(key)
    rays_o = jnp.array([[0.0, 0.0, -3.0]]) + 0.1 * jax.random.normal(
        k1, (n_rays, 3))
    rays_d = jnp.array([0.0, 0.0, 1.0]) + 0.2 * jax.random.normal(
        k2, (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return jnp.concatenate(
        [rays_o, rays_d, jnp.full((n_rays, 1), 2.0),
         jnp.full((n_rays, 1), 5.0), rays_d], axis=-1)


def test_render_rays_occ_path_runs_and_matches_shapes():
    mcfg = ModelConfig(netdepth=2, netwidth=32, skips=(0,), multires=4,
                       multires_views=2)
    occ_cfg = og.OccGridConfig(resolution=16, candidates=32)
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="linear",
                        perturb=True, occ=occ_cfg)
    params = init_nerf_params(jax.random.key(0), mcfg)
    grid = og.init_grid([-2, -2, -2], [2, 2, 2], occ_cfg)
    rb = _ray_batch(jax.random.key(1), 12)

    ret = render.render_rays(params, params, rb, jax.random.key(2), mcfg,
                             rcfg, occ_grid=grid)
    assert ret["rgb_map"].shape == (12, 3)
    assert ret["occ_z"].shape == (12, 16 + 16 + 8)
    assert np.all(np.isfinite(np.asarray(ret["rgb_map"])))
    # occ config set but no grid passed -> falls back to uniform path and
    # matches the plain config exactly
    rcfg_plain = dataclasses.replace(rcfg, occ=None)
    a = render.render_rays(params, params, rb, jax.random.key(2), mcfg,
                           rcfg, occ_grid=None)
    b = render.render_rays(params, params, rb, jax.random.key(2), mcfg,
                           rcfg_plain)
    np.testing.assert_allclose(np.asarray(a["rgb_map"]),
                               np.asarray(b["rgb_map"]), rtol=1e-6)


def test_occ_train_step_trains_and_carves():
    """End-to-end on the sphere fixture: the occ step optimizes (PSNR
    rises) and the grid becomes selective (occupied fraction well below 1
    after decay while the sphere region stays occupied)."""
    from plnerf.data.synthetic import make_sphere_dataset
    from plnerf.train import batching, step as train_step

    images, poses, hwf, K = make_sphere_dataset(n_views=6, H=32, W=32)
    mcfg = ModelConfig(netdepth=4, netwidth=64, skips=(2,), multires=6,
                       multires_views=2)
    occ_cfg = og.OccGridConfig(resolution=32, candidates=64, decay=0.6,
                               threshold=0.5, floor=0.02)
    rcfg = RenderConfig(n_samples=16, n_importance=16, mode="linear",
                        white_bkgd=True, perturb=True, occ=occ_cfg)
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg, lrate=5e-3)
    state = train_step.init_state(jax.random.key(0), setup)
    stepf = train_step.make_occ_train_step(setup)
    grid = og.init_grid([-1.5, -1.5, -1.5], [1.5, 1.5, 1.5], occ_cfg)

    images_j = jnp.asarray(images)
    poses_j = jnp.asarray(poses)
    i_train = jnp.arange(images.shape[0])

    @jax.jit
    def batch_fn(key):
        return batching.sample_one_image_batch(
            images_j, poses_j, K, i_train, key, 256, 2.0, 6.0, True)

    psnrs = []
    key = jax.random.key(1)
    for i in range(120):
        key, kb, ks = jax.random.split(key, 3)
        rays, target, _ = batch_fn(kb)
        state, grid, metrics = stepf(
            state, grid, {"rays": rays, "target": target}, ks)
        psnrs.append(float(metrics["psnr"]))
        assert "_occ_z" not in metrics
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 2.0, (
        np.mean(psnrs[:10]), np.mean(psnrs[-10:]))
    occ_frac = float(jnp.mean(
        (grid["density"] > occ_cfg.threshold).astype(jnp.float32)))
    # visited-only decay carves the space training rays traverse; cells no
    # ray ever visited keep the optimistic init (uniform-equivalent there)
    assert occ_frac < 0.9, occ_frac
    assert occ_frac > 0.0
    # the sphere interior (center voxel) must stay occupied
    c = occ_cfg.resolution // 2
    assert float(grid["density"][c, c, c]) > occ_cfg.threshold
