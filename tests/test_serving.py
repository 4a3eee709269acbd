"""Serving-artifact tests (plnerf/serving/): export a model into a
self-contained jax.export module, reload it, and check numerical parity
with the in-process renderer, padding behavior, occ-grid embedding, and
the --task export_serving CLI end-to-end.  The reference has no serving
path (eval lives inside its training scripts, run_plnerf.py:284-363) —
this subsystem is a TPU-native addition."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_blender_scene
from plnerf.core import render
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.core.mlp import init_nerf_params
from plnerf.eval import images as EI
from plnerf.serving import export as SE
from plnerf.serving.runtime import ServingRenderer

MCFG = ModelConfig(netdepth=2, netwidth=32, multires=4, multires_views=2)


def _params():
    return (init_nerf_params(jax.random.key(0), MCFG),
            init_nerf_params(jax.random.key(1), MCFG))


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    return np.concatenate(
        [o, d, np.full((n, 1), 2.0, np.float32),
         np.full((n, 1), 6.0, np.float32), d], -1)


def test_export_roundtrip_matches_direct_render(tmp_path):
    pc, pf = _params()
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="linear",
                        white_bkgd=True, perturb=True, raw_noise_std=0.0)
    man = SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=64)
    assert man["ray_dim"] == 11 and man["chunk"] == 64
    assert set(man["output_keys"]) >= {"rgb_map", "depth_map", "rgb0"}

    r = ServingRenderer.load(str(tmp_path))
    # 150 rays: exercises the pad-to-chunk path (64*3=192, trim to 150)
    rays = _rays(150)
    out = r.render_rays(rays, seed=7)
    assert all(v.shape[0] == 150 for v in out.values())

    # chunk 0 must equal an in-process render_rays under the same key
    direct = render.render_rays(pc, pf, jnp.asarray(rays[:64]),
                                jax.random.PRNGKey(7), MCFG, rcfg)
    for k in man["output_keys"]:
        np.testing.assert_allclose(out[k][:64], np.asarray(direct[k]),
                                   atol=1e-5, err_msg=k)


def test_render_image_matches_eval_renderer(tmp_path):
    """Deterministic placement -> the artifact's image equals the eval
    frontend's image regardless of per-chunk keying."""
    pc, pf = _params()
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="constant",
                        white_bkgd=True, perturb=False, raw_noise_std=0.0)
    SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=128)
    r = ServingRenderer.load(str(tmp_path))

    H = W = 16
    focal = 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    served = r.render_image(c2w, (H, W, focal), K)
    ref = EI.render_image(pc, pf, c2w, (H, W, focal), K, MCFG, rcfg,
                          jax.random.PRNGKey(0), chunk=128)
    np.testing.assert_allclose(served["rgb_map"], ref["rgb_map"],
                               atol=1e-5)
    np.testing.assert_allclose(served["depth_map"], ref["depth_map"],
                               atol=1e-4)


def test_export_embeds_occ_grid(tmp_path):
    """An occ-trained model exports with its grid baked in: the artifact
    reproduces grid-guided sampling with no grid file at serve time."""
    from plnerf.core import occgrid as og

    pc, pf = _params()
    ocfg = og.OccGridConfig(resolution=16, candidates=24)
    grid = og.init_grid([-1.5] * 3, [1.5] * 3, ocfg)
    # carve a nontrivial grid so guidance differs from uniform
    grid = dict(grid,
                density=jnp.zeros((16, 16, 16)).at[4:12, 4:12, 4:12]
                .set(10.0),
                occ=jnp.zeros((16, 16, 16)).at[4:12, 4:12, 4:12].set(1.0))
    rcfg = RenderConfig(n_samples=8, n_importance=8, mode="linear",
                        white_bkgd=True, perturb=True, occ=ocfg)
    man = SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=64,
                             occ_grid=grid)
    assert man["occ_grid_embedded"] is True
    r = ServingRenderer.load(str(tmp_path))
    rays = _rays(64)
    out = r.render_rays(rays, seed=3)
    direct = render.render_rays(pc, pf, jnp.asarray(rays),
                                jax.random.PRNGKey(3), MCFG, rcfg,
                                occ_grid=grid)
    np.testing.assert_allclose(out["rgb_map"], np.asarray(direct["rgb_map"]),
                               atol=1e-5)


def test_cli_export_serving_task(tmp_path):
    """train (tiny) -> --task export_serving -> load artifact -> render."""
    from plnerf.cli.run_plnerf import main as plnerf_main

    scene = tmp_path / "data" / "tinyscene"
    make_blender_scene(str(scene), n_train=2, n_val=1, n_test=1)
    ckpt_dir = str(tmp_path / "ckpts")
    common = [
        "--dataset", "blender", "--no_batching", "--use_viewdirs",
        "--white_bkgd", "--N_rand", "64", "--N_samples", "8",
        "--N_importance", "8", "--netdepth", "2", "--netwidth", "16",
        "--multires", "4", "--multires_views", "2", "--chunk", "256",
        "--data_dir", str(tmp_path / "data"), "--scene_id", "tinyscene",
        "--ckpt_dir", ckpt_dir, "--expname", "exp",
        "--i_print", "1000000", "--i_img", "1000000",
        "--i_testset", "1000000", "--i_video", "1000000",
        "--testskip", "1",
    ]
    plnerf_main(["--task", "train", "--mode", "linear",
                 "--num_iterations", "6", "--i_weights", "6",
                 "--precrop_iters", "0", "--constant_init", "0"] + common)
    out_dir = str(tmp_path / "artifact")
    plnerf_main(["--task", "export_serving", "--ckpt_dir", ckpt_dir,
                 "--expname", "exp", "--serve_out", out_dir,
                 "--eval_det"])
    man = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert man["provenance"]["step"] == 6
    assert man["perturb"] is False  # --eval_det baked in
    assert man["chunk"] == 256     # from the trained args.json

    r = ServingRenderer.load(out_dir)
    out = r.render_rays(_rays(10))
    assert out["rgb_map"].shape == (10, 3)
    assert np.isfinite(out["rgb_map"]).all()

    # --serve_weights args: weights ride the npz sidecar, same render
    args_dir = str(tmp_path / "artifact_args")
    plnerf_main(["--task", "export_serving", "--ckpt_dir", ckpt_dir,
                 "--expname", "exp", "--serve_out", args_dir,
                 "--eval_det", "--serve_weights", "args"])
    man2 = json.load(open(os.path.join(args_dir, "manifest.json")))
    assert man2["weights_mode"] == "args"
    r2 = ServingRenderer.load(args_dir)
    out2 = r2.render_rays(_rays(10))
    np.testing.assert_array_equal(out["rgb_map"], out2["rgb_map"])


def test_multi_device_serving_matches_single(tmp_path):
    """devices=: chunks round-robin across the 8-device virtual mesh and
    the image equals single-device bit-for-bit (per-chunk rng is keyed by
    chunk index, not placement)."""
    pc, pf = _params()
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="linear",
                        white_bkgd=True, perturb=True)
    SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=64)

    devs = jax.devices()
    assert len(devs) >= 8  # conftest forces the virtual mesh
    single = ServingRenderer.load(str(tmp_path))
    multi = ServingRenderer.load(str(tmp_path), devices=devs)

    rays = _rays(64 * 8 + 17)  # > one round-robin lap + a padded tail
    out1 = single.render_rays(rays, seed=5)
    outn = multi.render_rays(rays, seed=5)
    for k in out1:
        np.testing.assert_array_equal(out1[k], outn[k])


def test_export_with_distinct_fine_dims(tmp_path):
    """--netdepth_fine/--netwidth_fine models export and serve correctly
    (mcfg_fine threads through build_chunk_fn)."""
    import dataclasses

    mcfg_fine = dataclasses.replace(MCFG, netdepth=3, netwidth=48,
                                    skips=(1,))
    pc = init_nerf_params(jax.random.key(0), MCFG)
    pf = init_nerf_params(jax.random.key(1), mcfg_fine)
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="constant",
                        white_bkgd=True, perturb=True)
    SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=64,
                       mcfg_fine=mcfg_fine)
    r = ServingRenderer.load(str(tmp_path))
    rays = _rays(64)
    out = r.render_rays(rays, seed=11)
    direct = render.render_rays(pc, pf, jnp.asarray(rays),
                                jax.random.PRNGKey(11), MCFG, rcfg,
                                mcfg_fine=mcfg_fine)
    np.testing.assert_allclose(out["rgb_map"], np.asarray(direct["rgb_map"]),
                               atol=1e-5)


def test_fused_image_module_matches_eval_frontend(tmp_path):
    """fused_n_rays: the whole-image module is the eval frontend's exact
    program (eval/images._render_flat_local incl. its split-per-chunk key
    semantics), so with perturb ON and the same key the artifact equals
    EI.render_image bit-for-bit; non-matching ray counts fall back to the
    per-chunk path."""
    pc, pf = _params()
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="linear",
                        white_bkgd=True, perturb=True)
    H = W = 16
    man = SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=64,
                             fused_n_rays=H * W)
    assert man["fused_n_rays"] == 256  # 16*16 already a chunk multiple
    assert os.path.exists(os.path.join(str(tmp_path), "module_fused.bin"))
    r = ServingRenderer.load(str(tmp_path))
    assert r._fused_call is not None

    focal = 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    served = r.render_image(c2w, (H, W, focal), K, seed=0)
    ref = EI.render_image(pc, pf, c2w, (H, W, focal), K, MCFG, rcfg,
                          jax.random.PRNGKey(0), chunk=64)
    np.testing.assert_array_equal(served["rgb_map"],
                                  np.asarray(ref["rgb_map"]))

    # a non-matching count uses the per-chunk path and still works
    out = r.render_rays(_rays(100), seed=0)
    assert out["rgb_map"].shape == (100, 3)


def test_weights_as_args_export_matches_baked(tmp_path):
    """weights_mode="args" (round 4): the module takes the weight leaves
    as call arguments (weights.npz sidecar, staged once at load —
    measured 1.18x vs baked constants on TPU, BASELINE.md serving
    decomposition) and must be numerically IDENTICAL to the baked
    artifact: same program, same weights, only the calling convention
    differs.  Covers the chunked path, the fused whole-image module,
    and multi-device round-robin."""
    pc, pf = _params()
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="linear",
                        white_bkgd=True, perturb=True)
    H = W = 16
    baked_dir, args_dir = str(tmp_path / "b"), str(tmp_path / "a")
    SE.export_renderer(pc, pf, MCFG, rcfg, baked_dir, chunk=64,
                       fused_n_rays=H * W)
    man = SE.export_renderer(pc, pf, MCFG, rcfg, args_dir, chunk=64,
                             fused_n_rays=H * W, weights_mode="args")
    assert man["weights_mode"] == "args" and man["n_weight_leaves"] > 0
    assert os.path.exists(os.path.join(args_dir, "weights.npz"))

    baked = ServingRenderer.load(baked_dir)
    srv = ServingRenderer.load(args_dir)
    rays = _rays(150)  # exercises padding
    out_b = baked.render_rays(rays, seed=7)
    out_a = srv.render_rays(rays, seed=7)
    for k in out_b:
        np.testing.assert_array_equal(out_b[k], out_a[k])

    # fused whole-image module under args mode
    focal = 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    img_b = baked.render_image(c2w, (H, W, focal), K, seed=0)
    img_a = srv.render_image(c2w, (H, W, focal), K, seed=0)
    np.testing.assert_array_equal(img_b["rgb_map"], img_a["rgb_map"])

    # multi-device round-robin stages the leaves per device
    devs = jax.devices()
    multi = ServingRenderer.load(args_dir, devices=devs)
    outn = multi.render_rays(_rays(64 * 8 + 17), seed=5)
    out1 = srv.render_rays(_rays(64 * 8 + 17), seed=5)
    for k in out1:
        np.testing.assert_array_equal(out1[k], outn[k])


def test_output_key_selection(tmp_path):
    """keys=: fetch only the requested maps (D2H is the dominant host
    cost at image scale — rgb-only measured +20% images/s at 800² on
    TPU, BASELINE.md round-4 fetch-volume probe).  Values must equal
    the full fetch on both the chunked and fused paths."""
    pc, pf = _params()
    rcfg = RenderConfig(n_samples=16, n_importance=8, mode="linear",
                        white_bkgd=True, perturb=True)
    H = W = 16
    SE.export_renderer(pc, pf, MCFG, rcfg, str(tmp_path), chunk=64,
                       fused_n_rays=H * W)
    r = ServingRenderer.load(str(tmp_path))

    rays = _rays(150)  # chunked path (not the fused count)
    full = r.render_rays(rays, seed=3)
    rgb = r.render_rays(rays, seed=3, keys=["rgb_map"])
    assert set(rgb) == {"rgb_map"}
    np.testing.assert_array_equal(rgb["rgb_map"], full["rgb_map"])

    focal = 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    img_full = r.render_image(c2w, (H, W, focal), K, seed=0)
    img_sel = r.render_image(c2w, (H, W, focal), K, seed=0,
                             keys=["rgb_map", "depth_map"])
    assert set(img_sel) == {"rgb_map", "depth_map"}
    np.testing.assert_array_equal(img_sel["rgb_map"], img_full["rgb_map"])
    np.testing.assert_array_equal(img_sel["depth_map"],
                                  img_full["depth_map"])
