"""Golden full-pipeline parity: our jitted render_rays vs the reference
render_rays (run_plnerf.py), on identical weights and identical injected
random draws.  The reference module is imported with its missing eval-only
deps stubbed (lpips/skimage/torchvision/... are not used by render_rays)."""
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import reference_available, load_reference_module
from plnerf.core import render
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.checkpoint import convert_torch

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_plnerf():
    # stub eval-only deps that are absent in this image
    _stub("torchvision")
    _stub("torchvision.utils", make_grid=lambda *a, **k: None)
    _stub("skimage")
    _stub("skimage.metrics", structural_similarity=lambda *a, **k: 0.0)
    _stub("lpips", LPIPS=lambda *a, **k: None)
    _stub("configargparse", ArgumentParser=object)
    _stub("natsort", natsorted=sorted)
    # run_plnerf does `from run_nerf_helpers import *` and imports the
    # loaders by module name — put the reference dir on sys.path for the
    # import, then remove it.
    sys.path.insert(0, "/root/reference")
    try:
        mod = load_reference_module("ref_plnerf", "run_plnerf.py")
    finally:
        sys.path.remove("/root/reference")
    return mod


@pytest.fixture(scope="module")
def torch_models(ref_plnerf):
    helpers = sys.modules["ref_plnerf"]
    mcfg = ModelConfig()
    coarse = helpers.NeRF(
        D=8, W=256, input_ch=mcfg.input_ch, input_ch_views=mcfg.input_ch_views,
        output_ch=5, skips=[4], use_viewdirs=True)
    fine = helpers.NeRF(
        D=8, W=256, input_ch=mcfg.input_ch, input_ch_views=mcfg.input_ch_views,
        output_ch=5, skips=[4], use_viewdirs=True)
    return mcfg, coarse, fine


def _ray_batch(R=64, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = (rng.standard_normal((R, 3)) * 0.2).astype(np.float32)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, -1, keepdims=True)
    near = np.full((R, 1), 2.0, np.float32)
    far = np.full((R, 1), 6.0, np.float32)
    return np.concatenate(
        [rays_o, rays_d, near, far, viewdirs], -1
    ).astype(np.float32)


def _reference_render(ref, coarse, fine, ray_batch, mode, t_rand, u,
                      n_samples, n_importance, constant_init=False):
    import torch

    def query(inputs, viewdirs, network_fn):
        embed_fn, _ = sys.modules["ref_plnerf"].get_embedder(10)
        embeddirs_fn, _ = sys.modules["ref_plnerf"].get_embedder(4)
        return ref.run_network(
            inputs, viewdirs, network_fn, embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    # perturb>0 uses torch.rand; intercept by monkeypatching torch.rand to
    # return our fixed draws in call order (z-jitter, then importance u)
    draws = [torch.from_numpy(t_rand), torch.from_numpy(u)]
    orig_rand = torch.rand

    def fake_rand(*shape, **kw):
        d = draws.pop(0)
        assert tuple(d.shape) == tuple(
            shape[0] if len(shape) == 1 and isinstance(shape[0], (list, tuple))
            else shape
        ), (d.shape, shape)
        return d

    torch.rand = fake_rand
    try:
        with torch.no_grad():
            ret = ref.render_rays(
                torch.from_numpy(ray_batch),
                network_fn=coarse,
                network_query_fn=query,
                N_samples=n_samples,
                mode=mode,
                color_mode="midpoint",
                retraw=False,
                lindisp=False,
                perturb=1.0,
                N_importance=n_importance,
                network_fine=fine,
                white_bkgd=True,
                raw_noise_std=0.0,
                constant_init=constant_init,
            )
    finally:
        torch.rand = orig_rand
    return {k: v.numpy() for k, v in ret.items()}


@pytest.mark.parametrize("mode,constant_init", [
    ("constant", False), ("linear", False), ("linear", True),
])
def test_render_rays_full_parity(ref_plnerf, torch_models, mode, constant_init):
    mcfg, coarse, fine = torch_models
    R, NS, NI = 64, 32, 16
    rng = np.random.default_rng(7)
    ray_batch = _ray_batch(R)
    t_rand = rng.random((R, NS)).astype(np.float32)
    u = rng.random((R, NI)).astype(np.float32)

    ref_out = _reference_render(
        ref_plnerf, coarse, fine, ray_batch, mode, t_rand, u, NS, NI,
        constant_init)

    params_c = jax.tree.map(
        jnp.asarray, convert_torch.state_dict_to_params(coarse.state_dict()))
    params_f = jax.tree.map(
        jnp.asarray, convert_torch.state_dict_to_params(fine.state_dict()))
    rcfg = RenderConfig(
        n_samples=NS, n_importance=NI, mode=mode, color_mode="midpoint",
        white_bkgd=True, perturb=True, constant_init=constant_init,
    )
    ours = render.render_rays(
        params_c, params_f, jnp.asarray(ray_batch), jax.random.key(0),
        mcfg, rcfg,
        overrides={"t_rand": jnp.asarray(t_rand), "u": jnp.asarray(u)},
    )

    for k in ("rgb_map", "acc_map", "depth_map", "rgb0", "z_std"):
        np.testing.assert_allclose(
            np.asarray(ours[k]), ref_out[k], rtol=2e-3, atol=2e-4,
            err_msg=f"{mode}/{constant_init}/{k}",
        )


@pytest.mark.parametrize("mode,color_mode,farcolorfix,white_bkgd", [
    ("linear", "midpoint", False, False),
    ("linear", "midpoint", True, True),
    ("linear", "left", False, True),
    ("constant", "midpoint", False, False),
    ("constant", "midpoint", False, True),
])
def test_raw2outputs_golden(ref_plnerf, mode, color_mode, farcolorfix,
                            white_bkgd):
    """Direct compositing parity vs reference raw2outputs
    (run_plnerf.py:553-624) across the full variant grid, including the
    sigma-noise injection path."""
    import torch

    from plnerf.core import quadrature

    R, S = 32, 24
    rng = np.random.default_rng(5)
    raw = rng.standard_normal((R, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    near = np.full((R, 1), 2.0, np.float32)
    far = np.full((R, 1), 6.0, np.float32)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    # raw standard normal: the reference multiplies by raw_noise_std
    # itself (run_plnerf.py:569); our raw2outputs takes it pre-scaled
    noise_std = rng.standard_normal((R, S)).astype(np.float32)
    noise = noise_std * 0.7

    # reference path, with torch.randn intercepted to inject our noise
    orig_randn = torch.randn
    torch.randn = lambda *sh, **kw: torch.from_numpy(noise_std)
    try:
        ref_out = ref_plnerf.raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z),
            torch.from_numpy(near), torch.from_numpy(far),
            torch.from_numpy(rays_d), mode=mode, color_mode=color_mode,
            raw_noise_std=0.7, white_bkgd=white_bkgd,
            farcolorfix=farcolorfix,
        )
    finally:
        torch.randn = orig_randn
    ref_rgb, ref_disp, ref_acc, ref_w, ref_depth = [
        t.numpy() for t in ref_out[:5]]

    ours = quadrature.raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(near),
        jnp.asarray(far), jnp.asarray(rays_d), mode, color_mode,
        jnp.asarray(noise), white_bkgd, farcolorfix,
    )
    tag = f"{mode}/{color_mode}/fcf={farcolorfix}/wb={white_bkgd}"
    np.testing.assert_allclose(np.asarray(ours["rgb_map"]), ref_rgb,
                               rtol=1e-4, atol=1e-5, err_msg=tag)
    np.testing.assert_allclose(np.asarray(ours["acc_map"]), ref_acc,
                               rtol=1e-4, atol=1e-5, err_msg=tag)
    np.testing.assert_allclose(np.asarray(ours["weights"]), ref_w,
                               rtol=1e-4, atol=1e-5, err_msg=tag)
    np.testing.assert_allclose(np.asarray(ours["depth_map"]), ref_depth,
                               rtol=1e-4, atol=1e-4, err_msg=tag)


def test_render_rays_lindisp_golden(ref_plnerf, torch_models):
    """lindisp sampling parity through the full render_rays pipeline."""
    mcfg, coarse, fine = torch_models
    R, NS, NI = 32, 16, 8
    rng = np.random.default_rng(9)
    ray_batch = _ray_batch(R, seed=3)
    t_rand = rng.random((R, NS)).astype(np.float32)
    u = rng.random((R, NI)).astype(np.float32)

    import torch

    def query(inputs, viewdirs, network_fn):
        embed_fn, _ = sys.modules["ref_plnerf"].get_embedder(10)
        embeddirs_fn, _ = sys.modules["ref_plnerf"].get_embedder(4)
        return ref_plnerf.run_network(
            inputs, viewdirs, network_fn, embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    draws = [torch.from_numpy(t_rand), torch.from_numpy(u)]
    orig_rand = torch.rand
    torch.rand = lambda *sh, **kw: draws.pop(0)
    try:
        with torch.no_grad():
            ref_out = ref_plnerf.render_rays(
                torch.from_numpy(ray_batch), network_fn=coarse,
                network_query_fn=query, N_samples=NS, mode="constant",
                color_mode="midpoint", retraw=False, lindisp=True,
                perturb=1.0, N_importance=NI, network_fine=fine,
                white_bkgd=False, raw_noise_std=0.0, constant_init=False,
            )
    finally:
        torch.rand = orig_rand

    params_c = jax.tree.map(
        jnp.asarray, convert_torch.state_dict_to_params(coarse.state_dict()))
    params_f = jax.tree.map(
        jnp.asarray, convert_torch.state_dict_to_params(fine.state_dict()))
    rcfg = RenderConfig(
        n_samples=NS, n_importance=NI, mode="constant",
        color_mode="midpoint", white_bkgd=False, perturb=True, lindisp=True,
    )
    ours = render.render_rays(
        params_c, params_f, jnp.asarray(ray_batch), jax.random.key(0),
        mcfg, rcfg,
        overrides={"t_rand": jnp.asarray(t_rand), "u": jnp.asarray(u)},
    )
    np.testing.assert_allclose(
        np.asarray(ours["rgb_map"]), ref_out["rgb_map"].numpy(),
        rtol=2e-3, atol=2e-4)
