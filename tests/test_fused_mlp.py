"""Fused Pallas MLP kernel vs the XLA reference path: forward parity
(both topologies, padded dims, odd N), gradient parity through the custom
VJP, and the render-path integration flag."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plnerf.core import encoding, mlp
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.kernels import fused_mlp


def _inputs(key, n, mcfg):
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (n, 3))
    pe = encoding.embed(pts, mcfg.multires, mcfg.pi_bands)
    ve = None
    if mcfg.use_viewdirs:
        vd = jax.random.normal(k2, (n, 3))
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
        ve = encoding.embed(vd, mcfg.multires_views, mcfg.pi_bands)
    return pe, ve


@pytest.mark.parametrize("mcfg", [
    ModelConfig(),                                        # full 8x256
    ModelConfig(netdepth=2, netwidth=16, multires=4, multires_views=2),
    ModelConfig(use_viewdirs=False, output_ch=4),
    ModelConfig(netdepth=6, netwidth=64, skips=(2, 4), multires=6),
    ModelConfig(density_activation="softplus10", pi_bands=True,
                multires=9, multires_views=0, netwidth=64, netdepth=4),
])
@pytest.mark.parametrize("fold_heads", [False, True])
def test_forward_parity(mcfg, fold_heads):
    params = mlp.init_nerf_params(jax.random.PRNGKey(0), mcfg)
    pe, ve = _inputs(jax.random.PRNGKey(1), 391, mcfg)  # odd N -> padding
    ref = mlp.apply_mlp(params, pe, ve, mcfg)
    got = fused_mlp.apply(params, pe, ve, mcfg, tile=128, interpret=True,
                          fold_heads=fold_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_parity_leading_shape():
    mcfg = ModelConfig(netdepth=2, netwidth=32, multires=4, multires_views=2)
    params = mlp.init_nerf_params(jax.random.PRNGKey(0), mcfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (13, 7, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (13, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    ref = mlp.query_network(params, pts, vd, mcfg)
    got = mlp.query_network(params, pts, vd, mcfg, use_pallas=True)
    assert got.shape == (13, 7, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("fold_heads", [False, True])
def test_gradient_parity(fold_heads):
    mcfg = ModelConfig(netdepth=3, netwidth=32, multires=4, multires_views=2)
    params = mlp.init_nerf_params(jax.random.PRNGKey(0), mcfg)
    pe, ve = _inputs(jax.random.PRNGKey(1), 64, mcfg)

    def loss_ref(p):
        return jnp.sum(mlp.apply_mlp(p, pe, ve, mcfg) ** 2)

    def loss_pallas(p):
        return jnp.sum(
            fused_mlp.apply(p, pe, ve, mcfg, tile=128, interpret=True,
                            fold_heads=fold_heads) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pal = jax.grad(loss_pallas)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_ref, g_pal,
    )


@pytest.mark.parametrize("fold_heads", [False, True])
def test_bf16_forward_and_grad_close_to_xla_bf16(fold_heads):
    """bf16 mode keeps HIDDEN activations bf16 inside the kernel exactly
    like the XLA path (core/mlp._dense out_dtype) — outputs and grads must
    track the XLA bf16 path within bf16 rounding slack.  The folded-head
    schedule computes its weight fold in fp32 before the bf16 cast, so it
    sits within the same slack."""
    mcfg = ModelConfig(netdepth=4, netwidth=64, skips=(2,), multires=4,
                       multires_views=2)
    params = mlp.init_nerf_params(jax.random.PRNGKey(0), mcfg)
    pe, ve = _inputs(jax.random.PRNGKey(1), 96, mcfg)

    ref = mlp.apply_mlp(params, pe, ve, mcfg, jnp.bfloat16)
    got = fused_mlp.apply(params, pe, ve, mcfg, jnp.bfloat16, tile=128,
                          interpret=True, fold_heads=fold_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    def loss_ref(p):
        return jnp.sum(mlp.apply_mlp(p, pe, ve, mcfg, jnp.bfloat16) ** 2)

    def loss_pallas(p):
        return jnp.sum(fused_mlp.apply(p, pe, ve, mcfg, jnp.bfloat16,
                                       tile=128, interpret=True,
                                       fold_heads=fold_heads) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pal = jax.grad(loss_pallas)(params)

    def close(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05, (
            np.abs(a - b).max(), denom)

    jax.tree.map(close, g_ref, g_pal)


def test_render_rays_with_pallas_flag():
    """End-to-end: render_rays with use_pallas_mlp matches the XLA path."""
    import dataclasses

    from plnerf.core import render

    mcfg = ModelConfig(netdepth=2, netwidth=32, multires=4, multires_views=2)
    rcfg = RenderConfig(n_samples=8, n_importance=8, mode="linear",
                        perturb=False)
    kc, kf, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    pc = mlp.init_nerf_params(kc, mcfg)
    pf = mlp.init_nerf_params(kf, mcfg)
    rays_o = jax.random.normal(kr, (32, 3))
    rays_d = jax.random.normal(jax.random.PRNGKey(5), (32, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rb = jnp.concatenate(
        [rays_o, rays_d, jnp.full((32, 1), 2.0), jnp.full((32, 1), 6.0),
         rays_d], -1)
    ref = render.render_rays(pc, pf, rb, jax.random.PRNGKey(9), mcfg, rcfg)
    got = render.render_rays(
        pc, pf, rb, jax.random.PRNGKey(9), mcfg,
        dataclasses.replace(rcfg, use_pallas_mlp=True))
    np.testing.assert_allclose(np.asarray(got["rgb_map"]),
                               np.asarray(ref["rgb_map"]),
                               atol=5e-5, rtol=5e-5)
