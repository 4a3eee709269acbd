"""Parity tests: positional encoding and MLP forward vs the reference
PyTorch implementation (imported from /root/reference, never copied)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import reference_available, load_reference_module
from plnerf.core import encoding, mlp
from plnerf.core.config import ModelConfig
from plnerf.checkpoint import convert_torch

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref_helpers():
    return load_reference_module("ref_helpers", "run_nerf_helpers.py")


@pytest.fixture(scope="module")
def ref_depth_helpers():
    return load_reference_module(
        "ref_depth_helpers", "depth_supervised_exps/model/run_nerf_helpers.py"
    )


def test_embedding_matches_reference(ref_helpers):
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 3)).astype(np.float32)
    for multires in (4, 10):
        embed_fn, out_dim = ref_helpers.get_embedder(multires)
        ref = embed_fn(torch.from_numpy(x)).numpy()
        ours = np.asarray(encoding.embed(jnp.asarray(x), multires))
        assert ours.shape[-1] == out_dim == encoding.embed_dim(3, multires)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_embedding_pi_variant_matches_depth_reference(ref_depth_helpers):
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((50, 3)).astype(np.float32)
    embed_fn, out_dim = ref_depth_helpers.get_embedder(9)
    ref = embed_fn(torch.from_numpy(x)).numpy()
    ours = np.asarray(encoding.embed(jnp.asarray(x), 9, pi_bands=True))
    assert ours.shape[-1] == out_dim
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def _forward_pair(torch_model, mcfg, n=200):
    import torch

    rng = np.random.default_rng(2)
    pts_embed = rng.standard_normal((n, mcfg.input_ch)).astype(np.float32)
    views_embed = rng.standard_normal(
        (n, mcfg.input_ch_views + mcfg.input_ch_cam)
    ).astype(np.float32)
    x = np.concatenate([pts_embed, views_embed], axis=-1)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    params = convert_torch.state_dict_to_params(torch_model.state_dict())
    ours = np.asarray(
        mlp.apply_mlp(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(pts_embed),
            jnp.asarray(views_embed),
            mcfg,
        )
    )
    return ours, ref


def test_mlp_forward_matches_reference(ref_helpers):
    mcfg = ModelConfig()
    torch_model = ref_helpers.NeRF(
        D=8, W=256, input_ch=mcfg.input_ch, input_ch_views=mcfg.input_ch_views,
        output_ch=5, skips=[4], use_viewdirs=True,
    )
    ours, ref = _forward_pair(torch_model, mcfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mlp_no_viewdirs_matches_reference(ref_helpers):
    mcfg = ModelConfig(use_viewdirs=False, output_ch=4)
    torch_model = ref_helpers.NeRF(
        D=8, W=256, input_ch=mcfg.input_ch, input_ch_views=0,
        output_ch=4, skips=[4], use_viewdirs=False,
    )
    import torch

    rng = np.random.default_rng(3)
    pts_embed = rng.standard_normal((64, mcfg.input_ch)).astype(np.float32)
    x = np.concatenate(
        [pts_embed, np.zeros((64, 0), np.float32)], axis=-1
    )
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    params = convert_torch.state_dict_to_params(torch_model.state_dict())
    ours = np.asarray(
        mlp.apply_mlp(jax.tree.map(jnp.asarray, params),
                      jnp.asarray(pts_embed), None, mcfg)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mlp_softplus_density_matches_depth_reference(ref_depth_helpers):
    mcfg = ModelConfig(
        multires=9, multires_views=3, density_activation="softplus10",
        input_ch_cam=4, init="xavier",
    )
    torch_model = ref_depth_helpers.NeRF(
        D=8, W=256, input_ch=mcfg.input_ch, input_ch_views=mcfg.input_ch_views,
        input_ch_cam=4, output_ch=4, skips=[4], use_viewdirs=True,
    )
    ours, ref = _forward_pair(torch_model, mcfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_params_roundtrip(ref_helpers):
    mcfg = ModelConfig()
    params = mlp.init_nerf_params(jax.random.key(0), mcfg)
    sd = convert_torch.params_to_state_dict(params)
    params2 = convert_torch.state_dict_to_params(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigma_bias_init_offsets_only_the_density_bias():
    """--sigma_bias_init (TPU-native extra): default 0.0 is bit-identical
    to the reference init; a nonzero value shifts ONLY the density head's
    bias by exactly that constant (both topologies), so every raw density
    at init moves up by the offset while rgb is untouched."""
    import dataclasses

    for base in (ModelConfig(), ModelConfig(use_viewdirs=False, output_ch=4)):
        lifted = dataclasses.replace(base, sigma_bias_init=0.1)
        p0 = mlp.init_nerf_params(jax.random.key(0), base)
        p1 = mlp.init_nerf_params(jax.random.key(0), lifted)

        flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
        flat1 = jax.tree.leaves(p1)
        for (path, a), b in zip(flat0, flat1):
            name = jax.tree_util.keystr(path)
            a, b = np.asarray(a), np.asarray(b)
            if "alpha_linear" in name and name.endswith("'b']"):
                np.testing.assert_allclose(b - a, 0.1, rtol=1e-6)
            elif "output_linear" in name and name.endswith("'b']"):
                np.testing.assert_allclose(b - a, [0, 0, 0, 0.1], atol=1e-7)
            else:
                np.testing.assert_array_equal(a, b)

        # the raw density channel moves up by exactly the offset
        pe = jax.random.normal(jax.random.key(1), (17, base.input_ch))
        ve = None
        if base.use_viewdirs:
            ve = jax.random.normal(jax.random.key(2),
                                   (17, base.input_ch_views))
        r0 = np.asarray(mlp.apply_mlp(p0, pe, ve, base))
        r1 = np.asarray(mlp.apply_mlp(p1, pe, ve, lifted))
        np.testing.assert_allclose(r1[:, 3] - r0[:, 3], 0.1, atol=1e-5)
        np.testing.assert_allclose(r1[:, :3], r0[:, :3], atol=1e-6)
