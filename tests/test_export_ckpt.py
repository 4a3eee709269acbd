"""Export-direction checkpoint interop: plnerf ``.ckpt`` -> reference
``.tar`` -> the reference's own torch load path.

Verifies ``checkpoint/convert_torch.save_reference_checkpoint`` and
``tools/export_reference_ckpt.py``: the written ``.tar`` loads through the
exact calls the reference resume path makes (run_plnerf.py:453-471 —
``model.load_state_dict(ckpt['network_fn_state_dict'])``,
``optimizer.load_state_dict(ckpt['optimizer_state_dict'])``), the restored
reference model's forward matches the plnerf forward, the exported Adam
moments land on the right torch parameters, and the loaded optimizer can
step.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import load_reference_module, reference_available
from plnerf.checkpoint import io as ckio
from plnerf.core import mlp
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.train import step as train_step

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

MCFG = ModelConfig(netwidth=64, multires=4, multires_views=2)


def _trained_state(joint=False):
    """An init_state with one real optimizer update so the Adam moments are
    nonzero (what the exporter must carry across)."""
    rcfg = RenderConfig(n_samples=8, n_importance=4)
    setup = train_step.TrainSetup(mcfg=MCFG, rcfg=rcfg, joint_optimizer=joint)
    state = train_step.init_state(jax.random.key(0), setup)
    opt_fine, _, _ = setup.make_optimizers()
    if joint:
        tree = (state.params_coarse, state.params_fine)
    else:
        tree = state.params_fine
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), tree)
    _, new_opt = opt_fine.update(grads, state.opt_fine, tree)
    return state.replace(opt_fine=new_opt, step=jnp.asarray(17, jnp.int32))


def _export(tmp_path, state, fresh=False):
    import export_reference_ckpt

    ckpt_path = ckio.save_checkpoint(str(tmp_path), int(state.step), state)
    out = str(tmp_path / "exported.tar")
    argv = ["--ckpt", ckpt_path, "--out", out]
    if fresh:
        argv.append("--fresh_opt")
    export_reference_ckpt.main(argv)
    return out


def _ref_model(ref_helpers):
    return ref_helpers.NeRF(
        D=MCFG.netdepth, W=MCFG.netwidth, input_ch=MCFG.input_ch,
        input_ch_views=MCFG.input_ch_views, output_ch=5, skips=[4],
        use_viewdirs=True,
    )


@pytest.fixture(scope="module")
def ref_helpers():
    return load_reference_module("ref_helpers", "run_nerf_helpers.py")


def test_exported_tar_loads_through_reference_path(tmp_path, ref_helpers):
    import torch

    state = _trained_state()
    out = _export(tmp_path, state)
    ckpt = torch.load(out, map_location="cpu", weights_only=False)

    assert ckpt["global_step"] == 17
    model = _ref_model(ref_helpers)
    model_fine = _ref_model(ref_helpers)
    # strict load (the reference's exact calls): key/shape parity or raise
    model.load_state_dict(ckpt["network_fn_state_dict"])
    model_fine.load_state_dict(ckpt["network_fine_state_dict"])

    # forward parity: reference model running the exported weights vs the
    # plnerf forward on the same params
    rng = np.random.default_rng(4)
    pts = rng.standard_normal((37, MCFG.input_ch)).astype(np.float32)
    views = rng.standard_normal((37, MCFG.input_ch_views)).astype(np.float32)
    with torch.no_grad():
        ref = model_fine(
            torch.from_numpy(np.concatenate([pts, views], -1))).numpy()
    ours = np.asarray(mlp.apply_mlp(
        state.params_fine, jnp.asarray(pts), jnp.asarray(views), MCFG))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # optimizer: loads over the fine params (reference scope) and steps
    opt = torch.optim.Adam(model_fine.parameters(), lr=5e-4,
                           betas=(0.9, 0.999))
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    n_params = len(list(model_fine.parameters()))
    assert len(opt.state_dict()["state"]) == n_params

    # the moments landed on the right torch parameters: param 0 is
    # pts_linears.0.weight ([out, in]) -> exp_avg must equal our mu^T
    adam = state.opt_fine[0][0]  # chain(adam) -> (scale_by_adam, schedule)
    mu0 = np.asarray(adam.mu["pts_linears"][0]["w"]).T
    got = opt.state_dict()["state"][0]["exp_avg"].numpy()
    np.testing.assert_allclose(got, mu0, rtol=1e-6, atol=1e-6)
    assert float(opt.state_dict()["state"][0]["step"]) == 1.0

    loss = model_fine(torch.randn(5, MCFG.input_ch + MCFG.input_ch_views)).sum()
    loss.backward()
    opt.step()  # must not raise


def test_exported_fresh_opt_and_joint_scope(tmp_path, ref_helpers):
    import torch

    # fresh state: loads and steps with empty per-param state
    out = _export(tmp_path, _trained_state(), fresh=True)
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    model_fine = _ref_model(ref_helpers)
    opt = torch.optim.Adam(model_fine.parameters(), lr=5e-4)
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    assert len(opt.state_dict()["state"]) == 0

    # joint checkpoint (vanilla/depth layout): optimizer covers
    # coarse-then-fine, matching run_nerf_vanilla's grad_vars order
    # (reference run_nerf_vanilla.py:365-380)
    state = _trained_state(joint=True)
    ckpt_path = ckio.save_checkpoint(str(tmp_path), int(state.step), state)
    import export_reference_ckpt

    out = str(tmp_path / "joint.tar")
    export_reference_ckpt.main(["--ckpt", ckpt_path, "--out", out])
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    model = _ref_model(ref_helpers)
    model_fine = _ref_model(ref_helpers)
    grad_vars = list(model.parameters()) + list(model_fine.parameters())
    opt = torch.optim.Adam(grad_vars, lr=5e-4, betas=(0.9, 0.999))
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    assert len(opt.state_dict()["state"]) == len(grad_vars)
