"""Training-trajectory parity vs the reference: identical initial weights
(torch -> jax via checkpoint conversion), identical fixed ray batches,
deterministic sampling (perturb off, det u), reference dual-Adam loop
(run_plnerf.py:1282-1315) vs our jitted two-optimizer train step — the
per-step loss curves must track each other closely for both quadrature
modes."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available
from plnerf.checkpoint import convert_torch
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.train.step import TrainSetup, init_state, make_train_step

from test_render_parity import ref_plnerf, _ray_batch  # fixtures/helpers

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

R, NS, NI, STEPS = 64, 8, 8, 20
LR = 5e-3
MCFG = ModelConfig(netdepth=2, netwidth=32, multires=4, multires_views=2)


def _make_batches(n):
    rng = np.random.default_rng(3)
    batches = []
    for i in range(n):
        rays = _ray_batch(R, seed=100 + i)
        target = rng.random((R, 3)).astype(np.float32)
        batches.append((rays, target))
    return batches


def _reference_trajectory(ref, mode, u_seq=None):
    """u_seq: per-step importance-u arrays injected via torch.rand (the
    reference's det/perturb=0 linear sampler is broken upstream: u=1.0
    with cdf[-1] forced to 1.0 overflows tau_diff in
    run_nerf_helpers.py:414, so PL parity must run with stochastic u)."""
    import torch

    torch.manual_seed(0)
    helpers = sys.modules["ref_plnerf"]
    kw = dict(D=MCFG.netdepth, W=MCFG.netwidth, input_ch=MCFG.input_ch,
              input_ch_views=MCFG.input_ch_views, output_ch=5, skips=(1,),
              use_viewdirs=True)
    # NOTE: skips in our tiny config
    kw["skips"] = list(MCFG.skips)
    coarse = helpers.NeRF(**kw)
    fine = helpers.NeRF(**kw)

    embed_fn, _ = helpers.get_embedder(MCFG.multires)
    embeddirs_fn, _ = helpers.get_embedder(MCFG.multires_views)

    def query(inputs, viewdirs, network_fn):
        return ref.run_network(inputs, viewdirs, network_fn,
                               embed_fn=embed_fn,
                               embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    opt_f = torch.optim.Adam(fine.parameters(), lr=LR)
    opt_c = torch.optim.Adam(coarse.parameters(), lr=LR)

    losses = []
    orig_rand = torch.rand
    for i, (rays, target) in enumerate(_make_batches(STEPS)):
        if u_seq is not None:
            t_rand, u = u_seq[i]
            draws = [torch.from_numpy(t_rand), torch.from_numpy(u)]
            torch.rand = lambda *sh, **kw: draws.pop(0)
        try:
            ret = ref.render_rays(
                torch.from_numpy(rays), network_fn=coarse,
                network_query_fn=query, N_samples=NS, mode=mode,
                color_mode="midpoint", retraw=False, lindisp=False,
                perturb=1.0 if u_seq is not None else 0.0,
                N_importance=NI, network_fine=fine,
                white_bkgd=True, raw_noise_std=0.0, constant_init=False,
            )
        finally:
            torch.rand = orig_rand
        t = torch.from_numpy(target)
        loss = torch.mean((ret["rgb_map"] - t) ** 2) + torch.mean(
            (ret["rgb0"] - t) ** 2)
        opt_f.zero_grad()
        opt_c.zero_grad()
        loss.backward()
        opt_f.step()
        opt_c.step()
        losses.append(float(loss))
    return coarse, fine, losses


def _init_params_like_reference():
    import torch

    torch.manual_seed(0)
    helpers = sys.modules["ref_plnerf"]
    kw = dict(D=MCFG.netdepth, W=MCFG.netwidth, input_ch=MCFG.input_ch,
              input_ch_views=MCFG.input_ch_views, output_ch=5,
              skips=list(MCFG.skips), use_viewdirs=True)
    coarse0 = helpers.NeRF(**kw)
    fine0 = helpers.NeRF(**kw)
    params_c = jax.tree.map(
        jnp.asarray, convert_torch.state_dict_to_params(coarse0.state_dict()))
    params_f = jax.tree.map(
        jnp.asarray, convert_torch.state_dict_to_params(fine0.state_dict()))
    return params_c, params_f


@pytest.mark.parametrize("mode", ["constant", "linear"])
def test_training_trajectory_parity(ref_plnerf, mode):
    # linear mode injects identical stochastic draws into both frameworks
    # (the reference's det linear sampler crashes upstream, see
    # _reference_trajectory)
    u_seq = None
    perturb = False
    if mode == "linear":
        rng = np.random.default_rng(11)
        u_seq = [
            (rng.random((R, NS)).astype(np.float32),
             rng.random((R, NI)).astype(np.float32))
            for _ in range(STEPS)
        ]
        perturb = True

    params_c, params_f = _init_params_like_reference()
    _, _, ref_losses = _reference_trajectory(ref_plnerf, mode, u_seq)

    rcfg = RenderConfig(
        n_samples=NS, n_importance=NI, mode=mode, color_mode="midpoint",
        white_bkgd=True, perturb=perturb, raw_noise_std=0.0,
    )
    setup = TrainSetup(mcfg=MCFG, rcfg=rcfg, lrate=LR, coarse_lrate=LR,
                       lrate_decay=250)
    state = init_state(jax.random.PRNGKey(0), setup)
    state = state.replace(params_coarse=params_c, params_fine=params_f)

    if mode == "constant":
        # deterministic: the jitted production train step end to end
        step = make_train_step(setup)
        ours = []
        key = jax.random.PRNGKey(0)  # everything is deterministic
        for rays, target in _make_batches(STEPS):
            state, metrics = step(
                state,
                {"rays": jnp.asarray(rays), "target": jnp.asarray(target)},
                key)
            ours.append(float(metrics["loss"]))
    else:
        # manual optax loop mirroring the step, with injected draws
        import optax

        from plnerf.core import render as rmod
        from plnerf.utils.misc import img2mse

        opt_f_tx, opt_c_tx, _ = setup.make_optimizers()
        opt_f = opt_f_tx.init(params_f)
        opt_c = opt_c_tx.init(params_c)

        def loss_fn(pc, pf, rays, target, t_rand, u):
            ret = rmod.render_rays(
                pc, pf, rays, jax.random.PRNGKey(0), MCFG, rcfg,
                overrides={"t_rand": t_rand, "u": u})
            return (img2mse(ret["rgb_map"], target)
                    + img2mse(ret["rgb0"], target))

        gfn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
        ours = []
        for i, (rays, target) in enumerate(_make_batches(STEPS)):
            t_rand, u = u_seq[i]
            loss, (g_c, g_f) = gfn(
                params_c, params_f, jnp.asarray(rays), jnp.asarray(target),
                jnp.asarray(t_rand), jnp.asarray(u))
            up_f, opt_f = opt_f_tx.update(g_f, opt_f, params_f)
            params_f = optax.apply_updates(params_f, up_f)
            up_c, opt_c = opt_c_tx.update(g_c, opt_c, params_c)
            params_c = optax.apply_updates(params_c, up_c)
            ours.append(float(loss))

    ref_losses = np.asarray(ref_losses)
    ours = np.asarray(ours)
    # step-0 losses are pure forward parity — must agree tightly
    np.testing.assert_allclose(ours[0], ref_losses[0], rtol=1e-4)
    # trajectories track each other (fp noise compounds through Adam);
    # note targets are random noise, so the losses need not decrease —
    # what matters is that both frameworks take the same optimization path
    np.testing.assert_allclose(ours, ref_losses, rtol=0.05, atol=1e-3)
