"""Dead-coarse detector + advisory + the mode asymmetry it reports.

BASELINE.md "dead-coarse anatomy": at seed 0 every fixture run's coarse
density head dies (all raw sigma < 0 — relu kills every density
gradient).  The modes differ in what survives: linear keeps color
gradients through the forced tau(far)=1e10 boundary interval (a
"billboard" pinned at far, only when perturb gives that interval
positive width) while constant loses every gradient (the paper's
zero-gradient basin).  These tests pin (a) the free ``sigma0_pos_frac``
metric, (b) the CLI advisory's gating/latching/mode text, and (c) the
billboard physics itself at quadrature level.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plnerf.cli.run_plnerf import (DEAD_COARSE_GRACE,
                                   _dead_coarse_advisory)
from plnerf.core import render
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.core.mlp import init_nerf_params
from plnerf.train.step import TrainSetup, init_state, make_train_step

MCFG = ModelConfig(netdepth=2, netwidth=16, multires=4, multires_views=2)
R, NS, NI = 16, 12, 8


def _kill_density(params):
    """Push the alpha head's bias far negative: raw sigma < 0 everywhere
    (the dead-relu state the seed-0 runs land in)."""
    p = jax.tree.map(lambda x: x, params)  # shallow copy
    p["alpha_linear"] = dict(p["alpha_linear"],
                             b=p["alpha_linear"]["b"] - 100.0)
    return p


def _rays(near=2.0, far=6.0):
    o = np.tile(np.array([[0, 0, 4.0]], np.float32), (R, 1))
    th = np.linspace(-0.3, 0.3, R)
    d = np.stack([np.sin(th), 0 * th, -np.cos(th)], -1).astype(np.float32)
    return jnp.asarray(np.concatenate(
        [o, d, np.full((R, 1), near, np.float32),
         np.full((R, 1), far, np.float32), d], -1))


@pytest.mark.parametrize("mode", ["linear", "constant"])
def test_step_metric_reads_dead_and_healthy(mode):
    rcfg = RenderConfig(n_samples=NS, n_importance=NI, mode=mode)
    setup = TrainSetup(mcfg=MCFG, rcfg=rcfg, lrate=5e-4)
    state = init_state(jax.random.PRNGKey(0), setup)
    step = make_train_step(setup)
    batch = {"rays": _rays(),
             "target": jnp.zeros((R, 3), jnp.float32)}

    _, m = step(state, batch, jax.random.PRNGKey(1))
    healthy = float(m["sigma0_pos_frac"])
    assert 0.05 < healthy < 0.95, healthy  # fresh init: sign ~ split

    state = init_state(jax.random.PRNGKey(0), setup)
    state = state.replace(params_coarse=_kill_density(state.params_coarse))
    _, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["sigma0_pos_frac"]) == 0.0


def test_advisory_gating_latch_and_mode_text(capsys):
    dead = {"sigma0_pos_frac": 0.0}
    # below grace: silent
    assert not _dead_coarse_advisory(dead, DEAD_COARSE_GRACE, False,
                                     "constant")
    assert capsys.readouterr().out == ""
    # healthy past grace: silent
    assert not _dead_coarse_advisory({"sigma0_pos_frac": 0.15},
                                     DEAD_COARSE_GRACE + 1, False,
                                     "constant")
    # metric absent (e.g. depth script): silent
    assert not _dead_coarse_advisory({}, DEAD_COARSE_GRACE + 1, False,
                                     "constant")
    assert capsys.readouterr().out == ""
    # dead past grace: fires with mode-specific text
    assert _dead_coarse_advisory(dead, DEAD_COARSE_GRACE + 1, False,
                                 "constant")
    out = capsys.readouterr().out
    assert "zero-gradient trap" in out and "quasi-uniform" in out
    # mitigations are restart-only (BASELINE.md late-rescue study)
    assert "RESTART" in out and "does NOT save it" in out
    assert _dead_coarse_advisory(dead, DEAD_COARSE_GRACE + 1, False,
                                 "linear")
    out = capsys.readouterr().out
    assert "billboard" in out and "stratified" in out
    # latched: never fires twice
    assert _dead_coarse_advisory(dead, DEAD_COARSE_GRACE + 2, True,
                                 "linear")
    assert capsys.readouterr().out == ""


def test_depth_pipeline_structurally_immune():
    """The depth script's softplus(beta=10) density head (mlp.py
    density_activation="softplus10", reference depth_supervised_exps/
    model/run_nerf_helpers.py:200,203) is strictly positive, so the
    dead-relu trap cannot occur there: with the bias pushed to a level
    that makes every raw pre-activation negative (all-dead for a relu
    head), sigma0_pos_frac still reads 1.0 and density gradients
    survive (softplus's gradient sigmoid(10x) is positive everywhere —
    though it does saturate numerically ~x<-9, far below observed dead
    levels).  This is why run_depth wires no dead-coarse advisory."""
    import dataclasses

    mcfg = dataclasses.replace(MCFG, density_activation="softplus10",
                               init="xavier")
    params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
    params["alpha_linear"] = dict(
        params["alpha_linear"], b=params["alpha_linear"]["b"] - 2.0)
    # constant mode: the trap's worst case (zero-gradient basin under a
    # relu head), and acc0 genuinely depends on density (in linear mode
    # the forced far boundary pins acc0=1 regardless)
    rcfg = RenderConfig(n_samples=NS, n_importance=NI, mode="constant")
    ret = render.render_rays(params, params, _rays(),
                             jax.random.PRNGKey(1), mcfg, rcfg)
    assert float(ret["sigma0_pos_frac"]) == 1.0

    def coarse_sigma_sum(p):
        out = render.render_rays(p, params, _rays(),
                                 jax.random.PRNGKey(1), mcfg, rcfg)
        return jnp.sum(out["acc0"])

    g = jax.grad(coarse_sigma_sum)(params)
    # live gradient into the density head despite the -100 bias
    assert float(jnp.max(jnp.abs(g["alpha_linear"]["b"]))) > 0.0


def test_billboard_physics_of_dead_coarse():
    """Dead density, linear mode + perturb: the forced far boundary
    carries all the weight (acc=1, depth=far, importance samples
    collapse); perturb=0 zeroes the interval width (blank render);
    constant mode is blank regardless (the true zero-gradient basin)."""
    key = jax.random.PRNGKey(2)
    params = _kill_density(init_nerf_params(key, MCFG))
    rays = _rays()

    def run(mode, perturb):
        rcfg = RenderConfig(n_samples=NS, n_importance=NI, mode=mode,
                            perturb=perturb, white_bkgd=True)
        return render.render_rays(params, params, rays,
                                  jax.random.PRNGKey(3), MCFG, rcfg)

    ret = run("linear", True)
    assert float(jnp.mean(ret["acc0"])) == pytest.approx(1.0, abs=1e-4)
    assert float(jnp.mean(ret["depth0"])) == pytest.approx(6.0, abs=0.2)
    # every importance sample lands in the same final sliver
    assert float(jnp.mean(ret["z_std"])) < 0.05
    # the billboard is per-ray paintable: rgb varies across rays
    assert float(jnp.std(ret["rgb0"])) > 1e-3

    ret = run("linear", False)  # last stratified sample sits AT far
    assert float(jnp.mean(ret["acc0"])) == pytest.approx(0.0, abs=1e-5)

    ret = run("constant", True)
    assert float(jnp.mean(ret["acc0"])) == pytest.approx(0.0, abs=1e-5)
    # blank white render, zero variance -> nothing for any gradient
    assert float(jnp.std(ret["rgb0"])) == pytest.approx(0.0, abs=1e-6)
    # quasi-uniform importance samples (1e-5 pdf floor), NOT collapsed
    assert float(jnp.mean(ret["z_std"])) > 0.5
