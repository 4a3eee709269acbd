"""Pin the paper's core math claim as a test: piecewise-linear
transmittance quadrature (core/quadrature.compute_weights_piecewise_linear,
reference run_plnerf.py:516-550) converges at its theoretical O(h^2) rate
against a dense float64 reference integral on a smooth field, while the
classic constant left-endpoint rule is O(h).

Harness: tools/quadrature_error_study.py (full sweep + the hard binary
field and stratified-placement results live in BASELINE.md).  The test
uses the deterministic linspace placement (the samplers' perturb=0
convention) so rates are exact, a small ray grid for speed, and float64
so truncation error is the only error."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup():
    import quadrature_error_study as Q

    rays_o, rays_d = Q.make_rays(n_side=12)
    rgb_ref, depth_ref, T_far = Q.reference_render(
        Q.smooth_sigma_rgb, rays_o, rays_d, n_dense=16384)
    keep = T_far < 1e-4
    assert keep.sum() > 100
    return Q, rays_o, rays_d, rgb_ref, depth_ref, keep


def _mse(Q, rays_o, rays_d, rgb_ref, keep, n, mode):
    z = Q._z_for(n, len(rays_o), "linspace")
    rgb_e, _ = Q.estimate(Q.smooth_sigma_rgb, rays_o, rays_d, z, mode)
    return ((rgb_e - rgb_ref)[keep] ** 2).mean()


def test_linear_beats_constant_on_smooth_field(setup):
    Q, rays_o, rays_d, rgb_ref, depth_ref, keep = setup
    for n in (16, 32, 64):
        ml = _mse(Q, rays_o, rays_d, rgb_ref, keep, n, "linear")
        mc = _mse(Q, rays_o, rays_d, rgb_ref, keep, n, "constant")
        assert ml < mc, (n, ml, mc)


def test_tau_weighted_color_mode(setup):
    """The TPU-native tau_weighted color convention (opt-in,
    core/quadrature.raw2outputs): fixes linear's rgb smear on the binary
    field (>=2x better than midpoint) while midpoint stays the best
    linear convention on the smooth field (tau_weighted pays a constant
    factor but must still beat the constant MODE there)."""
    import quadrature_error_study as Q

    rays_o, rays_d = Q.make_rays(n_side=12)

    # hard binary field: tau_weighted must cut midpoint's error >= 2x
    rgb_ref, _, T_far = Q.reference_render(
        Q.hard_sigma_rgb, rays_o, rays_d, n_dense=16384)
    keep = T_far < 1e-4
    assert keep.sum() > 80
    z = Q._z_for(64, len(rays_o), "linspace")
    mid, _ = Q.estimate(Q.hard_sigma_rgb, rays_o, rays_d, z, "linear",
                        "midpoint")
    tw, _ = Q.estimate(Q.hard_sigma_rgb, rays_o, rays_d, z, "linear",
                       "tau_weighted")
    m_mid = ((mid - rgb_ref)[keep] ** 2).mean()
    m_tw = ((tw - rgb_ref)[keep] ** 2).mean()
    assert m_tw < 0.5 * m_mid, (m_tw, m_mid)

    # smooth field: midpoint < tau_weighted < constant-mode error
    Qs, rays_o2, rays_d2, rgb_ref2, _, keep2 = setup
    z2 = Q._z_for(32, len(rays_o2), "linspace")
    tw2, _ = Q.estimate(Q.smooth_sigma_rgb, rays_o2, rays_d2, z2,
                        "linear", "tau_weighted")
    m_tw2 = ((tw2 - rgb_ref2)[keep2] ** 2).mean()
    m_mid2 = _mse(Q, rays_o2, rays_d2, rgb_ref2, keep2, 32, "linear")
    m_c2 = _mse(Q, rays_o2, rays_d2, rgb_ref2, keep2, 32, "constant")
    assert m_mid2 < m_tw2 < m_c2, (m_mid2, m_tw2, m_c2)


def test_convergence_rates(setup):
    """Doubling N must cut linear's MSE ~16x (O(h^2) RMS) and constant's
    ~4x (O(h) RMS).  Generous brackets: >=8x vs <=8x."""
    Q, rays_o, rays_d, rgb_ref, depth_ref, keep = setup
    ml32 = _mse(Q, rays_o, rays_d, rgb_ref, keep, 32, "linear")
    ml64 = _mse(Q, rays_o, rays_d, rgb_ref, keep, 64, "linear")
    mc32 = _mse(Q, rays_o, rays_d, rgb_ref, keep, 32, "constant")
    mc64 = _mse(Q, rays_o, rays_d, rgb_ref, keep, 64, "constant")
    assert ml32 / ml64 > 8.0, (ml32, ml64)
    assert mc32 / mc64 < 8.0, (mc32, mc64)
