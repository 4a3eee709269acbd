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
