"""Quadrature unit tests: closed-form analytic cases plus cross-mode
agreement (SURVEY.md section 4 test plan)."""
import numpy as np
import jax
import jax.numpy as jnp

from plnerf.core import quadrature


def _rand_rays(R=8, S=32, seed=0):
    rng = np.random.default_rng(seed)
    near = np.full((R, 1), 2.0, np.float32)
    far = np.full((R, 1), 6.0, np.float32)
    z = np.sort(rng.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    sigma = rng.uniform(0.0, 3.0, (R, S)).astype(np.float32)
    return near, far, z, rays_d, sigma


def test_linear_transmittance_closed_form():
    """Single-ray uniform tau: T at each boundary must equal
    exp(-integral of the piecewise-linear tau), computed independently
    with trapezoid integration in float64."""
    near, far, z, rays_d, sigma = _rand_rays(R=4, S=16, seed=1)
    w, tau, T = quadrature.compute_weights_piecewise_linear(
        jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(near),
        jnp.asarray(far), jnp.asarray(rays_d),
    )
    w, tau, T = map(np.asarray, (w, tau, T))

    dnorm = np.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_aug = np.concatenate([near, z, far], -1).astype(np.float64) * dnorm
    tau64 = np.asarray(tau, np.float64)
    # independent trapezoid integral of tau over [s0, s_k]
    seg = 0.5 * (tau64[:, 1:] + tau64[:, :-1]) * np.diff(z_aug, axis=-1)
    integral = np.concatenate(
        [np.zeros((z.shape[0], 1)), np.cumsum(seg, -1)], -1
    )
    T_expected = np.exp(-integral)
    np.testing.assert_allclose(T, T_expected, rtol=2e-5, atol=1e-6)
    # weights are the per-interval absorbed fractions: T_k - T_{k+1}
    np.testing.assert_allclose(
        w, T_expected[:, :-1] - T_expected[:, 1:], rtol=2e-4, atol=1e-6
    )


def test_constant_weights_closed_form():
    """Constant-mode weights equal alpha_i * prod_{j<i}(1-alpha_j) with the
    1e10 final interval, computed independently in float64."""
    near, far, z, rays_d, sigma = _rand_rays(R=4, S=16, seed=2)
    w = np.asarray(
        quadrature.compute_weights_constant(
            jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rays_d)
        )
    )
    dnorm = np.linalg.norm(rays_d, axis=-1, keepdims=True).astype(np.float64)
    dists = np.concatenate(
        [np.diff(z.astype(np.float64), axis=-1), np.full((4, 1), 1e10)], -1
    ) * dnorm
    alpha = 1.0 - np.exp(-np.maximum(sigma, 0).astype(np.float64) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones((4, 1)), 1 - alpha + 1e-10], -1), -1
    )[:, :-1]
    np.testing.assert_allclose(w, alpha * trans, rtol=1e-4, atol=1e-7)


def test_modes_agree_in_homogeneous_medium():
    """With constant sigma and dense sampling, both quadratures must
    converge to the same analytic absorption."""
    R, S = 2, 512
    sigma_val = 0.7
    near = np.full((R, 1), 2.0, np.float32)
    far = np.full((R, 1), 6.0, np.float32)
    t = np.linspace(0, 1, S, dtype=np.float32)
    z = near * (1 - t) + far * t
    rays_d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    sigma = np.full((R, S), sigma_val, np.float32)

    wc = np.asarray(quadrature.compute_weights_constant(
        jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rays_d)))
    wl, tau, T = quadrature.compute_weights_piecewise_linear(
        jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(near),
        jnp.asarray(far), jnp.asarray(rays_d))
    wl = np.asarray(wl)

    # Constant mode: the 1e10 tail interval makes mass sum to 1 exactly.
    np.testing.assert_allclose(wc.sum(-1), 1.0, atol=1e-5)
    # Linear mode: z spans [near, far] so the augmented far interval has
    # zero width and total mass is 1 - exp(-sigma*(far-near)).  (This is
    # exactly why the reference sampler forces cdf[-1]=1.0,
    # run_nerf_helpers.py:374.)
    np.testing.assert_allclose(
        wl.sum(-1), 1.0 - np.exp(-sigma_val * 4.0), atol=1e-4
    )
    # Mass absorbed before the midpoint ~ 1 - exp(-sigma * 2)
    mid = S // 2
    expected = 1 - np.exp(-sigma_val * 2.0)
    np.testing.assert_allclose(wc[:, :mid].sum(-1), expected, atol=2e-2)
    np.testing.assert_allclose(wl[:, :mid + 1].sum(-1), expected, atol=2e-2)


def test_raw2outputs_linear_midpoint_shapes_and_white_bkgd():
    rng = np.random.default_rng(3)
    R, S = 6, 24
    near = np.full((R, 1), 2.0, np.float32)
    far = np.full((R, 1), 6.0, np.float32)
    z = np.sort(rng.uniform(2, 6, (R, S)).astype(np.float32), -1)
    rays_d = rng.standard_normal((R, 3)).astype(np.float32)
    raw = rng.standard_normal((R, S, 4)).astype(np.float32)

    for mode, color_mode in [("linear", "midpoint"), ("linear", "left"),
                             ("constant", "midpoint")]:
        out = quadrature.raw2outputs(
            jnp.asarray(raw), jnp.asarray(z), jnp.asarray(near),
            jnp.asarray(far), jnp.asarray(rays_d), mode, color_mode,
            white_bkgd=True,
        )
        assert out["rgb_map"].shape == (R, 3)
        assert out["depth_map"].shape == (R,)
        w = np.asarray(out["weights"])
        assert w.shape[-1] == (S + 1 if mode == "linear" else S)
        # white background: rgb = rgb_raw + (1-acc)
        acc = np.asarray(out["acc_map"])
        assert np.all(np.isfinite(np.asarray(out["rgb_map"])))
        assert np.all(acc <= 1.0 + 1e-4)


def test_farcolorfix_zeroes_far_color():
    rng = np.random.default_rng(4)
    R, S = 3, 8
    near = np.full((R, 1), 2.0, np.float32)
    far = np.full((R, 1), 6.0, np.float32)
    z = np.sort(rng.uniform(2, 6, (R, S)).astype(np.float32), -1)
    rays_d = np.tile(np.array([[0, 0, 1.0]], np.float32), (R, 1))
    raw = np.zeros((R, S, 4), np.float32)
    raw[..., :3] = 10.0   # sigmoid -> ~1 everywhere
    raw[..., 3] = 0.0     # transparent -> all mass in the far interval

    out_fix = quadrature.raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(near), jnp.asarray(far),
        jnp.asarray(rays_d), "linear", "midpoint", farcolorfix=True)
    out_nofix = quadrature.raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(near), jnp.asarray(far),
        jnp.asarray(rays_d), "linear", "midpoint", farcolorfix=False)
    # with the fix the far interval contributes half the color (midpoint of
    # [c, 0]); without it contributes full color
    assert np.all(np.asarray(out_fix["rgb_map"]) < np.asarray(out_nofix["rgb_map"]))
