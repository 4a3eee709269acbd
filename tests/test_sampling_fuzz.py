"""Adversarial fuzz properties for the inverse-CDF samplers.

The golden tests (test_sampling.py) pin both samplers against the
imported reference on smooth densities; this file stresses the branch
machinery the reference case-splits on (run_nerf_helpers.py:340-533:
``tau_diff`` vs ``zero_threshold``, the epsilon clamps, the NaN rescue,
the forced ``cdf[:,-1]=1.0``) with adversarial density shapes — spikes,
empty rays, per-ray-constant tau, near-zero total mass — and asserts
three implementation-independent properties:

1. round-trip: F(sample(u)) == u against a vectorized float64 trapezoid
   integral of the piecewise-linear tau (independent of both
   implementations), wherever u lies inside the ray's TRUE total mass
   (beyond it the reference semantics deliberately renormalize the last
   interval via the cdf[-1]=1.0 overwrite, so round-trip is undefined);
2. monotonicity: sorted u must map to non-decreasing samples;
3. bounds: every sample stays inside [near, far].
"""
import numpy as np
import jax.numpy as jnp

from plnerf.core import quadrature, sampling

R, S, K = 8, 32, 33
NEAR_V, FAR_V = 2.0, 6.0


def _density_cases(rng):
    """Named adversarial sigma fields [R, S]."""
    smooth = rng.uniform(0.5, 3.0, (R, S))

    spike = np.zeros((R, S))
    spike[np.arange(R), rng.integers(4, S - 4, R)] = 500.0

    sparse = np.where(rng.uniform(size=(R, S)) < 0.1,
                      rng.uniform(5.0, 50.0, (R, S)), 0.0)

    bimodal = np.zeros((R, S))
    for r in range(R):
        i, j = rng.choice(np.arange(2, S - 2), 2, replace=False)
        bimodal[r, i] = bimodal[r, j] = 80.0

    # per-ray constant sigma -> tau_diff == 0 -> the "constant" branch of
    # the case split on every interior interval
    const = np.tile(rng.uniform(0.2, 2.0, (R, 1)), (1, S))

    tiny = rng.uniform(0.0, 5e-3, (R, S))  # near-zero total mass

    huge = rng.uniform(50.0, 500.0, (R, S))  # saturates T almost at near

    return {"smooth": smooth, "spike": spike, "sparse": sparse,
            "bimodal": bimodal, "const": const, "tiny": tiny, "huge": huge}


def _pl_weights(sigma):
    near = np.full((R, 1), NEAR_V, np.float32)
    far = np.full((R, 1), FAR_V, np.float32)
    t = np.linspace(0, 1, S, dtype=np.float32)
    z = near * (1 - t) + far * t
    rays_d = np.tile(np.array([[0, 0, 1.0]], np.float32), (R, 1))
    w, tau, T = quadrature.compute_weights_piecewise_linear(
        jnp.asarray(sigma.astype(np.float32)), jnp.asarray(z),
        jnp.asarray(near), jnp.asarray(far), jnp.asarray(rays_d))
    return z, near, far, map(np.asarray, (w, tau, T))


def _true_cdf(z_aug, tau, s):
    """Vectorized float64 trapezoid CDF of piecewise-linear tau.

    z_aug: [R, S+2] (near + z + far), tau: [R, S+2], s: [R, K].
    Returns F(s) = 1 - exp(-integral_near^s tau dt) as [R, K].
    """
    z64, tau64 = z_aug.astype(np.float64), tau.astype(np.float64)
    dz = np.diff(z64, axis=-1)                          # [R, S+1]
    seg = 0.5 * (tau64[:, :-1] + tau64[:, 1:]) * dz     # [R, S+1]
    cum = np.concatenate([np.zeros_like(seg[:, :1]),
                          np.cumsum(seg, -1)], -1)      # [R, S+2]
    # interval of each sample
    idx = np.stack([np.searchsorted(z64[r], s[r], side="right") - 1
                    for r in range(s.shape[0])])
    idx = np.clip(idx, 0, z64.shape[1] - 2)
    zl = np.take_along_axis(z64, idx, -1)
    zr = np.take_along_axis(z64, idx + 1, -1)
    tl = np.take_along_axis(tau64, idx, -1)
    tr = np.take_along_axis(tau64, idx + 1, -1)
    frac = np.clip((s - zl) / np.maximum(zr - zl, 1e-30), 0.0, 1.0)
    tau_s = tl + frac * (tr - tl)
    partial = 0.5 * (tl + tau_s) * (s - zl)
    acc = np.take_along_axis(cum, idx, -1) + partial
    T = np.exp(-acc)
    # local CDF slope dF/dz = tau(s) * T(s): converts the sampler's
    # z-space epsilon clamps into an F-space error budget
    return 1.0 - T, tau_s * T


def _const_branch_mass(z_aug, tau, s):
    """Mass of the containing interval where the constant-tau branch
    fires (|tau_r - tau_l| < 1e-4), else 0 — the sampler's left-edge
    placement can miss by up to that interval's mass."""
    z64, tau64 = z_aug.astype(np.float64), tau.astype(np.float64)
    dz = np.diff(z64, axis=-1)
    seg = 0.5 * (tau64[:, :-1] + tau64[:, 1:]) * dz
    cum = np.concatenate([np.zeros_like(seg[:, :1]),
                          np.cumsum(seg, -1)], -1)
    idx = np.stack([np.searchsorted(z64[r], s[r], side="right") - 1
                    for r in range(s.shape[0])])
    idx = np.clip(idx, 0, z64.shape[1] - 2)
    tau_diff = np.take_along_axis(tau64[:, 1:] - tau64[:, :-1], idx, -1)
    T_left = np.exp(-np.take_along_axis(cum, idx, -1))
    mass = T_left * (1 - np.exp(-np.take_along_axis(seg, idx, -1)))
    return np.where(np.abs(tau_diff) < 1e-4, mass, 0.0)


def test_pl_sampler_fuzz_properties():
    rng = np.random.default_rng(11)
    for name, sigma in _density_cases(rng).items():
        z, near, far, (w, tau, T) = _pl_weights(sigma)
        u = np.sort(rng.uniform(0.01, 0.99, (R, K)), -1).astype(np.float32)
        samples = np.asarray(sampling.sample_pdf_reformulation(
            jnp.asarray(z), jnp.asarray(w), jnp.asarray(tau),
            jnp.asarray(T), jnp.asarray(near), jnp.asarray(far),
            jnp.asarray(u))[0])

        assert np.isfinite(samples).all(), name
        assert (samples >= NEAR_V - 1e-4).all(), (
            name, samples.min())
        assert (samples <= FAR_V + 1e-4).all(), (
            name, samples.max())
        # sorted u -> non-decreasing samples (small epsilon: the sampler's
        # 1e-3 branch clamps can locally reorder by that much)
        diffs = np.diff(samples, axis=-1)
        assert (diffs > -2e-3).all(), (name, diffs.min())

        z_aug = np.concatenate([near, z, far], -1)
        F, slope = _true_cdf(z_aug, tau, samples.astype(np.float64))
        total, _ = _true_cdf(z_aug, tau, np.full((R, 1), FAR_V - 1e-6))
        # round-trip only where u is comfortably inside the true mass;
        # tolerance = branch slack + the 1e-3 z-space clamps scaled by
        # the local CDF slope (steep-density cases) + the containing
        # interval's whole mass where the sampler's constant-tau branch
        # applies (|tau_diff| < zero_threshold=1e-4 returns the LEFT bin
        # edge, reference run_nerf_helpers.py:395-433 — a deliberate
        # within-bin quantization, so F can be off by up to that bin)
        valid = u < 0.9 * total
        if valid.any():
            allow = 5e-2 + 3e-3 * slope + _const_branch_mass(
                z_aug, tau, samples.astype(np.float64))
            err = np.abs(F - u) - allow
            assert err[valid].max() < 0, (name, err[valid].max())


def test_constant_sampler_fuzz_properties():
    rng = np.random.default_rng(13)
    bins = np.tile(np.linspace(2.1, 5.9, S - 1, dtype=np.float32), (R, 1))
    one_hot = np.zeros((R, S - 2))
    one_hot[:, 3] = 1.0
    cases = {
        "smooth": rng.uniform(0.0, 1.0, (R, S - 2)),
        "zeros": np.zeros((R, S - 2)),
        "one-hot": one_hot,
        "spiky": np.where(rng.uniform(size=(R, S - 2)) < 0.15,
                          rng.uniform(10, 100, (R, S - 2)), 0.0),
    }
    for name, w in cases.items():
        u = np.sort(rng.uniform(0.0, 1.0, (R, K)), -1).astype(np.float32)
        s = np.asarray(sampling.sample_pdf(
            jnp.asarray(bins), jnp.asarray(w.astype(np.float32)),
            jnp.asarray(u)))
        assert np.isfinite(s).all(), name
        assert (s >= bins[:, :1] - 1e-5).all(), name
        assert (s <= bins[:, -1:] + 1e-5).all(), name
        assert (np.diff(s, axis=-1) > -1e-5).all(), name
        if name == "one-hot":
            # all mass in bin 3 -> samples confined to it (+1e-5 pdf floor
            # leaks a sliver of mass elsewhere; quantiles in (0.05, 0.95)
            # of a 500:1 concentration stay inside the hot bin)
            mid = (u > 0.05) & (u < 0.95)
            hot_lo = bins[:, 3:4] - 1e-3
            hot_hi = bins[:, 4:5] + 1e-3
            assert ((s >= hot_lo) | ~mid).all()
            assert ((s <= hot_hi) | ~mid).all()
