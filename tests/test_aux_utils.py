"""Aux subsystem tests: depth fault injection, random subsets, and the
test-time camera-embedding optimization."""
import numpy as np

import jax

from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.data.fault_injection import (
    add_missing_depth, add_quadratic_depth_noise, create_random_subsets,
)
from plnerf.train.camera_opt import optimize_camera_embedding
from plnerf.train.step import TrainSetup, init_state


def test_add_missing_depth():
    depth = np.full((32, 32), 3.0, np.float32)
    valid = np.ones((32, 32), bool)
    d2, v2 = add_missing_depth(depth, valid, p=0.3, seed=1)
    frac_invalid = 1.0 - v2.mean()
    assert 0.2 < frac_invalid < 0.4
    assert np.all(d2[~v2] == 0.0)
    assert np.all(d2[v2] == 3.0)
    # already above target: no-op
    d3, v3 = add_missing_depth(d2, v2, p=0.1)
    np.testing.assert_array_equal(v2, v3)


def test_add_quadratic_depth_noise():
    depth = np.full((64, 64), 4.0, np.float32)
    valid = np.ones((64, 64), bool)
    noisy = add_quadratic_depth_noise(depth, valid, seed=2)
    assert noisy.min() >= 0.0
    expected_std = 1.68e-3 * 16 + 6.58e-3 * 4 + 4.78e-2
    assert abs(noisy.std() - expected_std) < 0.02
    assert abs(noisy.mean() - 4.0) < 0.02


def test_create_random_subsets():
    subs = create_random_subsets(range(103), 10, seed=0)
    sizes = [len(s) for s in subs]
    assert sum(sizes) == 103
    assert all(s >= 10 for s in sizes)
    all_idx = np.concatenate(subs)
    assert sorted(all_idx.tolist()) == list(range(103))


def test_camera_embedding_optimization_improves_psnr():
    """With input_ch_cam channels, optimizing the embedding on a target
    image must not regress PSNR vs the zero embedding (and the jitted
    epoch runs end to end)."""
    mcfg = ModelConfig(netdepth=2, netwidth=16, multires=4,
                       multires_views=2, input_ch_cam=4)
    rcfg = RenderConfig(n_samples=4, n_importance=0, perturb=False)
    st = init_state(jax.random.PRNGKey(0),
                    TrainSetup(mcfg=mcfg, rcfg=rcfg))
    H = W = 8
    image = np.full((H, W, 3), 0.4, np.float32)
    pose = np.eye(4, dtype=np.float32)
    intrinsic = np.array([8.0, 8.0, W / 2, H / 2], np.float32)
    emb = optimize_camera_embedding(
        st.params_coarse, None, image, pose, intrinsic, mcfg, rcfg,
        near=0.5, far=4.0, n_rand=16, epochs=8, seed=0,
    )
    assert emb.shape == (4,)
    assert np.isfinite(np.asarray(emb)).all()
    assert float(np.abs(np.asarray(emb)).sum()) > 0  # actually moved


def test_bench_round_stall_guard():
    """bench._bench_rounds must never record a relay-stalled round as the
    headline while a clean round exists (observed once: an 8.2 s/step
    stalled round 0 ate the flagship budget and reported 996 rays/s, a
    57x artifact), must discard sub-FLOP-floor rounds (premature relay
    acks), and must fall back to the best stalled round — flagged — only
    when EVERY round stalled."""
    import bench

    floor = bench._min_step_s(321)
    n_steps = bench.STEPS_PER_ROUND * bench.INNER

    def run(times):
        bench.RESULTS.clear()
        it = iter(times)
        return bench._bench_rounds(
            lambda r: next(it) * n_steps, 321, "t", len(times), "flagship",
            budget_s=1e9)

    # stalled round 0 (100x floor), then clean rounds ~10x floor
    rps = run([100 * floor, 10 * floor, 9.8 * floor])
    assert abs(rps - bench.N_RAND / (9.8 * floor)) < 1e-6
    assert not bench.RESULTS.get("flagship_stalled")

    # premature-ack round (below floor) discarded, clean round wins
    rps = run([0.5 * floor, 11 * floor])
    assert abs(rps - bench.N_RAND / (11 * floor)) < 1e-6

    # every round stalled -> conservative fallback, loudly flagged
    rps = run([120 * floor, 90 * floor])
    assert abs(rps - bench.N_RAND / (90 * floor)) < 1e-6
    assert bench.RESULTS.get("flagship_stalled") is True
    bench.RESULTS.clear()
