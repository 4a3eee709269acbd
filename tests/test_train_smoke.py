"""End-to-end training smoke tests on an analytic synthetic scene:
PSNR must rise in a few hundred steps, in both quadrature modes; the
sharded multi-device step must agree with single-device."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.data.synthetic import make_sphere_dataset
from plnerf.train import batching, step as train_step
from plnerf.train.state import TrainState
from plnerf.parallel import mesh as meshmod


SMALL_MODEL = ModelConfig(netdepth=4, netwidth=64, skips=(2,), multires=6,
                          multires_views=2)


def _train(mode: str, n_steps: int = 150, n_rand: int = 512):
    images, poses, hwf, K = make_sphere_dataset(n_views=6, H=40, W=40)
    rcfg = RenderConfig(
        n_samples=32, n_importance=32, mode=mode, white_bkgd=True,
        perturb=True,
    )
    setup = train_step.TrainSetup(mcfg=SMALL_MODEL, rcfg=rcfg, lrate=5e-3)
    state = train_step.init_state(jax.random.key(0), setup)
    stepf = train_step.make_train_step(setup)

    images_j = jnp.asarray(images)
    poses_j = jnp.asarray(poses)
    i_train = jnp.arange(images.shape[0])

    @jax.jit
    def batch_fn(key):
        return batching.sample_one_image_batch(
            images_j, poses_j, K, i_train, key, n_rand, 2.0, 6.0, True
        )

    psnrs = []
    key = jax.random.key(1)
    for i in range(n_steps):
        key, kb, ks = jax.random.split(key, 3)
        rays, target, _ = batch_fn(kb)
        state, metrics = stepf(state, {"rays": rays, "target": target}, ks)
        psnrs.append(float(metrics["psnr"]))
    return psnrs, state, setup


@pytest.mark.parametrize("mode", ["constant", "linear"])
def test_training_psnr_rises(mode):
    psnrs, _, _ = _train(mode)
    start = np.mean(psnrs[:10])
    end = np.mean(psnrs[-10:])
    assert end > start + 3.0, (start, end)
    assert np.all(np.isfinite(psnrs))


def test_sharded_step_matches_single_device():
    """DP over the 8-device CPU mesh: one step with the batch sharded along
    rays must produce (numerically) the same update as unsharded."""
    images, poses, hwf, K = make_sphere_dataset(n_views=4, H=24, W=24)
    rcfg = RenderConfig(n_samples=16, n_importance=16, mode="linear",
                        white_bkgd=True, perturb=False)
    setup = train_step.TrainSetup(mcfg=SMALL_MODEL, rcfg=rcfg)
    state0 = train_step.init_state(jax.random.key(0), setup)
    stepf = train_step.make_train_step(setup)

    key = jax.random.key(2)
    rays, target, _ = batching.sample_one_image_batch(
        jnp.asarray(images), jnp.asarray(poses), K,
        jnp.arange(images.shape[0]), key, 256, 2.0, 6.0, True,
    )
    batch = {"rays": rays, "target": target}
    ks = jax.random.key(3)

    state_a, metrics_a = stepf(state0, batch, ks)

    mesh = meshmod.make_mesh()
    assert mesh.devices.size == 8
    par_step = meshmod.make_parallel_train_step(stepf, mesh)
    state0b = train_step.init_state(jax.random.key(0), setup)
    state_b, metrics_b = par_step(state0b, batch, ks)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-5
    )
    la = jax.tree.leaves(state_a.params_fine)
    lb = jax.tree.leaves(state_b.params_fine)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_depth_train_step_runs_and_flows():
    """Depth-supervised step: space-carving loss computed, scale/shift
    updated before freeze and frozen after."""
    images, poses, hwf, K = make_sphere_dataset(n_views=4, H=24, W=24)
    rcfg = RenderConfig(
        n_samples=16, n_importance=16, mode="linear", white_bkgd=True,
        perturb=True, compute_pred_hyp=True,
    )
    setup = train_step.TrainSetup(
        mcfg=SMALL_MODEL, rcfg=rcfg, joint_optimizer=True,
        grad_clip_value=0.1, space_carving_weight=0.007,
        scaleshift_lr=1e-3, freeze_ss=2,
    )
    state = train_step.init_state(jax.random.key(0), setup, n_images=4)
    stepf = train_step.make_depth_train_step(setup)

    key = jax.random.key(4)
    rays, target, img_i = batching.sample_one_image_batch(
        jnp.asarray(images), jnp.asarray(poses), K,
        jnp.arange(images.shape[0]), key, 128, 2.0, 6.0, True,
    )
    # fake depth hypotheses: one hypothesis at depth 3.5
    target_h = jnp.full((1, 128, 1), 3.5)
    batch = {
        "rays": rays, "target": target, "target_h": target_h,
        "sc_mask": jnp.ones((128,)), "img_idx": img_i,
    }
    s0_scale = np.asarray(state.depth_scales)
    state, metrics = stepf(state, batch, jax.random.key(5))
    assert np.isfinite(float(metrics["space_carving_loss"]))
    assert np.isfinite(float(metrics["loss"]))
    # the selected image's scale/shift moved
    s1_scale = np.asarray(state.depth_scales)
    assert not np.allclose(s0_scale, s1_scale)

    # after freeze_ss steps, scale/shift stop moving
    state = state.replace(step=jnp.asarray(10, jnp.int32))
    s_before = np.asarray(state.depth_scales)
    state, _ = stepf(state, batch, jax.random.key(6))
    np.testing.assert_array_equal(s_before, np.asarray(state.depth_scales))
