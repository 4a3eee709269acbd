"""Does the revived --opt_ch_cam path do what the reference intended?

The reference declares trainable per-image camera embeddings for its
depth pipeline (run_nerf_sample_based_depth.py:1093 nn.Embedding,
:1164 optimizer_latent) — the standard appearance-code mechanism for
photometrically inconsistent captures — but ships the path doubly
broken (NameError + TypeError; PARITY.md).  plnerf makes it work
(train/step.make_depth_train_step, --opt_ch_cam).  This study validates
the feature end-to-end on the failure mode it exists for:

Protocol (multi-object depth recipe, tools/convergence_run.run_depth):
  * jitter: each TRAIN image is scaled by a deterministic per-image
    gain (linspace over [lo, hi], slight per-channel tilt — exposure +
    white-balance variation).  Test views stay CLEAN.
  * arms, identical seeds/recipe (input_ch_cam=4 in all three so the
    architecture is constant):
      clean-control   — no jitter, embeddings zero (upper anchor)
      jitter-zero     — jitter, embeddings zero (the damage)
      jitter-opt      — jitter, --opt_ch_cam (the fix)
  * metrics: train-batch PSNR (fit to the jittered images), held-out
    PSNR/SSIM/depth-RMSE on clean views rendered with the zero
    embedding, and the correlation between each image's learned
    embedding (1-D PCA projection) and its applied gain — the
    mechanism check that the embedding actually encodes the gain.

Appends ``cam-emb-<arm>`` rows to convergence_runs.jsonl.

Usage: python tools/cam_embedding_study.py [--iters 8000] [--tiny]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence_run import DS, build_dataset, emit, eval_test  # noqa: E402

import numpy as np  # noqa: E402


def jitter_images(ds, lo=0.6, hi=1.25):
    """Per-train-image gain with a +-5% channel tilt; returns gains."""
    n = ds.images.shape[0]
    gains = np.ones((n, 3), np.float32)
    tr = np.asarray(ds.i_train)
    base = np.linspace(lo, hi, len(tr)).astype(np.float32)
    # deterministic per-channel tilt: warm on low-gain, cool on high-gain
    tilt = np.stack([1.0 + 0.05 * np.linspace(-1, 1, len(tr)),
                     np.ones(len(tr)),
                     1.0 - 0.05 * np.linspace(-1, 1, len(tr))],
                    -1).astype(np.float32)
    gains[tr] = base[:, None] * tilt
    images = np.clip(ds.images * gains[:, None, None, :], 0.0, 1.0)
    return images.astype(np.float32), gains


def run_arm(arm, iters, tiny, jitter, opt_emb, seed=0, test_opt=False):
    import jax
    import jax.numpy as jnp

    from plnerf.cli.run_depth import _make_depth_step
    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    ds = build_dataset(tiny, slab=True)
    gains = None
    if jitter:
        ds.images, gains = jitter_images(ds)

    mcfg = ModelConfig(
        netdepth=4 if tiny else 8, netwidth=64 if tiny else 256,
        skips=(2,) if tiny else (4,),
        multires=6 if tiny else 9, multires_views=0, use_viewdirs=True,
        pi_bands=True, density_activation="softplus10", init="xavier",
        input_ch_cam=4)
    ns, ni = (32, 16) if tiny else (128, 64)
    n_rand = 256 if tiny else 1024
    rcfg = RenderConfig(
        n_samples=ns, n_importance=ni, mode="linear", white_bkgd=True,
        perturb=True, compute_pred_hyp=True, trim_first_weight=True,
        mlp_dtype="bfloat16")
    setup = train_step.TrainSetup(
        mcfg=mcfg, rcfg=rcfg, lrate=5e-4, joint_optimizer=True,
        grad_clip_value=0.1, space_carving_weight=0.007,
        scaleshift_lr=1e-6, freeze_ss=0,
        start_decay_lrate=400000, end_decay_lrate=500000,
        opt_ch_cam=opt_emb, ch_cam_lr=1e-3)
    state = train_step.init_state(jax.random.key(seed), setup,
                                  n_images=ds.images.shape[0])

    n_inner = 100
    step = _make_depth_step(setup, n_rand, ds.near, ds.far, None, n_inner)
    images_j = jnp.asarray(ds.images, jnp.float32)
    poses_j = jnp.asarray(ds.poses, jnp.float32)
    intr_j = jnp.asarray(ds.intrinsics, jnp.float32)
    hyp = jnp.asarray(ds.gt_depths)[:, None]
    sc_mask = jnp.asarray(ds.gt_valid_depths.astype(np.float32))
    i_train_j = jnp.asarray(ds.i_train)

    tag = f"cam-emb-{arm}"
    key = jax.random.key(2)
    done, t0 = 0, time.time()
    while done < iters:
        key, ks = jax.random.split(key)
        state, metrics = step(state, images_j, poses_j, intr_j, hyp,
                              sc_mask, i_train_j, ks)
        done += n_inner
        if done % 2000 == 0 or done >= iters:
            ev = eval_test(state, ds, mcfg, rcfg, n_views=2, seed=done,
                           pixel_center=True)
            emit({"run": tag, "iter": done,
                  "train_psnr": round(float(metrics["psnr"]), 2),
                  **ev, "elapsed_s": round(time.time() - t0, 1)})

    final = eval_test(state, ds, mcfg, rcfg, n_views=len(ds.i_test),
                      seed=999, pixel_center=True)
    rec = {"run": tag, "iter": done, "final": True,
           "train_psnr": round(float(metrics["psnr"]), 2), **final,
           "elapsed_s": round(time.time() - t0, 1)}
    if opt_emb:
        emb = np.asarray(state.cam_embeddings)[np.asarray(ds.i_train)]
        g = gains[np.asarray(ds.i_train), 1]  # the scalar gain component
        # 1-D PCA projection of the learned embeddings vs applied gain
        c = emb - emb.mean(0)
        _, _, vt = np.linalg.svd(c, full_matrices=False)
        proj = c @ vt[0]
        r = float(np.corrcoef(proj, g)[0, 1])
        rec["emb_gain_corr"] = round(abs(r), 4)
        rec["emb_norm_mean"] = round(float(np.linalg.norm(emb, axis=1)
                                           .mean()), 4)
    emit(rec)

    if opt_emb and test_opt:
        # Close the loop with the reference's test_opt protocol
        # (run_nerf_sample_based_depth.py:311-347, via
        # train/camera_opt.py): the zero embedding does NOT map to the
        # clean gain, so held-out PSNR stays depressed even when
        # geometry/structure recover (round-4 full-scale finding) —
        # optimize a per-test-view embedding photometrically against
        # the clean test image, then re-evaluate with it.
        from plnerf.train.camera_opt import optimize_camera_embedding

        t1 = time.time()
        embs = {}
        for ti in np.asarray(ds.i_test):
            embs[int(ti)] = optimize_camera_embedding(
                state.params_coarse, state.params_fine,
                np.asarray(ds.images[ti]), ds.poses[ti],
                ds.intrinsics[ti], mcfg, rcfg, ds.near, ds.far,
                n_rand=n_rand, epochs=20 if tiny else 50, seed=5)
        final2 = eval_test(state, ds, mcfg, rcfg,
                           n_views=len(ds.i_test), seed=999,
                           pixel_center=True, cam_embeddings=embs)
        emit({"run": tag + "-testopt", "iter": done, "final": True,
              **final2,
              "emb_norm_mean": round(float(np.mean(
                  [np.linalg.norm(e) for e in embs.values()])), 4),
              "elapsed_s": round(time.time() - t1, 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--arm", default="all",
                    choices=["all", "clean-control", "jitter-zero",
                             "jitter-opt"])
    ap.add_argument("--test_opt", action="store_true",
                    help="after the jitter-opt arm, run the reference's "
                         "test_opt protocol (per-test-view embedding fit) "
                         "and emit a -testopt final row")
    args = ap.parse_args()
    arms = {
        "clean-control": dict(jitter=False, opt_emb=False),
        "jitter-zero": dict(jitter=True, opt_emb=False),
        "jitter-opt": dict(jitter=True, opt_emb=True,
                           test_opt=args.test_opt),
    }
    for arm, kw in arms.items():
        if args.arm not in ("all", arm):
            continue
        run_arm(arm, args.iters, args.tiny, **kw)


if __name__ == "__main__":
    main()
