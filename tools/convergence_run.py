#!/usr/bin/env python
"""Multi-object convergence study (VERDICT.md round 1, item 5): train the
real recipes on the 160^2 spheres+slab fixture for thousands of TPU iters
in {constant, linear, depth} modes, eval held-out PSNR/SSIM (+depth RMSE)
on a cadence, and append curves to convergence_runs.jsonl.

Recipes mirrored:
  constant: N_samples=64,  N_importance=128 (configs/blender_constant.txt)
  linear:   N_samples=128, N_importance=64, constant_init=1000, precrop 500
            (configs/blender_linear.txt)
  depth:    linear 128+64, space-carving weight 0.007 on GT-depth
            hypotheses, softplus(10) density, pi-bands, multires 9/0,
            joint Adam + grad clip 0.1, pixel-center rays
            (depth_supervised_exps recipe, README.md:57-60)

Usage: python tools/convergence_run.py [--mode constant|linear|depth]
       [--iters N] [--tiny]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "convergence_runs.jsonl"
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


class DS:
    pass


def build_dataset(tiny, slab=True):
    from plnerf.data.synthetic import make_multi_object_dataset

    if tiny:
        d = make_multi_object_dataset(n_train=6, n_test=2, H=48, W=48,
                                      cache_dir=CACHE, slab=slab)
    else:
        d = make_multi_object_dataset(n_train=30, n_test=6, H=160, W=160,
                                      cache_dir=CACHE, slab=slab)
    ds = DS()
    ds.images = d["images"]
    ds.poses = d["poses"]
    ds.depths = d["depths"]
    ds.K = d["K"]
    ds.hwf = d["hwf"]
    ds.near, ds.far = d["near"], d["far"]
    ds.i_train, ds.i_test = d["i_train"], d["i_test"]
    ds.gt_depths = d["depths"][..., None]
    ds.gt_valid_depths = (d["depths"] > 0.0)
    # vector intrinsics for the pixel-center (depth-script) convention
    ds.intrinsics = np.tile(
        np.array([ds.K[0, 0], ds.K[1, 1], ds.K[0, 2], ds.K[1, 2]],
                 np.float32), (d["images"].shape[0], 1))
    return ds


def eval_test(state, ds, mcfg, rcfg, n_views, seed, pixel_center=False,
              chunk=8192, occ=None, cam_embeddings=None):
    from plnerf.eval import images as EI

    # eval always renders through the production XLA path — the Pallas
    # kernel is a train-step-only win (BASELINE.md round-3 eval verdict),
    # and stripping it here keeps the pallas-fold A/B train-path-pure
    rcfg = dataclasses.replace(rcfg, use_pallas_mlp=False,
                               pallas_fold_heads=False)
    occ_cfg, occ_grid = occ if occ is not None else (None, None)
    mm, _ = EI.render_images_with_metrics(
        state.params_coarse, state.params_fine, ds,
        list(ds.i_test[:n_views]), mcfg,
        EI.test_render_config(rcfg, occ=occ_cfg),
        chunk=chunk, verbose=False, seed=seed, pixel_center=pixel_center,
        occ_grid=occ_grid, cam_embeddings=cam_embeddings)
    out = {"psnr": round(float(mm.get("psnr")), 2),
           "ssim": round(float(mm.get("ssim")), 4)}
    if mm.has("depth_rmse"):
        out["depth_rmse"] = round(float(mm.get("depth_rmse")), 4)
    return out


def run_nvs(mode, iters, tiny, slab=True, occ_floor=0.03,
            lrate_decay=250, eval_every=1000, ckpt_dir="", ckpt_every=10000,
            pallas_fold=False):
    """mode: constant | linear | occ (linear recipe with occupancy-grid
    guided coarse sampling, 32 guided + 64 importance — the quality half
    of the occ-grid >=2x claim; throughput half lives in bench.py).
    Occ-trained models are EVALUATED with the grid too (train/eval sample
    distributions must match, see eval/images.render_image).

    ``ckpt_dir`` turns on chunked execution: the TrainState + RNG key +
    cumulative wall time are checkpointed every ``ckpt_every`` iters
    (plnerf.checkpoint.io msgpack, latest-2 kept) and a rerun with the
    same args auto-resumes from the latest checkpoint — a dead relay
    costs at most one chunk of a long-horizon run (VERDICT r3 item 1).
    The RNG key rides in the checkpoint, so the resumed trajectory is the
    same stream the uninterrupted run would have drawn."""
    import jax
    import jax.numpy as jnp

    from plnerf.checkpoint import io as ckio
    from plnerf.core import occgrid as og
    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import batching, step as train_step
    from plnerf.train.step import _apply_occ_update

    use_occ = mode == "occ"
    qmode = "linear" if use_occ else mode
    tag = mode if slab else mode + "-sparse"
    if lrate_decay != 250:  # non-default profile marked in the run tag
        tag += f"-decay{lrate_decay}"
    ds = build_dataset(tiny, slab=slab)
    mcfg = (ModelConfig(netdepth=4, netwidth=64, skips=(2,), multires=6,
                        multires_views=2) if tiny else ModelConfig())
    ns, ni = ((32, 16) if tiny else
              ((32, 64) if use_occ else
               ((128, 64) if mode == "linear" else (64, 128))))
    n_rand = 256 if tiny else 1024
    occ_cfg = og.OccGridConfig(resolution=128, candidates=96,
                               floor=occ_floor) \
        if use_occ else None
    rcfg = RenderConfig(n_samples=ns, n_importance=ni, mode=qmode,
                        white_bkgd=True, perturb=True,
                        mlp_dtype="bfloat16",
                        # TRAIN-path kernel A/B (round 4): folded-head
                        # Pallas MLP vs XLA, same recipe/seeds; eval
                        # below strips it (test_render_config keeps
                        # eval on XLA only if we drop it here too)
                        use_pallas_mlp=pallas_fold,
                        pallas_fold_heads=pallas_fold)
    if pallas_fold:
        tag += "-pallasfold"
    # the reference's exponential profile: 0.1x every decay*1000 steps
    # (run_plnerf.py:1307-1315); 250 is the TrainSetup default and what
    # every round-2 curve used
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg, lrate=5e-4,
                                  lrate_decay=lrate_decay)
    state = train_step.init_state(jax.random.key(0), setup)

    images_j = jnp.asarray(ds.images)
    poses_j = jnp.asarray(ds.poses)
    i_train = jnp.asarray(ds.i_train)
    precrop_iters = 500 if qmode == "linear" else 0
    constant_init = 1000 if qmode == "linear" else 0
    occ_warmup = 500 if use_occ else 0
    n_inner = 100

    def make_fused(ci, precrop, occ_on=False):
        s = dataclasses.replace(
            setup, rcfg=dataclasses.replace(
                rcfg, constant_init=ci, occ=occ_cfg if occ_on else None))
        base = train_step.build_one_step(s)

        def fused(carry, key):
            keys = jax.random.split(key, n_inner)

            def body(c, k):
                kb, ks = jax.random.split(k)
                rays, target, _ = batching.sample_one_image_batch(
                    images_j, poses_j, ds.K, i_train, kb, n_rand,
                    ds.near, ds.far, True, precrop=precrop)
                batch = {"rays": rays, "target": target}
                if occ_on:
                    st, grid = c
                    st, m = base(st, dict(batch, occ_grid=grid), ks)
                    grid, m = _apply_occ_update(s, grid, batch, m)
                    return (st, grid), m
                return base(c, batch, ks)

            c, metrics = jax.lax.scan(body, carry, keys)
            return c, jax.tree.map(lambda m: m[-1], metrics)

        return jax.jit(fused, donate_argnums=(0,))

    phases = {}
    key = jax.random.key(1)
    done = 0
    prior_elapsed = 0.0
    carry = state
    occ_engaged = False

    def ckpt_tree(st, k, elapsed):
        return {"state": st, "key": jax.random.key_data(k),
                "elapsed": jnp.asarray(elapsed, jnp.float32)}

    if ckpt_dir:
        latest = ckio.latest_checkpoint(ckpt_dir)
        if latest is not None:
            tmpl = ckpt_tree(state, key, 0.0)
            restored = ckio.restore_checkpoint(latest, tmpl)
            carry = restored["state"]
            key = jax.random.wrap_key_data(restored["key"])
            prior_elapsed = float(restored["elapsed"])
            done = int(os.path.basename(latest).split(".")[0])
            if use_occ and done >= occ_warmup:
                grid0 = og.init_grid([-2.0] * 3, [2.0] * 3, occ_cfg)
                grid = ckio.restore_checkpoint(
                    ckio.aux_path(latest, "occ"), grid0)
                carry = (carry, grid)
                occ_engaged = True
            print(f"resumed {latest} at iter {done} "
                  f"({prior_elapsed:.0f}s prior)", flush=True)

    t0 = time.time()
    while done < iters:
        ci = qmode == "linear" and done < constant_init
        pc = done < precrop_iters
        occ_on = use_occ and done >= occ_warmup
        if occ_on and not occ_engaged:
            carry = (carry, og.init_grid([-2.0] * 3, [2.0] * 3, occ_cfg))
            occ_engaged = True
        if (ci, pc, occ_on) not in phases:
            phases[(ci, pc, occ_on)] = make_fused(ci, pc, occ_on)
        key, ks = jax.random.split(key)
        carry, metrics = phases[(ci, pc, occ_on)](carry, ks)
        done += n_inner
        train_psnr = float(metrics["psnr"])
        if done % eval_every == 0 or done >= iters:
            st = carry[0] if occ_engaged else carry
            occ = (occ_cfg, carry[1]) if occ_engaged else None
            ev = eval_test(st, ds, mcfg, rcfg, n_views=2, seed=done,
                           occ=occ)
            if occ_engaged:  # grid health: fraction of sampled-occupied
                ev["occ_frac"] = round(
                    float(jnp.mean(carry[1]["occ"])), 4)
                if "occ_ray_frac" in metrics:  # advisory signal (driver
                    # guard rail threshold 0.6, cli/run_plnerf)
                    ev["occ_ray_frac"] = round(
                        float(metrics["occ_ray_frac"]), 4)
            emit({"run": tag, "iter": done,
                  "train_psnr": round(train_psnr, 2), **ev,
                  "elapsed_s": round(prior_elapsed + time.time() - t0, 1)})
        if ckpt_dir and (done % ckpt_every == 0 or done >= iters):
            st = carry[0] if occ_engaged else carry
            path = ckio.save_checkpoint(
                ckpt_dir, done,
                ckpt_tree(st, key, prior_elapsed + time.time() - t0))
            if occ_engaged:
                ckio.save_aux(path, "occ", carry[1])
            for old in ckio.list_checkpoints(ckpt_dir)[:-2]:
                os.remove(old)
                occ_side = ckio.aux_path(old, "occ")
                if os.path.exists(occ_side):
                    os.remove(occ_side)
    state = carry[0] if occ_engaged else carry
    occ = (occ_cfg, carry[1]) if occ_engaged else None
    final = eval_test(state, ds, mcfg, rcfg, n_views=len(ds.i_test),
                      seed=999, occ=occ)
    emit({"run": tag, "iter": done, "final": True, **final,
          "elapsed_s": round(prior_elapsed + time.time() - t0, 1)})


def run_depth(iters, tiny, use_occ=False, slab=True, occ_floor=0.03, eval_every=1000,
              occ_threshold=1e-2, sc_weight=0.007, is_joint=False,
              tag_suffix="", n_hyp=1, seed=0,
              start_decay=400000, end_decay=500000):
    """Depth-supervised convergence; ``use_occ`` runs the same recipe with
    occupancy-grid guided coarse sampling (32 guided + 64, grid engaged
    from the start — the depth driver's own warmup is exercised by the
    CLI test) and grid-guided eval.

    ``sc_weight``/``is_joint`` parameterize the round-4 depth-supervision
    A/B (VERDICT r3 item 2): sc_weight=0 is the photometric-only control
    at IDENTICAL compute (the per-ray hypotheses are still rendered, only
    the loss term drops), is_joint switches the space-carving quantile to
    the reference's per-image joint variant
    (run_nerf_sample_based_depth.py:1137-1161).  ``n_hyp>1`` stacks
    scaled copies of the GT depth (x1.0/x0.95/x1.05/...) as the
    hypothesis set — with a single hypothesis the min-over-hypotheses is
    trivial and is_joint is mathematically identical to per-ray
    (losses.space_carving_loss), so the joint arm only means something
    at n_hyp>=2 (the reference's pipeline carries ~20 prior samples)."""
    import jax
    import jax.numpy as jnp

    from plnerf.cli.run_depth import _make_depth_step
    from plnerf.core import occgrid as og
    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.train import step as train_step

    # softplus(10x)/10 floors at ~0.069 for raw x ~ 0, ABOVE the default
    # 1e-2 occupancy threshold — regions the net leaves near raw-zero can
    # never carve; pass occ_threshold ~0.08 to test carving above the
    # activation floor (round-3 depth-RMSE investigation)
    ds = build_dataset(tiny, slab=slab)
    mcfg = ModelConfig(
        netdepth=4 if tiny else 8, netwidth=64 if tiny else 256,
        skips=(2,) if tiny else (4,),
        multires=6 if tiny else 9, multires_views=0, use_viewdirs=True,
        pi_bands=True, density_activation="softplus10", init="xavier")
    ns, ni = ((32, 16) if tiny else ((32, 64) if use_occ else (128, 64)))
    n_rand = 256 if tiny else 1024
    occ_cfg = og.OccGridConfig(resolution=128, candidates=96,
                               floor=occ_floor,
                               threshold=occ_threshold) \
        if use_occ else None
    rcfg = RenderConfig(
        n_samples=ns, n_importance=ni, mode="linear", white_bkgd=True,
        perturb=True, compute_pred_hyp=True, trim_first_weight=True,
        mlp_dtype="bfloat16", occ=occ_cfg)
    setup = train_step.TrainSetup(
        mcfg=mcfg, rcfg=rcfg, lrate=5e-4, joint_optimizer=True,
        grad_clip_value=0.1, space_carving_weight=sc_weight,
        is_joint=is_joint,
        scaleshift_lr=1e-6, freeze_ss=0,
        # the depth script's staged ramp (reference
        # run_nerf_sample_based_depth.py:1105-1109); non-default values
        # scale the ramp into a short run's horizon so it demonstrably
        # FIRES (VERDICT r4 weak #3 — no executed run had ever crossed
        # 400k); every cadence row emits the live schedule value
        start_decay_lrate=start_decay, end_decay_lrate=end_decay)
    state = train_step.init_state(jax.random.key(seed), setup,
                                  n_images=ds.images.shape[0])

    n_inner = 100
    step = _make_depth_step(setup, n_rand, ds.near, ds.far, None, n_inner)
    images_j = jnp.asarray(ds.images, jnp.float32)
    poses_j = jnp.asarray(ds.poses, jnp.float32)
    intr_j = jnp.asarray(ds.intrinsics, jnp.float32)
    scales = (1.0, 0.95, 1.05, 0.9, 1.1)[:max(1, n_hyp)]
    hyp = jnp.stack([jnp.asarray(ds.gt_depths) * s for s in scales],
                    axis=1)                       # [N,n_hyp,H,W,1]
    sc_mask = jnp.asarray(ds.gt_valid_depths.astype(np.float32))
    i_train_j = jnp.asarray(ds.i_train)

    tag = "depth-occ" if use_occ else "depth"
    if not slab:
        tag += "-sparse"
    if use_occ and occ_threshold != 1e-2:
        tag += f"-thr{occ_threshold:g}"
    tag += tag_suffix
    if (start_decay, end_decay) != (400000, 500000):
        tag += f"-ramp{start_decay // 1000}k-{end_decay // 1000}k"
    if seed:
        tag += f"-seed{seed}"
    lr_sched = setup.fine_schedule()   # the SAME object family the
    # optimizer integrates (TrainSetup.make_optimizers) — reported per
    # cadence row so the ramp is visible in the trajectory
    carry = ((state, og.init_grid([-2.0] * 3, [2.0] * 3, occ_cfg))
             if use_occ else state)
    key = jax.random.key(2 + 1000 * seed)  # seed moves data order too
    done = 0
    t0 = time.time()
    while done < iters:
        key, ks = jax.random.split(key)
        carry, metrics = step(carry, images_j, poses_j, intr_j, hyp,
                              sc_mask, i_train_j, ks)
        done += n_inner
        if done % eval_every == 0 or done >= iters:
            state = carry[0] if use_occ else carry
            occ = (occ_cfg, carry[1]) if use_occ else None
            ev = eval_test(state, ds, mcfg, rcfg, n_views=2, seed=done,
                           pixel_center=True, occ=occ)
            if use_occ:
                ev["occ_frac"] = round(float(jnp.mean(carry[1]["occ"])), 4)
                if "occ_ray_frac" in metrics:
                    ev["occ_ray_frac"] = round(
                        float(metrics["occ_ray_frac"]), 4)
            row = {"run": tag, "iter": done,
                   "train_psnr": round(float(metrics["psnr"]), 2),
                   "lr": float(f"{float(lr_sched(done)):.3e}"),
                   **ev, "elapsed_s": round(time.time() - t0, 1)}
            if "space_carving_loss" in metrics:  # absent at sc_weight=0
                row["sc_loss"] = round(
                    float(metrics["space_carving_loss"]), 5)
            emit(row)
    state = carry[0] if use_occ else carry
    occ = (occ_cfg, carry[1]) if use_occ else None
    final = eval_test(state, ds, mcfg, rcfg, n_views=len(ds.i_test),
                      seed=999, pixel_center=True, occ=occ)
    emit({"run": tag, "iter": done, "final": True, **final,
          "elapsed_s": round(time.time() - t0, 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=["constant", "linear", "depth", "occ",
                             "depth-occ", "all", "depth-ab"])
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--pallas_fold", action="store_true",
                    help="NVS modes: train through the folded-head "
                         "Pallas MLP kernel (eval stays XLA) — the "
                         "round-4 train-path kernel quality A/B")
    ap.add_argument("--seed", type=int, default=0,
                    help="replicate seed (depth modes): moves init AND "
                         "data order; tags rows with -seedN when nonzero")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--occ_floor", type=float, default=0.03)
    ap.add_argument("--occ_threshold", type=float, default=1e-2)
    ap.add_argument("--lrate_decay", type=int, default=250,
                    help="reference exp-decay profile (x1000 steps to "
                         "0.1x; NVS modes only)")
    ap.add_argument("--eval_every", type=int, default=1000,
                    help="held-out eval cadence (raise for long-horizon "
                         "runs: 500 per-1k evals would dominate a 500k "
                         "run's wall time)")
    ap.add_argument("--ckpt_dir", default="",
                    help="enable chunked execution: checkpoint/auto-resume "
                         "the NVS run here (latest 2 kept)")
    ap.add_argument("--ckpt_every", type=int, default=10000)
    ap.add_argument("--start_decay", type=int, default=400000,
                    help="depth modes: staged-ramp start (scale it into "
                         "the horizon to watch the ramp fire)")
    ap.add_argument("--end_decay", type=int, default=500000)
    ap.add_argument("--ab_arms", default="photo,sc,scjoint",
                    help="depth-ab mode: comma list of arms to run "
                         "(photo | sc | scjoint)")
    ap.add_argument("--scene", default="slab", choices=["slab", "sparse"],
                    help="slab: spheres + checkered ground slab; sparse: "
                         "spheres only (object-centric, mostly empty rays "
                         "— the empty-space-skipping regime)")
    args = ap.parse_args()

    slab = args.scene == "slab"
    modes = ([args.mode] if args.mode != "all"
             else ["constant", "linear", "depth"])
    for m in modes:
        if m == "depth-ab":
            # VERDICT r3 item 2: depth-supervised vs photometric-only vs
            # is_joint at identical compute (same recipe/samples/iters).
            # --ab_arms selects a subset (VERDICT r4 item 6 extends the
            # horizon to 50k on the best arm vs the photometric control
            # only — the plain-sc arm was strictly dominated at 20k).
            all_arms = {
                "photo": ("-ab-photo", dict(sc_weight=0.0)),
                "sc": ("-ab-sc", dict(sc_weight=0.007)),
                "scjoint": ("-ab-scjoint",
                            dict(sc_weight=0.007, is_joint=True)),
            }
            for name in args.ab_arms.split(","):
                suffix, kw = all_arms[name]
                run_depth(args.iters, args.tiny, slab=slab,
                          eval_every=args.eval_every, tag_suffix=suffix,
                          n_hyp=3, seed=args.seed, **kw)
            continue
        if m in ("depth", "depth-occ"):
            run_depth(args.iters, args.tiny, use_occ=m == "depth-occ",
                      slab=slab, occ_floor=args.occ_floor,
                      occ_threshold=args.occ_threshold,
                      eval_every=args.eval_every,
                      start_decay=args.start_decay,
                      end_decay=args.end_decay)
        else:
            run_nvs(m, args.iters, args.tiny, slab=slab,
                    occ_floor=args.occ_floor,
                    lrate_decay=args.lrate_decay,
                    eval_every=args.eval_every,
                    ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every,
                    pallas_fold=args.pallas_fold)


if __name__ == "__main__":
    main()
