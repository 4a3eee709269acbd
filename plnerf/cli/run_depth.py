"""Depth-supervised (sample-based space-carving) driver — the TPU-native
equivalent of the reference ``depth_supervised_exps/
run_nerf_sample_based_depth.py``.

Differences from the NVS driver, all mirrored from the reference:
* positional ``task`` argument (:1258) and its own flag surface (:1256-1406)
* pi-scaled positional encoding, multires 9 / no view encoding by default,
  softplus(beta=10) density, Xavier init (model/run_nerf_helpers.py:89-205)
* pixel-center rays with per-image vector intrinsics (:243-272)
* one joint Adam over both MLPs with elementwise grad clip +-0.1 (:1156),
  staged LR decay between start/end_decay_lrate (:1105-1109)
* per-image depth scale/shift trained by their own Adam while
  ``i < freeze_ss`` (:1072-1082,1160)
* loss = mse + space_carving_weight * space-carving(pred quantiles vs
  scaled GT-depth hypotheses) + mse0 (:1137-1153)
"""
from __future__ import annotations

import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..checkpoint import io as ckio
from ..core.config import ModelConfig, RenderConfig
from ..core import rays as raysmod
from ..data import blender as dblender
from ..eval import images as EI
from ..eval import metrics as Mx
from ..eval.lpips import load_lpips
from ..parallel import mesh as pmesh
from ..train import batching
from ..train.step import TrainSetup, init_state, make_depth_train_step
from ..utils.logging import MetricsLogger
from .config import ConfigArgumentParser, add_occ_flags, str2bool
from .run_plnerf import (_fresh_occ_grid, _occ_advisory, _shard,
                         eval_render_config, get_mesh,
                         occ_cfg_from_args, occ_for_eval)


def config_parser() -> ConfigArgumentParser:
    """Flag surface of the depth script (reference :1256-1406)."""
    p = ConfigArgumentParser()
    a = p.add_argument
    a("task", type=str, nargs="?", default="train",
      help='train | test | video | test_samples_error')
    a("--config", type=str, default=None)
    a("--expname", type=str, default=None)
    a("--dataset", type=str, default="blender2_depth")
    a("--netdepth", type=int, default=8)
    a("--netwidth", type=int, default=256)
    a("--netdepth_fine", type=int, default=8)
    a("--netwidth_fine", type=int, default=256)
    a("--N_rand", type=int, default=32 * 32)
    a("--num_iterations", type=int, default=500000)
    a("--lrate", type=float, default=5e-4)
    a("--start_decay_lrate", type=int, default=400000)
    a("--end_decay_lrate", type=int, default=500000)
    a("--chunk", type=int, default=1024 * 32)
    a("--netchunk_per_gpu", type=int, default=1024 * 64 * 4)
    a("--no_reload", action="store_true")
    a("--N_samples", type=int, default=256)
    a("--N_importance", type=int, default=0)
    a("--perturb", type=float, default=1.0)
    a("--use_viewdirs", action="store_true", default=True)
    a("--i_embed", type=int, default=0)
    a("--multires", type=int, default=9)
    a("--multires_views", type=int, default=0)
    a("--raw_noise_std", type=float, default=0.0)
    a("--lindisp", action="store_true", default=False)
    a("--i_print", type=int, default=100)
    a("--i_img", type=int, default=600000)
    a("--i_weights", type=int, default=100000)
    a("--ckpt_dir", type=str, default="")
    a("--scene_id", type=str, default="chair")
    a("--data_dir", type=str, default="")
    a("--train_jsonfile", type=str, default="transforms_train.json")
    a("--precrop_iters", type=int, default=0)
    a("--precrop_frac", type=float, default=0.5)
    a("--white_bkgd", action="store_true")
    a("--half_res", action="store_true")
    a("--random_seed", type=int, default=0)
    a("--cimle_dir", type=str, default="")
    a("--num_hypothesis", type=int, default=20)
    a("--space_carving_weight", type=float, default=0.007)
    a("--warm_start_nerf", type=int, default=0)
    a("--scaleshift_lr", default=1e-6, type=float)
    a("--scale_init", default=1.0, type=float)
    a("--shift_init", default=0.0, type=float)
    a("--freeze_ss", type=int, default=0)
    a("--is_joint", default=False, type=str2bool)
    a("--norm_p", type=int, default=2)
    a("--space_carving_threshold", type=float, default=0.0)
    a("--mask_corners", default=False, type=str2bool)
    a("--input_ch_cam", type=int, default=0)
    a("--opt_ch_cam", action="store_true", default=False)
    a("--ch_cam_lr", default=1e-4, type=float)
    a("--mode", type=str, default="constant")
    a("--color_mode", type=str, default="midpoint")
    a("--quad_solution_v2", default=True, type=str2bool)
    a("--zero_tol", type=float, default=1e-4)
    a("--epsilon", type=float, default=1e-3)
    a("--set_near_plane", default=0.5, type=float)
    a("--train_skip", default=1, type=int)
    # TPU-native additions
    a("--lpips_weights", type=str, default=None)
    a("--steps_per_dispatch", type=int, default=1,
      help="fuse N optimization steps into one device dispatch")
    a("--mlp_dtype", type=str, default="float32")
    a("--use_pallas", action="store_true")
    a("--no_mesh", action="store_true")
    a("--eval_N_samples", type=int, default=None,
      help="eval tasks: sample-budget override (see run_plnerf)")
    a("--eval_N_importance", type=int, default=None)
    a("--eval_det", action="store_true",
      help="eval tasks: deterministic sample placement (see run_plnerf)")
    add_occ_flags(a)
    return p


def build_configs(args):
    mcfg = ModelConfig(
        netdepth=args.netdepth, netwidth=args.netwidth,
        use_viewdirs=args.use_viewdirs, multires=args.multires,
        multires_views=args.multires_views, i_embed=args.i_embed,
        pi_bands=True, input_ch_cam=args.input_ch_cam,
        density_activation="softplus10", init="xavier",
    )
    # distinct fine-network dims (reference builds model_fine from
    # args.netdepth_fine/netwidth_fine, run_nerf_sample_based_depth.py:581)
    mcfg_fine = None
    if (args.netdepth_fine != args.netdepth
            or args.netwidth_fine != args.netwidth):
        import dataclasses as _dc

        mcfg_fine = _dc.replace(mcfg, netdepth=args.netdepth_fine,
                                netwidth=args.netwidth_fine)
    rcfg = RenderConfig(
        n_samples=args.N_samples, n_importance=args.N_importance,
        mode=args.mode, color_mode=args.color_mode, lindisp=args.lindisp,
        perturb=args.perturb > 0.0, use_viewdirs=args.use_viewdirs,
        white_bkgd=args.white_bkgd, raw_noise_std=args.raw_noise_std,
        farcolorfix=getattr(args, "farcolorfix", False),
        zero_tol=args.zero_tol, epsilon=args.epsilon,
        compute_pred_hyp=args.space_carving_weight > 0.0,
        is_joint=args.is_joint, trim_first_weight=True,
        mlp_dtype=args.mlp_dtype, use_pallas_mlp=args.use_pallas,
    )
    setup = TrainSetup(
        mcfg=mcfg, mcfg_fine=mcfg_fine, rcfg=rcfg, lrate=args.lrate,
        joint_optimizer=True, grad_clip_value=0.1,
        space_carving_weight=args.space_carving_weight,
        warm_start_nerf=args.warm_start_nerf, is_joint=args.is_joint,
        norm_p=args.norm_p,
        space_carving_threshold=args.space_carving_threshold,
        scaleshift_lr=args.scaleshift_lr, freeze_ss=args.freeze_ss,
        start_decay_lrate=args.start_decay_lrate,
        end_decay_lrate=args.end_decay_lrate,
        opt_ch_cam=args.opt_ch_cam, ch_cam_lr=args.ch_cam_lr,
    )
    return mcfg, rcfg, setup


def load_depth_dataset(args):
    scene_dir = os.path.join(args.data_dir, args.scene_id)
    if args.dataset == "blender_depth":
        loader = dblender.load_blender_depth
    elif args.dataset == "blender2_depth":
        loader = dblender.load_blender2_depth
    else:
        raise SystemExit(
            f"Dataloader not implemented for dataset: {args.dataset}")
    data = loader(
        scene_dir, half_res=args.half_res, train_skip=args.train_skip,
        near_plane=args.set_near_plane,
    )
    data.images = dblender.apply_background(data.images, args.white_bkgd)
    # per-frame vector intrinsics are the K for the pixel-center convention
    data.K = np.asarray(data.intrinsics[0])
    return data


def exp_dir(args) -> str:
    return os.path.join(args.ckpt_dir, args.expname)


def _make_depth_step(setup: TrainSetup, n_rand: int, near, far, mesh=None,
                     n_inner: int = 1):
    """Fused on-device: pick pixels of image img_i, build pixel-center rays
    from its vector intrinsics, gather targets + depth hypotheses + mask,
    then run the depth train step.  With ``n_inner > 1`` a lax.scan fuses
    that many (image-choice + sample + step) iterations into one dispatch;
    the training image is then drawn on device instead of by the host
    np.random.choice (reference :1113) — same distribution.

    When ``setup.rcfg.occ`` is set, the carry is ``(state, occ_grid)``:
    coarse samples are grid-guided and the grid EMA folds in each step's
    density observations (same contract as run_plnerf's occ variants)."""
    base = make_depth_train_step(setup)
    use_occ = setup.rcfg.occ is not None
    if use_occ:
        from ..train.step import _apply_occ_update

    def one(carry, images, poses, intrinsics, hyp, sc_mask, img_i, key):
        H, W = images.shape[1], images.shape[2]
        kpix, ks = jax.random.split(key)
        y, x = batching.select_pixels(kpix, H, W, n_rand, False, 0.5)
        coords = jnp.stack([y, x], -1)
        rays_o, rays_d = raysmod.get_rays_pixelcenter(
            H, W, intrinsics[img_i], poses[img_i][:3, :4], coords
        )
        target = images[img_i, y, x]
        target_h = hyp[img_i][:, y, x]            # [H_hyp, R, 1]
        mask = sc_mask[img_i, y, x].astype(jnp.float32)
        viewdirs = None
        if setup.rcfg.use_viewdirs:
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1,
                                                keepdims=True)
        rays = raysmod.pack_rays(rays_o, rays_d, near, far, viewdirs)
        batch = {
            "rays": _shard(rays, mesh), "target": _shard(target, mesh),
            "target_h": target_h, "sc_mask": _shard(mask, mesh),
            "img_idx": img_i,
        }
        if mesh is not None:
            batch["target_h"] = jax.lax.with_sharding_constraint(
                target_h, pmesh.NamedSharding(
                    mesh, pmesh.P(None, pmesh.DATA_AXIS))
            )
        if use_occ:
            state, grid = carry
            state, metrics = base(state, dict(batch, occ_grid=grid), ks)
            grid, metrics = _apply_occ_update(setup, grid, batch, metrics)
            return (state, grid), metrics
        return base(carry, batch, ks)

    if n_inner == 1:
        return jax.jit(one, donate_argnums=(0,))

    @partial(jax.jit, donate_argnums=(0,))
    def run(carry, images, poses, intrinsics, hyp, sc_mask, i_train, key):
        keys = jax.random.split(key, n_inner)

        def body(c, k):
            kimg, kstep = jax.random.split(k)
            ti = jax.random.randint(kimg, (), 0, i_train.shape[0])
            return one(c, images, poses, intrinsics, hyp, sc_mask,
                       i_train[ti], kstep)

        carry, metrics = jax.lax.scan(body, carry, keys)
        return carry, jax.tree.map(lambda m: m[-1], metrics)

    return run


def run_training(args, data, setup, mcfg, rcfg):
    i_train, i_val, i_test = [np.asarray(s) for s in data.i_split[:3]]
    if len(i_val) == 0:
        i_val = i_test
    logger = MetricsLogger(exp_dir(args))
    mesh = get_mesh(args)

    state = init_state(jax.random.PRNGKey(args.random_seed), setup,
                       n_images=data.images.shape[0])
    if args.scale_init != 1.0:
        state = state.replace(
            depth_scales=state.depth_scales * args.scale_init)
    if args.shift_init != 0.0:
        state = state.replace(
            depth_shifts=state.depth_shifts + args.shift_init)
    start = 0
    ckpt_path = None
    if not args.no_reload:
        path = ckio.latest_checkpoint(exp_dir(args))
        if path:
            state = ckio.restore_checkpoint(path, state)
            start = int(state.step)
            ckpt_path = path
            print(f"Resumed from {path} at step {start}")
    if mesh is not None:
        state = pmesh.replicate(state, mesh)

    # occupancy grid (flag-gated TPU perf path, shared with run_plnerf;
    # sidecar-checkpointed as <step>.occ and restored from next to the
    # checkpoint actually loaded)
    occ_cfg = occ_cfg_from_args(args)
    occ_state = None
    occ_restored = False
    if occ_cfg is not None:
        occ_state = _fresh_occ_grid(args, occ_cfg)
        if ckpt_path is not None:
            gp = ckio.aux_path(ckpt_path, "occ")
            if os.path.exists(gp):
                occ_state = ckio.restore_checkpoint(gp, occ_state)
                occ_restored = True
            else:
                print(f"WARNING: resuming --occ_grid run but no sidecar "
                      f"grid at {gp} — starting a fresh grid with a new "
                      f"{args.occ_warmup}-step warmup")
        if mesh is not None:
            occ_state = pmesh.replicate(occ_state, mesh)
    # restored grids engage immediately past the absolute warmup step;
    # fresh grids re-warm from the resume point (see run_plnerf)
    occ_warm_end = 0
    if occ_cfg is not None:
        occ_warm_end = (args.occ_warmup if occ_restored
                        else start + args.occ_warmup)

    # GT depth as the (single) space-carving hypothesis
    # (reference :1068-1070: gt_depths_train unsqueezed to hypothesis dim)
    hyp = jnp.asarray(data.gt_depths)[:, None, :, :, 0:1]  # [N,1,H,W,1]
    sc_mask = jnp.asarray(
        np.asarray(data.gt_valid_depths).astype(np.float32))
    if sc_mask.ndim == 4:
        sc_mask = sc_mask[..., 0]
    images_j = jnp.asarray(data.images, jnp.float32)
    poses_j = jnp.asarray(data.poses, jnp.float32)
    intr_j = jnp.asarray(data.intrinsics, jnp.float32)

    n_inner = max(1, getattr(args, "steps_per_dispatch", 1))
    import dataclasses as _dc

    steps: dict = {}

    def get_step(occ_on: bool, inner: int):
        """jit-cached (occ x inner) step variants, built on demand."""
        k = (occ_on, inner)
        if k not in steps:
            s = setup if not occ_on else _dc.replace(
                setup, rcfg=_dc.replace(setup.rcfg, occ=occ_cfg))
            steps[k] = _make_depth_step(s, args.N_rand, data.near,
                                        data.far, mesh, inner)
        return steps[k]

    i_train_j = jnp.asarray(i_train)
    key = jax.random.PRNGKey(args.random_seed)
    rng = np.random.default_rng(args.random_seed)
    t0 = time.time()
    steps_since_print = 0
    occ_warned = False
    i0 = start + 1
    while i0 <= args.num_iterations:
        occ_on = occ_cfg is not None and i0 > occ_warm_end
        # split the dispatch window at the occ-warmup boundary so one jit
        # cache per phase suffices (mirrors run_plnerf's phase windows)
        nb = (occ_warm_end + 1
              if occ_cfg is not None and not occ_on
              else args.num_iterations + 1)
        window_end = min(i0 + n_inner - 1, nb - 1, args.num_iterations)
        n_this = window_end - i0 + 1
        i = window_end
        carry = (state, occ_state) if occ_on else state
        if n_this == n_inner and n_inner > 1:
            key, ks = jax.random.split(key)
            carry, metrics = get_step(occ_on, n_inner)(
                carry, images_j, poses_j, intr_j, hyp, sc_mask,
                i_train_j, ks)
        else:
            for _ in range(n_this):
                key, ks = jax.random.split(key)
                img_i = jnp.asarray(int(rng.choice(i_train)))
                carry, metrics = get_step(occ_on, 1)(
                    carry, images_j, poses_j, intr_j, hyp, sc_mask,
                    img_i, ks)
        if occ_on:
            state, occ_state = carry
        else:
            state = carry
        i0 = window_end + 1
        steps_since_print += n_this

        def fires(period):
            return i // period > (i - n_this) // period

        if fires(args.i_print):
            m = {k: float(v) for k, v in metrics.items()}
            # count steps actually executed since the last print (mirrors
            # run_plnerf.run_training; ADVICE.md round 1)
            m["steps_per_sec"] = steps_since_print / max(
                time.time() - t0, 1e-9)
            t0 = time.time()
            steps_since_print = 0
            m["depth_scale_mean"] = float(jnp.mean(state.depth_scales))
            m["depth_shift_mean"] = float(jnp.mean(state.depth_shifts))
            logger.scalars(i, m, prefix="train/")
            print(f"[DEPTH TRAIN] Iter: {i} Loss: {m['loss']:.5f} "
                  f"PSNR: {m['psnr']:.2f} SC: "
                  f"{m.get('space_carving_loss', 0.0):.5f}")
            if occ_on:
                # depth supervision usually closes the degenerate-scene
                # gap (BASELINE.md), but surface the signal anyway
                occ_warned = _occ_advisory(m, i, occ_warm_end, occ_warned)
        if fires(args.i_img) and len(i_val) > 0:
            # val view + depth RMSE (reference tb images, :1203-1232)
            vi = int(i_val[(i // args.i_img) % len(i_val)])
            out = EI.render_image(
                state.params_coarse, state.params_fine, data.poses[vi],
                data.hwf, data.intrinsics[vi], mcfg,
                EI.test_render_config(rcfg, occ=occ_cfg),
                near=data.near, far=data.far,
                chunk=args.chunk, mesh=mesh, pixel_center=True,
                mcfg_fine=setup.mcfg_fine, occ_grid=occ_state,
            )
            val_mse = float(np.mean(
                (out["rgb_map"] - np.asarray(data.images[vi])) ** 2))
            rec = {"mse": val_mse, "psnr": Mx.mse2psnr(val_mse)}
            if data.gt_depths is not None:
                gt = np.asarray(data.gt_depths[vi])[..., 0]
                valid = np.asarray(data.gt_valid_depths[vi]).astype(bool)
                if valid.any():
                    rec["depth_rmse"] = float(np.sqrt(np.mean(
                        (out["depth_map"][valid] - gt[valid]) ** 2)))
            logger.scalars(i, rec, prefix="val/")
            logger.image(i, "val/rgb", np.clip(out["rgb_map"], 0, 1))
        if fires(args.i_weights):
            path = ckio.save_checkpoint(exp_dir(args), int(state.step),
                                        state)
            if occ_state is not None:
                ckio.save_aux(path, "occ", occ_state)
            print("Saved", path)
    path = ckio.save_checkpoint(exp_dir(args), int(state.step), state)
    if occ_state is not None:
        ckio.save_aux(path, "occ", occ_state)
    logger.close()


def run(args):
    if args.task != "train":
        # eval-time sample-budget override — same serving dial as
        # run_plnerf (see cli/config.py --eval_N_samples); mutating args
        # keeps the result-dir naming consistent with the counts used
        if getattr(args, "eval_N_samples", None):
            args.N_samples = args.eval_N_samples
        if getattr(args, "eval_N_importance", None):
            args.N_importance = args.eval_N_importance
        # (--eval_det is applied in eval_render_config, AFTER the
        # reference's perturb-at-test quirk would clobber it)
    mcfg, rcfg, setup = build_configs(args)
    data = load_depth_dataset(args)
    if args.task == "train":
        run_training(args, data, setup, mcfg, rcfg)
        return
    # eval tasks
    state = init_state(jax.random.PRNGKey(args.random_seed), setup,
                       n_images=data.images.shape[0])
    path = ckio.latest_checkpoint(exp_dir(args))
    if path:
        state = ckio.restore_checkpoint(path, state)
        print(f"Loaded {path}")
    mesh = get_mesh(args)
    i_test = np.asarray(data.i_split[2])
    # occ-trained models evaluate with the sidecar grid (same contract as
    # run_plnerf; camera-embedding test-time opt runs grid-less — its
    # render_rays falls back to uniform when no grid is passed)
    occ_cfg_e, occ_grid_e = occ_for_eval(args)
    test_rcfg = eval_render_config(args, rcfg, occ_cfg_e)
    if args.task in ("test", "test_opt"):
        lp = load_lpips(args.lpips_weights)
        # test-time camera-embedding optimization (reference
        # run_nerf_sample_based_depth.py:311-347, task test_opt)
        cam_embeddings = None
        # optimization only actually runs with camera-embedding channels;
        # the label must reflect what ran
        with_opt = (mcfg.input_ch_cam > 0
                    and (args.task == "test_opt" or args.opt_ch_cam))
        if args.task == "test_opt" and mcfg.input_ch_cam == 0:
            print("WARNING: test_opt without --input_ch_cam > 0 — nothing "
                  "to optimize; running plain test")
        if with_opt:
            from ..train.camera_opt import optimize_camera_embedding

            cam_embeddings = {}
            for ti in i_test:
                cam_embeddings[int(ti)] = optimize_camera_embedding(
                    state.params_coarse, state.params_fine,
                    np.asarray(data.images[ti]), data.poses[ti],
                    data.intrinsics[ti], mcfg, test_rcfg,
                    near=data.near, far=data.far, n_rand=args.N_rand,
                )
        mm, res = EI.render_images_with_metrics(
            state.params_coarse, state.params_fine, data, i_test, mcfg,
            test_rcfg, chunk=args.chunk, mesh=mesh, lpips_fn=lp,
            pixel_center=True, cam_embeddings=cam_embeddings,
            mcfg_fine=setup.mcfg_fine, occ_grid=occ_grid_e,
        )
        result_dir = os.path.join(
            exp_dir(args),
            f"test_images_{args.mode}_{args.N_samples}_{args.N_importance}"
            f"{'with_optimization_' if with_opt else ''}{args.scene_id}",
        )
        EI.write_images_with_metrics(res, mm, result_dir)
    elif args.task == "test_samples_error":
        # depth variant: valid-depth-masked metric, reference naming
        # (run_nerf_sample_based_depth.py:400-420)
        result_dir = os.path.join(
            exp_dir(args),
            f"test_predicted_samples_error_{args.N_importance}")
        EI.test_images_samples(
            state.params_coarse, state.params_fine, data, i_test, mcfg,
            test_rcfg, result_dir, chunk=args.chunk, mesh=mesh,
            pixel_center=True, valid_mask_from_dataset=True,
            metrics_filename="metrics_depth_samples.txt",
            mcfg_fine=setup.mcfg_fine, occ_grid=occ_grid_e,
        )
    elif args.task == "video":
        i_video = (np.asarray(data.i_split[3])
                   if len(data.i_split) > 3 else i_test)
        savedir = os.path.join(exp_dir(args), "video")
        rgbs, _, depths = EI.render_path(
            state.params_coarse, state.params_fine,
            np.asarray(data.poses)[i_video], data.hwf, data.K, mcfg,
            test_rcfg, near=data.near, far=data.far, chunk=args.chunk,
            savedir=savedir, mesh=mesh, pixel_center=True,
            mcfg_fine=setup.mcfg_fine, occ_grid=occ_grid_e,
        )
        EI.write_video(os.path.join(savedir, "video.mp4"), rgbs, fps=10)
        # 16-bit + TURBO depth frames from the renderer's expected depth
        # (reference render_video writes extras['depth_map'], :283-300)
        EI.write_depth_video_frames(savedir, depths, far=data.far)
    else:
        raise SystemExit(f"Unknown task {args.task}")


def main(argv=None):
    from .config import resolve_args

    args = config_parser().parse_args(argv)
    # the depth script shares the args.json round-trip semantics
    args = resolve_args(args)
    run(args)


if __name__ == "__main__":
    main()
