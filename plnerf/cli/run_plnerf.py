"""PL-NeRF driver: train / test / test_fixed_dist / test_samples_error /
video, the TPU-native equivalent of the reference ``run_plnerf.py`` CLI.

Tasks (reference run_plnerf.py:919-1585):
* ``train``     — two-Adam NVS training with constant-init warmup, precrop,
                  both ray-batching policies, periodic ckpt/testset/video.
* ``test``      — held-out views + PSNR/SSIM/LPIPS → pngs + metrics.txt.
* ``test_fixed_dist``   — the quadrature-stability sweep over camera
                  distances {0.25,0.5,0.75,1.0} with near planes
                  {1e-4,0.5,1.0,2.0} (reference :1497-1560).
* ``test_samples_error`` — importance-sampling error eval (:1562-1578).
* ``video`` / ``--render_only`` — render_poses path → mp4.

TPU design: the train step (batch construction + render + loss + Adam) is
one jitted, donated-state device program; ray batches shard across the
1-D mesh and XLA all-reduces gradients over ICI.  Static-config variants
(precrop on/off x constant-init on/off) compile once each and are cached.
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..checkpoint import io as ckio
from ..core.config import ModelConfig, RenderConfig
from ..eval import images as EI
from ..eval import metrics as Mx
from ..eval.lpips import load_lpips
from ..parallel import mesh as pmesh
from ..train import batching
from ..train.step import (
    TrainSetup, build_one_step, init_state, make_train_step,
)
from ..utils.logging import MetricsLogger
from .config import config_parser, resolve_args
from .datasets import DatasetBundle, load_dataset


def _resolve_pallas(args) -> bool:
    """--use_pallas tri-state: True/False honor the explicit flag; None
    (AUTO, the default) enables the folded-head Pallas kernel for the
    train step when it is a measured win — TPU backend, bf16 matmuls,
    viewdir topology (BASELINE.md round-4 in-step A/B: 139.7 vs 148.8
    ms/step).  Eval and serving strip it again in eval_render_config
    unless the user forced --use_pallas (the kernel measures ~36%
    SLOWER than XLA at inference, round-3 eval verdict)."""
    explicit = getattr(args, "use_pallas", None)
    if explicit is not None:
        return bool(explicit)
    return (jax.default_backend() in ("tpu", "axon")
            and getattr(args, "mlp_dtype", "float32") == "bfloat16"
            and bool(getattr(args, "use_viewdirs", False))
            # measured win is recipe-shaped: linear (128+64, incl. the
            # occ-guided variant) gains 3-6%, the constant recipe's
            # 64+128 budget LOSES ~5% (BENCH r4: 68.1k vs 72.1k) — the
            # kernel's per-row fixed cost needs the larger coarse pass
            # to amortize.  Auto stays off for constant; --use_pallas
            # still forces it.
            and getattr(args, "mode", "linear") == "linear")


def build_configs(args, vanilla: bool = False):
    mcfg = ModelConfig(
        netdepth=args.netdepth, netwidth=args.netwidth,
        use_viewdirs=args.use_viewdirs, multires=args.multires,
        multires_views=args.multires_views, i_embed=args.i_embed,
        sigma_bias_init=getattr(args, "sigma_bias_init", 0.0),
    )
    mcfg_fine = None
    if (args.netdepth_fine != args.netdepth
            or args.netwidth_fine != args.netwidth):
        import dataclasses as _dc

        mcfg_fine = _dc.replace(mcfg, netdepth=args.netdepth_fine,
                                netwidth=args.netwidth_fine)
    rcfg = RenderConfig(
        n_samples=args.N_samples, n_importance=args.N_importance,
        mode=args.mode,
        color_mode=args.color_mode, lindisp=args.lindisp,
        perturb=args.perturb > 0.0, use_viewdirs=args.use_viewdirs,
        white_bkgd=args.white_bkgd, raw_noise_std=args.raw_noise_std,
        farcolorfix=getattr(args, "farcolorfix", False),
        zero_tol=args.zero_tol, epsilon=args.epsilon,
        mlp_dtype=getattr(args, "mlp_dtype", "float32"),
        # one resolution feeds both fields — they must never diverge
        # (the folded-head schedule IS the kernel being enabled)
        use_pallas_mlp=(pallas_on := _resolve_pallas(args)),
        pallas_fold_heads=pallas_on,
        remat_mlp=getattr(args, "remat", False),
    )
    setup = TrainSetup(
        mcfg=mcfg, mcfg_fine=mcfg_fine, rcfg=rcfg, lrate=args.lrate,
        coarse_lrate=args.coarse_lrate, lrate_decay=args.lrate_decay,
        joint_optimizer=vanilla,
        accum_chunks=max(1, getattr(args, "grad_accum", 1)),
    )
    return mcfg, rcfg, setup


def exp_dir(args) -> str:
    return os.path.join(args.ckpt_dir, args.expname)


def restore_or_init(args, setup: TrainSetup):
    """Returns ``(state, start, ckpt_path)`` — ``ckpt_path`` is the file the
    state was actually restored from (``--ft_path`` may point outside
    exp_dir; sidecar lookups must follow it), or None on fresh init."""
    state = init_state(jax.random.PRNGKey(args.seed), setup)
    start = 0
    path = None
    if args.ft_path:
        path = args.ft_path
    elif not args.no_reload:
        path = ckio.latest_checkpoint(exp_dir(args))
    if path and os.path.exists(path):
        state = ckio.restore_checkpoint(path, state)
        start = int(state.step)
        print(f"Resumed from {path} at step {start}")
        return state, start, path
    return state, start, None


def get_mesh(args):
    if getattr(args, "no_mesh", False) or len(jax.devices()) == 1:
        return None
    return pmesh.make_mesh()


def gate_auto_pallas_for_mesh(args, setup: TrainSetup, rcfg: RenderConfig):
    """AUTO --use_pallas scope is single-device only.  GSPMD partitioning
    of the Mosaic custom call under the dp batch constraint is unvalidated
    on real multi-chip hardware (the virtual-mesh dryrun only exercises
    interpret-mode emulation, which lowers to plain HLO), so under a mesh
    the AUTO default falls back to XLA; an explicit --use_pallas still
    forces the kernel for users who can validate it on their pod."""
    if rcfg.use_pallas_mlp and getattr(args, "use_pallas", None) is None:
        rcfg = dataclasses.replace(rcfg, use_pallas_mlp=False,
                                   pallas_fold_heads=False)
        setup = dataclasses.replace(setup, rcfg=rcfg)
        print("NOTE: auto Pallas train kernel disabled under a "
              "multi-chip mesh; pass --use_pallas to force it.")
    return setup, rcfg


def occ_cfg_from_args(args):
    """OccGridConfig from the --occ_* flags, or None (flag-gated TPU perf
    path; no reference equivalent)."""
    if not getattr(args, "occ_grid", False):
        return None
    from ..core import occgrid as og

    return og.OccGridConfig(
        resolution=args.occ_res, candidates=args.occ_candidates,
        decay=args.occ_decay, threshold=args.occ_threshold,
        floor=args.occ_floor, warmup=args.occ_warmup,
    )


def _fresh_occ_grid(args, occ_cfg):
    from ..core import occgrid as og

    b = float(args.occ_bound)
    return og.init_grid([-b, -b, -b], [b, b, b], occ_cfg)


def occ_for_eval(args):
    """(occ_cfg, grid) for a standalone eval task: the sidecar grid saved
    next to the checkpoint under evaluation.  Occ-trained coarse networks
    only see grid-guided sample distributions, so eval must use the same
    guidance (see eval/images.render_image).  A missing sidecar next to an
    existing checkpoint is an error — scoring an occ-trained model under a
    fresh (uniform-equivalent) grid silently evaluates it under a sample
    distribution it never trained with; pass --occ_eval_fresh_grid to
    override deliberately."""
    occ_cfg = occ_cfg_from_args(args)
    if occ_cfg is None:
        return None, None
    grid = _fresh_occ_grid(args, occ_cfg)
    path = (getattr(args, "ft_path", None)
            or ckio.latest_checkpoint(exp_dir(args)))
    if path:
        gp = ckio.aux_path(path, "occ")
        if os.path.exists(gp):
            grid = ckio.restore_checkpoint(gp, grid)
        elif getattr(args, "occ_eval_fresh_grid", False):
            print("WARNING: --occ_grid eval but no sidecar grid at",
                  gp, "— using a fresh (uniform) grid "
                  "(--occ_eval_fresh_grid)")
        else:
            raise FileNotFoundError(
                f"--occ_grid eval: no sidecar grid at {gp}. The model "
                "under evaluation was loaded from a checkpoint without a "
                "trained occupancy grid; evaluating it grid-guided with a "
                "fresh all-occupied grid would mis-score it. Pass "
                "--occ_eval_fresh_grid to do that deliberately, or drop "
                "--occ_grid to evaluate with uniform sampling.")
    return occ_cfg, grid


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

# Guard rail: mean occupied fraction of candidate bins along training rays
# above which grid guidance is degenerate — spreading the reduced sample
# count over a still-large occupied span trains WORSE than uniform
# sampling at the reference's full count (measured -1.7 dB / -0.13 SSIM
# on the slab fixture at 8k iters, BASELINE.md).  Calibrated against
# measured steady-state values (post carve-in): sparse object-centric
# scene ~0.10 (max 0.23 right after warmup), adversarial slab scene
# ~0.46 (0.64 right after warmup) — 0.35 separates the two classes with
# ~3x margin on the healthy side.
OCC_DEGENERATE_RAY_FRAC = 0.35

# Steps past warmup before the advisory arms: the grid inits all-occupied
# and visited empty voxels carve in ~7 observations (core/occgrid.decay),
# so every scene reads "degenerate" for the first ~1-2k guided steps while
# the EMA converges; only a reading AFTER the carve-in window indicates
# scene geometry rather than a cold grid.
OCC_ADVISORY_GRACE = 2048


def _occ_advisory(m: dict, step: int, warm_end: int, warned: bool,
                  auto_fallback: bool = False) -> bool:
    """Print a loud one-time advisory when post-warmup guidance is
    degenerate (train/step._apply_occ_update reports occ_ray_frac).
    ``auto_fallback`` adjusts the printed remedy: the NVS trainer acts on
    the signal (guidance auto-disabled at the call site) rather than only
    advising."""
    frac = m.get("occ_ray_frac")
    if (warned or frac is None or frac <= OCC_DEGENERATE_RAY_FRAC
            or step <= warm_end + OCC_ADVISORY_GRACE):
        return warned
    print("=" * 72)
    print(f"WARNING: occupancy-grid guidance is DEGENERATE at iter {step}: "
          f"{frac:.0%} of candidate bins along training rays are occupied "
          f"(> {OCC_DEGENERATE_RAY_FRAC:.0%}; healthy object-centric "
          "scenes measure ~10%).")
    print("The grid cannot skip enough empty space on this scene "
          "(slab/forward-facing-like geometry crosses most rays), so "
          "--occ_grid only spreads the reduced sample count thinner — "
          "measured ~1.7 dB WORSE than the uniform path on such scenes "
          "(BASELINE.md occ A/B).")
    if auto_fallback:
        print("AUTO-FALLBACK: grid guidance is now DISABLED for the rest "
              "of this run — training continues with uniform stratified "
              "sampling at the configured --N_samples, no further .occ "
              "sidecars are written, and eval tasks on the resulting "
              "checkpoints must run WITHOUT --occ_grid (sample "
              "distributions must match). Pass --occ_keep_degenerate to "
              "force-keep guidance; for full reference quality re-run "
              "without --occ_grid at the full uniform --N_samples.")
    else:
        print("Re-run without --occ_grid (or with the full uniform "
              "--N_samples) unless depth supervision is active, which "
              "closes the gap.")
    print("=" * 72)
    return True


# Dead-coarse advisory: render.sigma0_pos_frac reads EXACTLY 0.0 when
# every raw coarse density is negative, so relu kills every density
# gradient and the coarse geometry can never recover (BASELINE.md
# "dead-coarse anatomy": measured on every seed-0 fixture run, BOTH
# modes).  The downstream damage is mode-dependent — constant: the
# coarse has literally no live gradient (renders a constant background,
# importance sampling degrades to quasi-uniform; on DTU this cost 4 of
# 7 fine test views ~17 dB); linear: the forced tau(far)=1e10 boundary
# keeps COLOR gradients alive (the coarse paints a "billboard" pinned
# at far), but all importance samples collapse into the final interval
# (z_std == 0) so hierarchical sampling contributes nothing and the
# fine net trains on its stratified base alone.  Healthy coarse nets
# measure ~0.15 in-volume / 1.0 on-surface.  The grace window clears
# init transients and the constant_init warm window.
DEAD_COARSE_POS_FRAC = 1e-3
DEAD_COARSE_GRACE = 3000


def _dead_coarse_advisory(m: dict, step: int, warned: bool,
                          mode: str) -> bool:
    """Print a loud one-time advisory when the coarse density head has
    gone fully negative (the dead-relu trap, BASELINE.md anatomy)."""
    frac = m.get("sigma0_pos_frac")
    if (warned or frac is None or frac >= DEAD_COARSE_POS_FRAC
            or step <= DEAD_COARSE_GRACE):
        return warned
    print("=" * 72)
    print(f"WARNING: the COARSE density head is dead at iter {step}: "
          f"{frac:.1%} of its raw densities are positive, so relu zeroes "
          "every density gradient and the coarse geometry cannot recover "
          "(measured on every seed-0 fixture run, BASELINE.md "
          "dead-coarse anatomy).")
    if mode == "constant":
        print("In constant mode this is the paper's zero-gradient trap: "
              "the coarse has NO live gradient (PSNR flatlines at ~3-5 "
              "dB), importance sampling degrades to quasi-uniform, and "
              "fine-level quality can suffer badly (the DTU study lost 4 "
              "of 7 test views ~17 dB).")
    else:
        print("In linear mode color gradients survive through the forced "
              "far-boundary interval (the coarse renders a billboard "
              "pinned at far), but every importance sample collapses "
              "into that final interval — hierarchical sampling is "
              "contributing nothing; the fine net is training on its "
              "stratified samples alone.")
    print("Mitigations, verified end-to-end: RESTART with "
          "--raw_noise_std 1e0 (the reference's own llff recipe; "
          "prevents the trap and measured +0.5-0.7 dB even in linear "
          "mode) or with a different --seed (an 8-seed sweep shows the "
          "trap is init-dependent: only the 2/8 seeds whose init margin "
          "sits deepest below zero die; death is decided by iter ~500). "
          "Restarting matters: resuming a dead run with noise does NOT "
          "save it — the billboarded linear coarse is a local minimum "
          "noise cannot escape, and a late-revived constant coarse no "
          "longer repairs the fine net (BASELINE.md late-rescue study). "
          "In linear mode, NEVER set --constant_init 0: the constant "
          "warmup is what protects the coarse (pure linear training "
          "billboarded it on 8/8 seeds).")
    print("=" * 72)
    return True


def _shard(x, mesh):
    """Constrain the ray-batch axis onto the mesh so GSPMD splits the whole
    render/backward pipeline across chips (grad psum inserted by XLA)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, pmesh.batch_sharded(mesh))


def _wrap_occ(setup: TrainSetup, one_step):
    """Uniform (carry, batch, key) -> (carry, metrics) interface: when the
    occupancy grid is active (setup.rcfg.occ), carry is (state, grid) and
    each step renders with grid-guided coarse samples then folds its own
    density evaluations back into the grid EMA."""
    if setup.rcfg.occ is None:
        return one_step
    from ..train.step import _apply_occ_update

    def one(carry, batch, key):
        st, grid = carry
        st, metrics = one_step(st, dict(batch, occ_grid=grid), key)
        grid, metrics = _apply_occ_update(setup, grid, batch, metrics)
        return (st, grid), metrics

    return one


def _make_sampled_step(setup: TrainSetup, K, near, far, n_rand,
                       precrop: bool, precrop_frac: float, mesh=None,
                       ndc: bool = False, focal: float = 0.0,
                       n_inner: int = 1):
    """Fuse on-device batch sampling with the train step: one program.
    With ``n_inner > 1`` a lax.scan runs that many sample+step iterations
    per host dispatch (amortizes dispatch latency)."""
    one_step = _wrap_occ(setup, build_one_step(setup))

    def sample_and_step(state, images, poses, i_train, key):
        kb, ks = jax.random.split(key)
        rays, target, _ = batching.sample_one_image_batch(
            images, poses, K, i_train, kb, n_rand, near, far,
            setup.rcfg.use_viewdirs, precrop, precrop_frac,
            ndc=ndc, focal=focal,
        )
        rays, target = _shard(rays, mesh), _shard(target, mesh)
        return one_step(state, {"rays": rays, "target": target}, ks)

    if n_inner == 1:
        return jax.jit(sample_and_step, donate_argnums=(0,))

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, images, poses, i_train, key):
        keys = jax.random.split(key, n_inner)

        def body(st, k):
            return sample_and_step(st, images, poses, i_train, k)

        state, metrics = jax.lax.scan(body, state, keys)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return run


def _make_pool_step(setup: TrainSetup, near, far, n_rand, mesh=None,
                    n_inner: int = 1):
    one_step = _wrap_occ(setup, build_one_step(setup))

    def slice_and_step(state, pool, i_batch, key):
        rays, target = batching.pool_batch(
            pool, i_batch, n_rand, near, far, setup.rcfg.use_viewdirs
        )
        rays, target = _shard(rays, mesh), _shard(target, mesh)
        return one_step(state, {"rays": rays, "target": target}, key)

    if n_inner == 1:
        return jax.jit(slice_and_step, donate_argnums=(0,))

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, pool, i_batch, key):
        keys = jax.random.split(key, n_inner)
        offs = i_batch + jnp.arange(n_inner) * n_rand

        def body(st, xs):
            off, k = xs
            return slice_and_step(st, pool, off, k)

        state, metrics = jax.lax.scan(body, state, (offs, keys))
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return run


def run_training(args, bundle: DatasetBundle, setup: TrainSetup,
                 mcfg: ModelConfig, rcfg: RenderConfig) -> None:
    data = bundle.data
    H, W = int(data.hwf[0]), int(data.hwf[1])
    K = data.K if data.K is not None else np.array(
        [[data.hwf[2], 0, 0.5 * W], [0, data.hwf[2], 0.5 * H], [0, 0, 1]],
        np.float32,
    )
    state, start, ckpt_path = restore_or_init(args, setup)
    logger = MetricsLogger(exp_dir(args))
    mesh = get_mesh(args)
    if mesh is not None:
        state = pmesh.replicate(state, mesh)
        setup, rcfg = gate_auto_pallas_for_mesh(args, setup, rcfg)

    use_batching = not args.no_batching
    n_rand = args.N_rand
    n_inner = max(1, getattr(args, "steps_per_dispatch", 1))
    key = jax.random.PRNGKey(args.seed)

    # occupancy grid (flag-gated TPU perf path; no reference equivalent).
    # Checkpointed as a sidecar (<step>.occ) so resumes and eval tasks see
    # the trained grid, not a re-warming one.
    occ_cfg = occ_cfg_from_args(args)
    occ_state = None
    occ_restored = False
    if occ_cfg is not None:
        occ_state = _fresh_occ_grid(args, occ_cfg)
        if ckpt_path is not None:
            # follow the checkpoint actually loaded (an --ft_path can live
            # outside exp_dir; its sidecar sits next to it)
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
    # warmup semantics: a fresh grid warms up for occ_warmup steps from
    # wherever training (re)starts; a restored sidecar grid is already
    # trained, so guidance engages immediately once past the absolute
    # warmup step (no re-warming on every resume)
    occ_warm_end = 0
    if occ_cfg is not None:
        occ_warm_end = (args.occ_warmup if occ_restored
                        else start + args.occ_warmup)

    # step variants: (constant_init x precrop x occ) jit-cached via
    # TrainSetup
    def setup_variant(const_init: bool, occ_on: bool = False):
        return dataclasses.replace(
            setup, rcfg=dataclasses.replace(
                rcfg, constant_init=const_init,
                occ=occ_cfg if occ_on else None)
        )

    occ_variants = (False, True) if occ_cfg is not None else (False,)

    ev_chunk = training_eval_chunk(args, 0)   # no_batching: no pool
    if use_batching:
        # timed: at the reference's full data geometry this is a ~64M-ray
        # build + host shuffle (~2.3 GB; reference 'get rays ... shuffle
        # rays', run_plnerf.py:1199-1221)
        _t_pool = time.time()
        pool = batching.build_ray_pool(
            np.asarray(data.images, np.float32), np.asarray(data.poses), K,
            bundle.i_train, seed=args.seed,
        )
        print(f"[pool] built {pool.shape[0]:,} rays in "
              f"{time.time() - _t_pool:.1f} s "
              f"({pool.nbytes / 1e9:.2f} GB host)")
        if bundle.ndc:
            # NDC pools: warp o/d once on host, but KEEP the world-space
            # direction as the viewdir column (reference render() computes
            # viewdirs pre-NDC, run_plnerf.py:145-155)
            from ..core import rays as raysmod

            ro, rd = jnp.asarray(pool[:, 0:3]), jnp.asarray(pool[:, 3:6])
            world_d = pool[:, 3:6]
            ro, rd = raysmod.ndc_rays(H, W, float(data.hwf[2]), 1.0, ro, rd)
            pool = np.concatenate(
                [np.asarray(ro), np.asarray(rd), pool[:, 6:9], world_d],
                axis=-1,
            ).astype(np.float32)
        _t_pool = time.time()
        pool_j = jnp.asarray(pool)
        pool_j.block_until_ready()
        print(f"[pool] device transfer {time.time() - _t_pool:.1f} s")
        ev_chunk = training_eval_chunk(args, pool_j.nbytes)
        # (fused n_inner-step program, single-step program) per variant;
        # the single-step one covers phase-boundary and tail remainders
        steps = {
            (ci, oc): (
                _make_pool_step(setup_variant(ci, oc), bundle.near,
                                bundle.far, n_rand, mesh, n_inner),
                _make_pool_step(setup_variant(ci, oc), bundle.near,
                                bundle.far, n_rand, mesh, 1))
            for ci in (True, False) for oc in occ_variants
        }
        i_batch = 0
    else:
        images_j = jnp.asarray(data.images, jnp.float32)
        poses_j = jnp.asarray(np.asarray(data.poses)[:, :3, :4], jnp.float32)
        i_train_j = jnp.asarray(bundle.i_train)
        steps = {
            (ci, pc, oc): (
                _make_sampled_step(
                    setup_variant(ci, oc), K, bundle.near, bundle.far,
                    n_rand, pc, args.precrop_frac, mesh,
                    ndc=bundle.ndc, focal=float(data.hwf[2]),
                    n_inner=n_inner),
                _make_sampled_step(
                    setup_variant(ci, oc), K, bundle.near, bundle.far,
                    n_rand, pc, args.precrop_frac, mesh,
                    ndc=bundle.ndc, focal=float(data.hwf[2]), n_inner=1),
            )
            for ci in (True, False) for pc in (True, False)
            for oc in occ_variants
        }

    n_iters = args.num_iterations
    profile_n = getattr(args, "profile", 0)
    profiling = False
    # phase boundaries: dispatch windows never straddle them, so every
    # step trains in exactly the phase the reference would use
    boundaries = sorted({
        b for b in (
            args.constant_init if rcfg.mode == "linear" else 0,
            0 if use_batching else args.precrop_iters,
            (occ_warm_end + 1) if occ_cfg is not None else 0,
        ) if b > 0
    })
    t0 = time.time()
    steps_since_print = 0
    occ_warned = False
    dead_warned = False
    i0 = start + 1
    while i0 <= n_iters:
        nb = next((b for b in boundaries if b > i0), n_iters + 1)
        window_end = min(i0 + n_inner - 1, nb - 1, n_iters)
        if use_batching:
            # Consume the pool tail with full-batch remainder steps instead
            # of dropping it (the reference consumes every ray each epoch,
            # run_plnerf.py:1244-1248); static shapes mean only a < n_rand
            # remainder is skipped per epoch — see batching.build_ray_pool.
            steps_left = (pool_j.shape[0] - i_batch) // n_rand
            window_end = min(window_end, i0 + steps_left - 1)
        n_this = window_end - i0 + 1
        i = window_end

        if profile_n and not profiling and i >= start + 3:  # skip compiles
            jax.profiler.start_trace(os.path.join(exp_dir(args), "profile"))
            profiling = True
        elif profiling and i >= start + 3 + profile_n:
            jax.profiler.stop_trace()
            profiling = False
            print("Wrote profiler trace to",
                  os.path.join(exp_dir(args), "profile"))

        const_init = i0 < args.constant_init and rcfg.mode == "linear"
        occ_on = occ_cfg is not None and i0 > occ_warm_end

        def run_window(step_pair, *data_args, pool_offsets=None):
            """Run this window's steps; updates state (and the occ grid
            carry when active), returns the last step's metrics."""
            nonlocal key, state, occ_state
            fused, single = step_pair
            carry = (state, occ_state) if occ_on else state
            if n_this == n_inner:
                key, ks = jax.random.split(key)
                carry, m = fused(carry, *data_args, ks)
            else:
                m = None
                for j in range(n_this):
                    key, ks = jax.random.split(key)
                    if pool_offsets is not None:
                        # pool mode: each remainder step consumes its slice
                        carry, m = single(carry, data_args[0],
                                          pool_offsets[j], ks)
                    else:
                        carry, m = single(carry, *data_args, ks)
            if occ_on:
                state, occ_state = carry
            else:
                state = carry
            return m

        if use_batching:
            metrics = run_window(
                steps[(const_init, occ_on)], pool_j, i_batch,
                pool_offsets=[i_batch + j * n_rand for j in range(n_this)])
            i_batch += n_rand * n_this
            if pool_j.shape[0] - i_batch < n_rand:
                key, kperm = jax.random.split(key)
                pool_j = jax.random.permutation(kperm, pool_j, axis=0)
                i_batch = 0
        else:
            precrop = i0 < args.precrop_iters
            metrics = run_window(
                steps[(const_init, precrop, occ_on)],
                images_j, poses_j, i_train_j)
        i0 = window_end + 1
        steps_since_print += n_this

        def fires(period):
            """A multiple of ``period`` falls inside this window."""
            return i // period > (i - n_this) // period

        if occ_on:
            # the degenerate-guidance guard runs EVERY window, not only
            # on the i_print cadence (ADVICE r4: a large --i_print could
            # leave thousands of steps training on degenerate guidance
            # between checks).  Cost: one scalar D2H per ~100-step
            # window.  Only the acting guard lives here; printing of the
            # full metric line stays on the i_print cadence below.
            frac_m = ({"occ_ray_frac": float(metrics["occ_ray_frac"])}
                      if "occ_ray_frac" in metrics else {})
            was_warned = occ_warned
            occ_warned = _occ_advisory(
                frac_m, i, occ_warm_end, occ_warned,
                auto_fallback=not args.occ_keep_degenerate)
            if occ_warned and not was_warned:
                # record the acting signal at the step it fired — the
                # i_print cadence may be thousands of steps away
                logger.scalars(
                    i, {**frac_m, "occ_auto_fallback":
                        float(not args.occ_keep_degenerate)},
                    prefix="train/")
                if not args.occ_keep_degenerate:
                    # act on the calibrated signal (VERDICT r3 item 6):
                    # drop to the already-compiled uniform step variants,
                    # stop grid updates and sidecar writes; later eval
                    # tasks see no grid and score uniformly — matching
                    # the post-fallback training distribution
                    occ_cfg = None
                    occ_state = None

        if fires(args.i_print):
            m = {k: float(v) for k, v in metrics.items()}
            m["steps_per_sec"] = steps_since_print / max(
                time.time() - t0, 1e-9)
            t0 = time.time()
            steps_since_print = 0
            logger.scalars(i, m, prefix="train/")
            print(f"[TRAIN] Iter: {i} Loss: {m['loss']:.5f} "
                  f"PSNR: {m['psnr']:.2f} ({m['steps_per_sec']:.1f} it/s)")
            dead_warned = _dead_coarse_advisory(m, i, dead_warned,
                                                args.mode)
            if getattr(args, "debug", False):
                bad = [k for k, v in m.items() if not np.isfinite(v)]
                if bad:
                    raise FloatingPointError(
                        f"[Numerical Fail] non-finite metrics at iter {i}: "
                        f"{bad} (reference DEBUG scan, run_plnerf.py:754)")

        if fires(args.i_weights):
            path = ckio.save_checkpoint(exp_dir(args), int(state.step),
                                        state)
            if occ_state is not None:
                ckio.save_aux(path, "occ", occ_state)
            print("Saved checkpoint at", path)

        if fires(args.i_img) and len(bundle.i_val) > 0:
            vi = int(bundle.i_val[(i // args.i_img) % len(bundle.i_val)])
            out = _oom_retry(lambda c: EI.render_image(
                state.params_coarse, state.params_fine, data.poses[vi],
                data.hwf, K, mcfg,
                EI.test_render_config(rcfg, occ=occ_cfg,
                                      **_eval_pallas_overrides(args)),
                near=bundle.near, far=bundle.far, chunk=c,
                ndc=bundle.ndc, mesh=mesh, occ_grid=occ_state,
            ), ev_chunk)
            val_mse = float(np.mean(
                (out["rgb_map"] - np.asarray(data.images[vi])) ** 2))
            logger.scalars(i, {"mse": val_mse,
                               "psnr": Mx.mse2psnr(val_mse)},
                           prefix="val/")
            logger.image(i, "val/rgb", np.clip(out["rgb_map"], 0, 1))

        if fires(args.i_testset) and i < n_iters:
            _oom_retry(lambda c: run_test(
                args, bundle, mcfg, rcfg, state=state, mesh=mesh,
                suffix=f"_{i:06d}", setup=setup,
                occ=(occ_cfg, occ_state), chunk=c), ev_chunk)

        if fires(args.i_video) and i < n_iters:
            _oom_retry(lambda c: run_video(
                args, bundle, mcfg, rcfg, state=state, mesh=mesh,
                step=i, setup=setup, occ=(occ_cfg, occ_state),
                chunk=c), ev_chunk)

    if profiling:  # run ended inside the profiled window
        jax.profiler.stop_trace()
    path = ckio.save_checkpoint(exp_dir(args), int(state.step), state)
    if occ_state is not None:
        ckio.save_aux(path, "occ", occ_state)
    logger.close()
    print("Training complete.")


# ---------------------------------------------------------------------------
# eval tasks
# ---------------------------------------------------------------------------

def training_eval_chunk(args, pool_bytes: int) -> int:
    """Ray chunk for IN-TRAINING eval renders (i_img / i_testset /
    i_video).  These share HBM with the resident ray pool and the
    donated train-state double buffer; at the reference's full data
    geometry (100-view 800^2 -> 64M-ray pool, 2.3 GB on device) a
    32768-ray chunk's render intermediates (~chunk x 320 MLP points x
    width activations) no longer fit — measured RESOURCE_EXHAUSTED on
    v5e-16GB at the first i_img render of the geo800 study (round 5).
    An explicit --eval_chunk always wins; otherwise the default chunk is
    shrunk to 8192 once the pool passes 1 GB (the post-training eval
    tasks never shrink — no pool is resident there)."""
    ev = getattr(args, "eval_chunk", None)
    if ev:
        return ev
    if pool_bytes > 1e9 and args.chunk > 8192:
        print(f"[eval] shrinking in-training eval chunk {args.chunk} -> "
              f"8192 (ray pool holds {pool_bytes / 1e9:.1f} GB of HBM; "
              f"override with --eval_chunk)")
        return 8192
    return args.chunk


def _oom_retry(render_fn, chunk: int, min_chunk: int = 1024):
    """Run ``render_fn(chunk)``, quartering the chunk on
    RESOURCE_EXHAUSTED (each retry recompiles, so this is a fallback —
    training_eval_chunk avoids the common case up front)."""
    while True:
        try:
            return render_fn(chunk)
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - TPU
            if "RESOURCE_EXHAUSTED" not in str(e) or chunk <= min_chunk:
                raise
            chunk = max(min_chunk, chunk // 4)
            print(f"[eval] RESOURCE_EXHAUSTED — retrying render at "
                  f"chunk {chunk}")


def _load_state_for_eval(args, setup):
    state, start, _ = restore_or_init(args, setup)
    if start == 0 and not args.no_reload:
        print("WARNING: no checkpoint found — evaluating fresh init")
    return state


def eval_render_config(args, rcfg, occ_cfg=None):
    """Eval-task RenderConfig: the reference quirk (perturb forced back
    to True at test, run_plnerf.py:497-499 — test_render_config) plus
    this framework's --eval_det override.  The override MUST be applied
    here, after the quirk: mutating args.perturb upstream is clobbered
    by test_render_config's unconditional perturb=True (bug caught by
    test_serving's baked-manifest assert).  The auto-enabled Pallas
    train kernel is stripped here too — it is a train-step-only win
    (round-3 eval verdict) and a serving artifact must lower through
    plain XLA for every export platform — unless the user explicitly
    forced --use_pallas."""
    ov = {"occ": occ_cfg, **_eval_pallas_overrides(args)}
    if getattr(args, "eval_det", False):
        ov["perturb"] = False
    return EI.test_render_config(rcfg, **ov)


def _eval_pallas_overrides(args):
    if getattr(args, "use_pallas", None):  # explicit --use_pallas only
        return {}
    return {"use_pallas_mlp": False, "pallas_fold_heads": False}


def run_test(args, bundle, mcfg, rcfg, state=None, mesh=None,
             suffix: str = "", setup=None, occ=None, chunk=None):
    if state is None:
        state = _load_state_for_eval(args, setup)
        mesh = get_mesh(args)
    occ_cfg, occ_grid = occ if occ is not None else occ_for_eval(args)
    lp = load_lpips(getattr(args, "lpips_weights", None))
    mean_metrics, res = EI.render_images_with_metrics(
        state.params_coarse, state.params_fine, bundle.data, bundle.i_test,
        mcfg, eval_render_config(args, rcfg, occ_cfg),
        chunk=chunk or args.chunk,
        near=bundle.near, far=bundle.far, ndc=bundle.ndc, mesh=mesh,
        lpips_fn=lp, mcfg_fine=setup.mcfg_fine if setup else None,
        occ_grid=occ_grid,
    )
    result_dir = os.path.join(
        exp_dir(args),
        f"test_images_{args.mode}_{args.N_samples}_{args.N_importance}"
        f"{args.scene_id}{suffix}",
    )
    EI.write_images_with_metrics(res, mean_metrics, result_dir)
    return mean_metrics


def run_export_serving(args, mcfg, rcfg, setup):
    """--task export_serving: serialize the loaded checkpoint's render
    function (weights + occ grid embedded) into a portable jax.export
    artifact (plnerf/serving/export.py).  Eval semantics match --task
    test: test_render_config + the --eval_det / --eval_N_* dials."""
    from ..serving import export as sexport

    state = _load_state_for_eval(args, setup)
    occ_cfg, occ_grid = occ_for_eval(args)
    out_dir = (getattr(args, "serve_out", None)
               or os.path.join(exp_dir(args), "serving"))
    platforms = getattr(args, "serve_platforms", None)
    fused_n = None
    img = getattr(args, "serve_image", None)
    if img:
        h, w = (int(x) for x in img.lower().split("x"))
        fused_n = h * w
    manifest = sexport.export_renderer(
        state.params_coarse, state.params_fine, mcfg,
        eval_render_config(args, rcfg, occ_cfg), out_dir,
        chunk=args.chunk, mcfg_fine=setup.mcfg_fine, occ_grid=occ_grid,
        platforms=platforms.split(",") if platforms else None,
        fused_n_rays=fused_n,
        weights_mode=getattr(args, "serve_weights", "baked"),
        provenance={"expname": args.expname, "step": int(state.step),
                    "mode": args.mode, "N_samples": args.N_samples,
                    "N_importance": args.N_importance,
                    # geometry hints the serving client needs to build
                    # rays the way the model was trained (the artifact
                    # itself takes packed rays with per-ray near/far)
                    "dataset": args.dataset,
                    "ndc": bool(args.dataset == "llff"
                                and not getattr(args, "no_ndc", False)),
                    "set_near_plane": getattr(args, "set_near_plane",
                                              None)},
    )
    print(f"Exported serving artifact to {out_dir} "
          f"(platforms={manifest['platforms']}, chunk={manifest['chunk']}, "
          f"outputs={manifest['output_keys']})")
    return manifest


# the reference's multi-distance sweep: dist -> near plane
FIXED_DIST_NEAR = {0.25: 1e-4, 0.5: 0.5, 0.75: 1.0, 1.0: 2.0}


def run_test_fixed_dist(args, mcfg, rcfg, setup):
    state = _load_state_for_eval(args, setup)
    mesh = get_mesh(args)
    occ_cfg, occ_grid = occ_for_eval(args)
    lp = load_lpips(getattr(args, "lpips_weights", None))
    import copy

    for test_dist, near in FIXED_DIST_NEAR.items():
        eval_args = copy.copy(args)
        eval_args.dataset = "blender_fixeddist"
        eval_args.data_dir = args.eval_data_dir
        eval_args.scene_id = args.eval_scene_id
        eval_args.test_dist = test_dist
        eval_args.set_near_plane = near
        bundle = load_dataset(eval_args)
        mean_metrics, res = EI.render_images_with_metrics(
            state.params_coarse, state.params_fine, bundle.data,
            bundle.i_test, mcfg, eval_render_config(args, rcfg, occ_cfg),
            chunk=args.chunk, near=near, far=bundle.far, mesh=mesh,
            lpips_fn=lp, mcfg_fine=setup.mcfg_fine, occ_grid=occ_grid,
        )
        result_dir = os.path.join(
            exp_dir(args), f"test_images_dist{test_dist}_{args.scene_id}"
        )
        EI.write_images_with_metrics(res, mean_metrics, result_dir)
        print(f"[fixed_dist {test_dist}] psnr="
              f"{mean_metrics.get('psnr'):.3f}")


def run_test_samples_error(args, bundle, mcfg, rcfg, setup):
    state = _load_state_for_eval(args, setup)
    mesh = get_mesh(args)
    occ_cfg, occ_grid = occ_for_eval(args)
    result_dir = os.path.join(
        exp_dir(args), f"test_samples_error_{args.N_importance}"
    )
    return EI.test_images_samples(
        state.params_coarse, state.params_fine, bundle.data, bundle.i_test,
        mcfg, eval_render_config(args, rcfg, occ_cfg), result_dir,
        chunk=args.chunk, mesh=mesh, mcfg_fine=setup.mcfg_fine,
        occ_grid=occ_grid,
    )


def run_video(args, bundle, mcfg, rcfg, state=None, mesh=None, step=None,
              setup=None, occ=None, chunk=None):
    if state is None:
        state = _load_state_for_eval(args, setup)
        mesh = get_mesh(args)
        step = int(state.step)
    occ_cfg, occ_grid = occ if occ is not None else occ_for_eval(args)
    data = bundle.data
    poses = (np.asarray(data.poses)[bundle.i_test]
             if args.render_test else np.asarray(data.render_poses))
    savedir = os.path.join(
        exp_dir(args),
        "renderonly_{}_{:06d}".format(
            "test" if args.render_test else "path", step or 0)
    )
    os.makedirs(savedir, exist_ok=True)
    H, W = int(data.hwf[0]), int(data.hwf[1])
    K = data.K if data.K is not None else np.array(
        [[data.hwf[2], 0, 0.5 * W], [0, data.hwf[2], 0.5 * H], [0, 0, 1]],
        np.float32,
    )
    rgbs, _, _ = EI.render_path(
        state.params_coarse, state.params_fine, poses, data.hwf, K, mcfg,
        eval_render_config(args, rcfg, occ_cfg),
        near=bundle.near, far=bundle.far,
        chunk=chunk or args.chunk, savedir=savedir,
        render_factor=args.render_factor,
        mesh=mesh, ndc=bundle.ndc,
        mcfg_fine=setup.mcfg_fine if setup else None, occ_grid=occ_grid,
    )
    EI.write_video(os.path.join(savedir, "video.mp4"), rgbs, fps=30)
    print("Done rendering", savedir)


# ---------------------------------------------------------------------------

def run(args, vanilla: bool = False) -> None:
    if args.task != "train":
        # eval-time sample-budget override (quality/latency dial; the
        # reference cannot do this — its args.json reload pins eval to
        # the trained counts, run_plnerf.py:937-975).  Mutating args
        # keeps rcfg and the test_images_<mode>_<Ns>_<Ni> result-dir
        # naming consistent.
        if getattr(args, "eval_N_samples", None):
            args.N_samples = args.eval_N_samples
        if getattr(args, "eval_N_importance", None):
            args.N_importance = args.eval_N_importance
        # (--eval_det is applied in eval_render_config, AFTER the
        # reference's perturb-at-test quirk would clobber it)
    mcfg, rcfg, setup = build_configs(args, vanilla=vanilla)
    if args.task == "export_serving":
        # no dataset needed: near/far are per-ray inputs the serving
        # client supplies (core.render.make_ray_batch packing)
        run_export_serving(args, mcfg, rcfg, setup)
        return
    bundle = load_dataset(args)
    if args.render_only:
        run_video(args, bundle, mcfg, rcfg, setup=setup)
        return
    if args.task == "train":
        run_training(args, bundle, setup, mcfg, rcfg)
    elif args.task == "test":
        run_test(args, bundle, mcfg, rcfg, setup=setup)
    elif args.task == "test_fixed_dist":
        run_test_fixed_dist(args, mcfg, rcfg, setup)
    elif args.task == "test_samples_error":
        run_test_samples_error(args, bundle, mcfg, rcfg, setup)
    elif args.task == "video":
        run_video(args, bundle, mcfg, rcfg, setup=setup)
    else:
        raise SystemExit(f"Unknown task {args.task}")


def main(argv=None):
    args = config_parser().parse_args(argv)
    args = resolve_args(args)
    run(args)


if __name__ == "__main__":
    main()
