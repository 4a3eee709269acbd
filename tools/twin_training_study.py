#!/usr/bin/env python
"""Twin-training parity at a REAL horizon (VERDICT r3 item 7): train the
imported torch reference (run_plnerf.py:1282-1315 loop: render_rays +
dual Adam + the exponential LR-decay update, coarse-LR bug included) and
plnerf side-by-side on the same sphere fixture for ~2k iters — far past
the 20-step trajectory parity (tests/test_training_parity.py), so LR
decay, raw-noise regularization, and the coarse->fine importance-
resampling feedback loop all engage.

Shared across the twins: initial weights (torch init -> jax via
checkpoint conversion), the exact per-step ray batches/targets (numpy,
seeded), model/recipe hyperparameters.  Independent: the stochastic
draws (perturb t_rand, importance u, raw noise) — each framework uses
its own RNG stream, so this is a STATISTICAL comparison of final
PSNR/loss, not the bit-level 20-step parity.

Emits per-cadence rows for both curves to convergence_runs.jsonl
(run=twin-parity-<mode>, framework=torch|jax) and a final row with both
held-out PSNRs.  CPU-only (the reference is torch-cpu here).

Usage: python tools/twin_training_study.py [--mode linear|constant|both]
       [--iters 2000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

OUT = os.path.join(REPO, "convergence_runs.jsonl")

R, NS, NI = 256, 24, 24
LR = 5e-3
DECAY = 2          # 0.1x at 2k steps — decay fully engages in-horizon
NOISE = 1.0        # raw_noise_std: the reference's llff-recipe value
CI = 200           # linear-mode constant_init window (recipe shape)
EVAL_CHUNK = 1024


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def load_reference():
    from conftest import load_reference_module
    from test_render_parity import _stub

    _stub("torchvision")
    _stub("torchvision.utils", make_grid=lambda *a, **k: None)
    _stub("skimage")
    _stub("skimage.metrics", structural_similarity=lambda *a, **k: 0.0)
    _stub("lpips", LPIPS=lambda *a, **k: None)
    _stub("configargparse", ArgumentParser=object)
    _stub("natsort", natsorted=sorted)
    sys.path.insert(0, "/root/reference")
    try:
        return load_reference_module("ref_plnerf", "run_plnerf.py")
    finally:
        sys.path.remove("/root/reference")


def build_scene():
    from plnerf.data.synthetic import make_sphere_dataset

    images, poses, hwf, K = make_sphere_dataset(n_views=10, H=48, W=48)
    return images, poses, K, np.arange(8), np.arange(8, 10), 2.0, 6.0


def all_rays(images, poses, K, near, far):
    """[N, H, W, 11] packed rays (o, d, near, far, viewdir) for every
    pixel — both twins consume identical numpy batches sliced from
    this."""
    from plnerf.train.batching import rays_for_pixels
    import jax.numpy as jnp

    N, H, W = images.shape[:3]
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    out = np.empty((N, H, W, 11), np.float32)
    for n in range(N):
        ro, rd = rays_for_pixels(
            K, jnp.asarray(poses[n][:3, :4]), jnp.asarray(y.ravel()),
            jnp.asarray(x.ravel()))
        ro, rd = np.asarray(ro), np.asarray(rd)
        vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
        out[n] = np.concatenate(
            [ro, rd, np.full_like(ro[:, :1], near),
             np.full_like(ro[:, :1], far), vd], -1).reshape(H, W, 11)
    return out


def make_batches(rays_all, images, i_train, iters, seed=5):
    rng = np.random.default_rng(seed)
    H, W = images.shape[1:3]
    for _ in range(iters):
        n = int(rng.choice(i_train))
        y = rng.integers(0, H, R)
        x = rng.integers(0, W, R)
        yield rays_all[n, y, x], images[n, y, x].astype(np.float32)


# ---------------------------------------------------------------------------
# torch twin — mirrors the reference training loop verbatim in behavior
# ---------------------------------------------------------------------------

def run_torch(ref, mode, iters, rays_all, images, i_train, i_test, tag):
    import torch

    helpers = sys.modules["ref_plnerf"]
    from plnerf.core.config import ModelConfig

    mcfg = ModelConfig(netdepth=2, netwidth=32, multires=4,
                       multires_views=2)
    torch.manual_seed(0)
    kw = dict(D=mcfg.netdepth, W=mcfg.netwidth, input_ch=mcfg.input_ch,
              input_ch_views=mcfg.input_ch_views, output_ch=5,
              skips=list(mcfg.skips), use_viewdirs=True)
    coarse, fine = helpers.NeRF(**kw), helpers.NeRF(**kw)

    embed_fn, _ = helpers.get_embedder(mcfg.multires)
    embeddirs_fn, _ = helpers.get_embedder(mcfg.multires_views)

    def query(inputs, viewdirs, network_fn):
        return ref.run_network(inputs, viewdirs, network_fn,
                               embed_fn=embed_fn,
                               embeddirs_fn=embeddirs_fn, netchunk=1 << 16)

    def render(batch, noise, constant_init):
        return ref.render_rays(
            batch, network_fn=coarse, network_query_fn=query,
            N_samples=NS, mode=mode, color_mode="midpoint", retraw=False,
            lindisp=False, perturb=1.0, N_importance=NI,
            network_fine=fine, white_bkgd=True, raw_noise_std=noise,
            constant_init=constant_init)

    opt_f = torch.optim.Adam(fine.parameters(), lr=LR)
    opt_c = torch.optim.Adam(coarse.parameters(), lr=LR)

    t0 = time.time()
    ema = None
    for step, (rays, target) in enumerate(
            make_batches(rays_all, images, i_train, iters)):
        ci = mode == "linear" and step < CI
        ret = render(torch.from_numpy(rays), NOISE, ci)
        t = torch.from_numpy(target)
        loss = torch.mean((ret["rgb_map"] - t) ** 2) + torch.mean(
            (ret["rgb0"] - t) ** 2)
        opt_f.zero_grad()
        opt_c.zero_grad()
        loss.backward()
        opt_f.step()
        opt_c.step()
        # the reference's post-step LR update, coarse-LR bug included
        # (coarse groups get the FINE schedule's value,
        # run_plnerf.py:1306-1315)
        new_lrate = LR * (0.1 ** ((step + 1) / (DECAY * 1000)))
        for g in opt_f.param_groups:
            g["lr"] = new_lrate
        for g in opt_c.param_groups:
            g["lr"] = new_lrate
        ema = float(loss) if ema is None else 0.95 * ema + 0.05 * float(loss)
        if (step + 1) % 200 == 0:
            emit({"run": tag, "framework": "torch", "iter": step + 1,
                  "loss_ema": round(ema, 5),
                  "elapsed_s": round(time.time() - t0, 1)})

    # held-out eval (reference test path: perturb stays 1 — the quirk —
    # noise off)
    torch.manual_seed(7)
    mses = []
    with torch.no_grad():
        for n in i_test:
            flat = torch.from_numpy(
                rays_all[n].reshape(-1, 11))
            outs = [render(flat[c:c + EVAL_CHUNK], 0.0, False)["rgb_map"]
                    for c in range(0, flat.shape[0], EVAL_CHUNK)]
            rgb = torch.cat(outs, 0).reshape(images[n].shape)
            mses.append(float(torch.mean(
                (rgb - torch.from_numpy(
                    images[n].astype(np.float32))) ** 2)))
    psnr = float(-10 * np.log10(np.mean(mses)))
    return psnr, ema


# ---------------------------------------------------------------------------
# jax twin — the production train step, identical init + batches
# ---------------------------------------------------------------------------

def run_jax(mode, iters, rays_all, images, i_train, i_test, tag):
    import jax
    import jax.numpy as jnp
    import torch

    from plnerf.checkpoint import convert_torch
    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.eval import images as EI
    from plnerf.train.step import TrainSetup, init_state, make_train_step

    helpers = sys.modules["ref_plnerf"]
    mcfg = ModelConfig(netdepth=2, netwidth=32, multires=4,
                       multires_views=2)
    torch.manual_seed(0)
    kw = dict(D=mcfg.netdepth, W=mcfg.netwidth, input_ch=mcfg.input_ch,
              input_ch_views=mcfg.input_ch_views, output_ch=5,
              skips=list(mcfg.skips), use_viewdirs=True)
    params_c = jax.tree.map(jnp.asarray, convert_torch.state_dict_to_params(
        helpers.NeRF(**kw).state_dict()))
    params_f = jax.tree.map(jnp.asarray, convert_torch.state_dict_to_params(
        helpers.NeRF(**kw).state_dict()))

    rcfg = RenderConfig(n_samples=NS, n_importance=NI, mode=mode,
                        color_mode="midpoint", white_bkgd=True,
                        perturb=True, raw_noise_std=NOISE)
    import dataclasses

    setups = {
        ci: TrainSetup(
            mcfg=mcfg, rcfg=dataclasses.replace(rcfg, constant_init=ci),
            lrate=LR, coarse_lrate=LR, lrate_decay=DECAY)
        for ci in ((True, False) if mode == "linear" else (False,))
    }
    state = init_state(jax.random.key(0), setups[False])
    state = state.replace(params_coarse=params_c, params_fine=params_f)
    steps = {ci: make_train_step(s) for ci, s in setups.items()}

    t0 = time.time()
    key = jax.random.key(42)
    ema = None
    for step, (rays, target) in enumerate(
            make_batches(rays_all, images, i_train, iters)):
        ci = mode == "linear" and step < CI
        key, ks = jax.random.split(key)
        state, metrics = steps[ci](
            state, {"rays": jnp.asarray(rays), "target": jnp.asarray(target)},
            ks)
        loss = float(metrics["loss"])
        ema = loss if ema is None else 0.95 * ema + 0.05 * loss
        if (step + 1) % 200 == 0:
            emit({"run": tag, "framework": "jax", "iter": step + 1,
                  "loss_ema": round(ema, 5),
                  "elapsed_s": round(time.time() - t0, 1)})

    mses = []
    for n in i_test:
        flat = jnp.asarray(rays_all[n].reshape(-1, 11))
        from plnerf.core import render as rmod

        outs = []
        ecfg = EI.test_render_config(rcfg)
        for c in range(0, flat.shape[0], EVAL_CHUNK):
            ret = rmod.render_rays(
                state.params_coarse, state.params_fine,
                flat[c:c + EVAL_CHUNK], jax.random.key(7), mcfg, ecfg)
            outs.append(np.asarray(ret["rgb_map"]))
        rgb = np.concatenate(outs, 0).reshape(images[n].shape)
        mses.append(float(np.mean((rgb - images[n]) ** 2)))
    psnr = float(-10 * np.log10(np.mean(mses)))
    return psnr, ema


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["constant", "linear", "both"])
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()

    ref = load_reference()
    images, poses, K, i_train, i_test, near, far = build_scene()
    rays_all = all_rays(images, poses, K, near, far)

    for mode in (["constant", "linear"] if args.mode == "both"
                 else [args.mode]):
        tag = f"twin-parity-{mode}"
        j_psnr, j_ema = run_jax(mode, args.iters, rays_all, images,
                                i_train, i_test, tag)
        t_psnr, t_ema = run_torch(ref, mode, args.iters, rays_all, images,
                                  i_train, i_test, tag)
        emit({"run": tag, "iter": args.iters, "final": True,
              "psnr_torch": round(t_psnr, 2), "psnr_jax": round(j_psnr, 2),
              "delta_db": round(j_psnr - t_psnr, 2),
              "loss_ema_torch": round(t_ema, 5),
              "loss_ema_jax": round(j_ema, 5)})


if __name__ == "__main__":
    main()
