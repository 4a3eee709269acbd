#!/usr/bin/env python
"""Sample-budget robustness study — the paper's "fewer samples" claim.

PL-NeRF's pitch is that piecewise-LINEAR quadrature is an unbiased
estimator of the volume-rendering integral while piecewise-CONSTANT
left-endpoint quadrature is not, so the linear mode should (a) lose less
image quality when the test-time sample budget shrinks and (b) train
better when the budget is small from the start.  The repo already covers
the paper's other two stability axes on trained models (camera distance:
tools/fixed_dist_study.py; importance-sample placement accuracy:
test_samples_error, BASELINE.md) — this closes the third axis named in
SURVEY.md §4 ("stability of linear mode under changed camera distance /
sample placement").  Reference anchors: the eval harness
run_plnerf.py:284-363 and the N_samples/N_importance recipe knobs
(configs/blender_{linear,constant}.txt:7-20); the reference has no
driver for this sweep — budgets are compared by editing configs.

Budget matching: at scale 1/k the linear model renders 128/k + 64/k
samples/ray and the constant model 64/k + 128/k — equal TOTALS (192/k),
so the comparison is FLOP-fair; only the coarse/fine split follows each
mode's own recipe.

``--what eval``: load the trained multi-object models
(tools/fixed_dist_study.py --scene multiobj → /tmp/fixdist_mobj) and
render the held-out split at k ∈ {1, 2, 4, 8}.  CAVEAT recorded with
the rows: at seed 0 BOTH mobj coarse heads are degraded (dead-coarse
anatomy, BASELINE.md; constant psnr0 ~4, linear billboard psnr0 ~7), so
this arm measures the production pipeline as-trained, importance
guidance included, not an idealized sampler.

``--what train``: train FRESH models per (mode, budget) on the same
scene with the calibrated dead-coarse mitigation (--raw_noise_std 1e0,
BASELINE.md) so both coarse heads stay alive, then eval each model at
its own budget — the self-consistent "train with fewer samples" claim.

Rows append to convergence_runs.jsonl (run=sample-count-{eval,train}).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "convergence_runs.jsonl")


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _load_exp(exp_dir):
    """Rebuild (args, mcfg, rcfg, setup, bundle, state) from a trained
    experiment directory, exactly as the CLI's test task does."""
    from plnerf.cli.datasets import load_dataset
    from plnerf.cli.run_plnerf import (_load_state_for_eval, build_configs)

    with open(os.path.join(exp_dir, "args.json")) as f:
        args = argparse.Namespace(**json.load(f))
    args.no_reload = False
    args.ft_path = None
    mcfg, rcfg, setup = build_configs(args)
    bundle = load_dataset(args)
    state = _load_state_for_eval(args, setup)
    assert int(state.step) > 0, f"no checkpoint restored in {exp_dir}"
    return args, mcfg, rcfg, setup, bundle, state


def eval_at_counts(exp_dir, run_tag, counts, extra=None, per_pair=None):
    """Render the held-out split of a trained experiment at explicit
    (n_samples, n_importance) pairs; emit one row per pair.
    ``per_pair``: optional list of extra-dicts, parallel to counts."""
    from plnerf.eval import images as EI

    args, mcfg, rcfg, setup, bundle, state = _load_exp(exp_dir)
    t0 = time.time()
    for j, (ns, ni) in enumerate(counts):
        rcfg_k = dataclasses.replace(rcfg, n_samples=ns, n_importance=ni)
        mean_metrics, _ = EI.render_images_with_metrics(
            state.params_coarse, state.params_fine, bundle.data,
            bundle.i_test, mcfg, EI.test_render_config(rcfg_k),
            chunk=args.chunk, near=bundle.near, far=bundle.far,
            ndc=bundle.ndc, mcfg_fine=setup.mcfg_fine, verbose=False,
        )
        m = mean_metrics.as_dict()
        rec = {"run": run_tag, "iter": int(state.step), "mode": args.mode,
               "n_samples": ns, "n_importance": ni, "total": ns + ni,
               "psnr": round(float(m["psnr"]), 2),
               "ssim": round(float(m["ssim"]), 4)}
        if "psnr0" in m:
            rec["psnr0"] = round(float(m["psnr0"]), 2)
        if extra:
            rec.update(extra)
        if per_pair:
            rec.update(per_pair[j])
        rec["elapsed_s"] = round(time.time() - t0, 1)
        emit(rec)


def eval_at_scales(exp_dir, run_tag, scales, extra=None):
    """Proportional 1/k reduction of the TRAINED counts, k in scales."""
    with open(os.path.join(exp_dir, "args.json")) as f:
        a = json.load(f)
    counts = [(max(a["N_samples"] // k, 1), max(a["N_importance"] // k, 1))
              for k in scales]
    eval_at_counts(exp_dir, run_tag, counts, extra=extra,
                   per_pair=[{"scale_k": k} for k in scales])


def run_train(ckpt_root, scene_args, mode, ns, ni, iters, seed, n_rand,
              noise, tag, tiny=False):
    """Train one (mode, budget) arm through the real CLI, then eval it at
    its own budget via the standard test task (args.json carries the
    trained counts, so no override is needed)."""
    from plnerf.cli.run_plnerf import main as plnerf_main

    exp = f"sc_{mode}_{ns}_{ni}{tag}"
    t0 = time.time()
    train_args = [
        "--task", "train", "--dataset", "blender", "--no_batching",
        "--use_viewdirs", "--white_bkgd", "--mode", mode,
        "--N_rand", str(n_rand), "--N_samples", str(ns),
        "--N_importance", str(ni), "--precrop_iters", "500",
        "--raw_noise_std", str(noise),
        "--ckpt_dir", ckpt_root, "--expname", exp,
        "--num_iterations", str(iters),
        "--i_weights", str(iters), "--i_print", "1000",
        "--i_img", "10000000", "--i_testset", "10000000",
        "--i_video", "10000000", "--testskip", "1",
        "--mlp_dtype", "bfloat16", "--steps_per_dispatch", "100",
        "--seed", str(seed),
    ] + scene_args
    if tiny:
        train_args += ["--netdepth", "4", "--netwidth", "64",
                       "--netdepth_fine", "4", "--netwidth_fine", "64",
                       "--multires", "6"]
    if mode == "linear":
        train_args += ["--constant_init",
                       "200" if tiny else "1000"]
    plnerf_main(train_args)
    train_s = time.time() - t0

    # data_dir/scene_id/white_bkgd are CLI-side _TEST_OVERRIDES (reference
    # test-task semantics) — they must be repeated here, not inherited
    plnerf_main(["--task", "test", "--ckpt_dir", ckpt_root,
                 "--expname", exp, "--white_bkgd"] + scene_args)
    sid = next(a for i, a in enumerate(scene_args)
               if scene_args[i - 1] == "--scene_id")
    mdir = os.path.join(ckpt_root, exp,
                        f"test_images_{mode}_{ns}_{ni}{sid}")
    vals = {}
    with open(os.path.join(mdir, "metrics.txt")) as f:
        for line in f:
            m = re.match(r"(\w+): ([-\d.einf]+)", line.strip())
            if m:
                try:
                    vals[m.group(1)] = float(m.group(2))
                except ValueError:
                    pass
    rec = {"run": "sample-count-train", "mode": mode, "iter": iters,
           "n_samples": ns, "n_importance": ni, "total": ns + ni,
           "seed": seed, "raw_noise_std": noise, "tiny": tiny,
           "psnr": round(vals.get("psnr", float("nan")), 2),
           "ssim": round(vals.get("ssim", float("nan")), 4),
           "train_s": round(train_s, 1),
           "elapsed_s": round(time.time() - t0, 1)}
    if "psnr0" in vals:
        rec["psnr0"] = round(vals["psnr0"], 2)
    emit(rec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="eval",
                    choices=("eval", "train", "split"))
    ap.add_argument("--splits", default="8:16,16:8,20:4,23:1",
                    help="split mode: explicit n_samples:n_importance "
                         "pairs rendered on each --exps model — the "
                         "guide-counterfactual probe (shrinking the "
                         "importance share at fixed total isolates "
                         "whether the coarse guide helps or hurts)")
    ap.add_argument("--src", default="/tmp/fixdist_mobj",
                    help="eval: root holding fd_mobj_{linear,constant}")
    ap.add_argument("--exps", default=None,
                    help="eval: comma list of explicit experiment dirs "
                         "(overrides the --src/fd_mobj_* convention)")
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--ckpt_root", default="/tmp/sample_count_study")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--budgets", default="96,48",
                    help="train: total samples/ray per arm (recipe-split "
                         "2:1 linear / 1:2 constant)")
    ap.add_argument("--modes", default="linear,constant")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-scale train arms: 64x64 scene, 4x64 net, "
                         "multires 6, N_rand 256 (same downsizing "
                         "precedent as tools/cam_embedding_study.py — "
                         "provisional signal while the TPU relay is down; "
                         "rerun full-scale on TPU)")
    args = ap.parse_args()

    scales = [int(s) for s in args.scales.split(",")]

    if args.what == "split":
        assert args.exps, "--what split requires --exps"
        counts = [tuple(int(x) for x in s.split(":"))
                  for s in args.splits.split(",")]
        for exp_dir in args.exps.split(","):
            eval_at_counts(exp_dir, "sample-count-split", counts,
                           extra={"exp": os.path.basename(exp_dir)})
        return

    if args.what == "eval":
        if args.exps:
            for exp_dir in args.exps.split(","):
                eval_at_scales(exp_dir, "sample-count-eval", scales,
                               extra={"exp": os.path.basename(exp_dir)})
        else:
            for mode in args.modes.split(","):
                exp_dir = os.path.join(args.src, f"fd_mobj_{mode}")
                eval_at_scales(exp_dir, "sample-count-eval", scales)
        return

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixed_dist_study import build_multiobj_scene

    if args.tiny:
        data_dir, scene_id = build_multiobj_scene(
            n_train=20, n_test=3, H=64, W=64, name="fixdist_mobj_64")
        args.n_rand = min(args.n_rand, 256)
    else:
        data_dir, scene_id = build_multiobj_scene()
    scene_args = ["--data_dir", data_dir, "--scene_id", scene_id]
    for total in (int(b) for b in args.budgets.split(",")):
        for mode in args.modes.split(","):
            third = total // 3
            ns, ni = (2 * third, third) if mode == "linear" \
                else (third, 2 * third)
            tag = f"_s{args.seed}" + ("_tiny" if args.tiny else "")
            if args.noise != 1.0:
                tag += f"_n{args.noise:g}"
            run_train(args.ckpt_root, scene_args, mode, ns, ni,
                      args.iters, args.seed, args.n_rand, args.noise,
                      tag=tag, tiny=args.tiny)


if __name__ == "__main__":
    main()
