"""Seed sweep of the dead-coarse collapse (BASELINE.md anatomy).

Trains the DTU multi-object scene (tools/dtu_convergence.py layout)
for a short horizon across seeds x variants and reads the
``sigma0_pos_frac`` metric (fraction of positive raw coarse densities)
from each run's metrics.jsonl to measure:

* P(coarse density death) per variant over seeds,
* whether the reference's constant_init warmup window (run_plnerf.py
  :709-711 — linear recipes train in CONSTANT mode for the first 1000
  iters) is what kills the linear coarse (variant linear-ci0 removes
  the window, nothing else).

All runs share one process so jit caches are reused across seeds
(same shapes).  Usage: python tools/collapse_seed_sweep.py
[--seeds 8] [--iters 3000].  Appends one JSONL record per run plus an
aggregate to convergence_runs.jsonl.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tools", ".cache", "dtu_mobj")

VARIANTS = {
    # (mode, constant_init)
    "linear": ("linear", 1000),    # the shipped recipe (warmup window on)
    "linear-ci0": ("linear", 0),   # causal test: no constant warmup
    "constant": ("constant", 1000),  # no-op warmup (already constant)
}


def read_last_metrics(exp_dir):
    path = os.path.join(exp_dir, "metrics.jsonl")
    last = None
    with open(path) as f:
        for line in f:
            last = json.loads(line)
    return last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--seed_list", type=str, default=None,
                    help="comma list of seeds (overrides --seeds range)")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--variants", type=str, default=None,
                    help="comma subset of variants (default: all)")
    ap.add_argument("--sigma_bias_init", type=float, default=0.0,
                    help="density-head bias init offset under test; "
                         "records get a -sb<val> run suffix when nonzero")
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--budget", type=str, default=None,
                    help="Ns,Ni override (reduced-compute CPU mode: the "
                         "full 8x256 net is what carries the init trap, "
                         "but constant-mode death is gradient-structural "
                         "and shows at any ray/sample count; records get "
                         "a -b<total> suffix)")
    ap.add_argument("--ckpt_dir", default="/tmp/collapse_sweep")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "convergence_runs.jsonl"))
    args = ap.parse_args()

    if not os.path.exists(DATA):
        from tools.dtu_convergence import build_dtu_mobj_scene
        build_dtu_mobj_scene()

    from plnerf.cli.run_plnerf import main as plnerf_main

    variants = {k: v for k, v in VARIANTS.items()
                if args.variants is None or k in args.variants.split(",")}
    seeds = ([int(s) for s in args.seed_list.split(",")]
             if args.seed_list else list(range(args.seeds)))
    sb = args.sigma_bias_init
    suffix = f"-sb{sb:g}" if sb != 0.0 else ""
    if args.budget:
        bns, bni = (int(x) for x in args.budget.split(","))
        suffix += f"-b{bns + bni}"

    records = []
    for variant, (mode, ci) in variants.items():
        ns, ni = (128, 64) if mode == "linear" else (64, 128)
        if args.budget:
            ns, ni = bns, bni
        for seed in seeds:
            exp = f"sw_{variant}{suffix}_{seed}"
            t0 = time.time()
            plnerf_main([
                "--task", "train", "--mode", mode,
                "--sigma_bias_init", str(sb),
                "--constant_init", str(ci), "--seed", str(seed),
                "--dataset", "DTU", "--dtu_scene_id", "5",
                "--num_train", "42", "--data_dir", DATA,
                "--ckpt_dir", args.ckpt_dir, "--expname", exp,
                "--no_batching", "--use_viewdirs", "--white_bkgd",
                "--N_rand", str(args.n_rand), "--N_samples", str(ns),
                "--N_importance", str(ni), "--mlp_dtype", "bfloat16",
                "--precrop_iters", "500", "--lrate", "5e-4",
                "--lrate_decay", "250",
                "--num_iterations", str(args.iters),
                "--i_weights", "999999", "--i_print", "500",
                "--i_img", "999999", "--i_testset", "999999",
                "--i_video", "999999", "--no_reload",
            ])
            m = read_last_metrics(os.path.join(args.ckpt_dir, exp))
            rec = {
                "run": f"collapse-sweep-{variant}{suffix}", "seed": seed,
                "iter": args.iters,
                "sigma0_pos_frac": round(m["train/sigma0_pos_frac"], 4),
                "psnr0": round(m["train/psnr0"], 2),
                "psnr": round(m["train/psnr"], 2),
                "train_s": round(time.time() - t0, 1),
            }
            records.append(rec)
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")

    agg = {}
    for variant in variants:
        rs = [r for r in records
              if r["run"] == f"collapse-sweep-{variant}{suffix}"]
        dead = [r["seed"] for r in rs if r["sigma0_pos_frac"] < 1e-3]
        agg[variant + suffix] = {"n": len(rs), "dead_seeds": dead}
    line = json.dumps({"run": "collapse-sweep-aggregate", "final": True,
                       **agg})
    print(line, flush=True)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
