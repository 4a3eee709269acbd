"""Does acting ON the dead-coarse advisory (iter ~3k) save the run?

tools/dead_coarse_rescue.py showed that resuming a dead constant run at
8k with ``--raw_noise_std 1e0`` revives the COARSE head (the reference's
noise semantics, run_nerf.py:303-306: noise perturbs raw sigma pre-relu,
restoring gradient on the zero-gradient plateau) but does NOT repair the
fine level by 12-20k — the fine net has already entrenched wrong
geometry on quasi-uniform samples.  The advisory
(cli/run_plnerf._dead_coarse_advisory) fires at iter 3000; this study
asks the actionable question: if the user acts THEN, is the run saved?

Protocol (constant mode, the mode where death costs everything):
  1. base: seed-0 constant DTU recipe to 3000 (checkpoint at the
     advisory firing point).
  2. early-rescue: resume 3000 -> 12000 with --raw_noise_std 1.0;
     early-control: resume unchanged.
  3. healthy anchor: seed-1 constant (escapes the trap, collapse sweep)
     from scratch to 12000.
All arms eval on the 7 held-out views; JSONL rows appended to
convergence_runs.jsonl (early-rescue-constant-{rescue,control},
healthy-seed1-constant).

Usage: python tools/early_rescue.py [--branch_iter 3000] [--to_iter 12000]
"""
import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tools", ".cache", "dtu_mobj")
NS, NI = 64, 128  # the constant DTU recipe (tools/dtu_convergence.py)


def common_args(work, exp, seed):
    return [
        "--mode", "constant", "--seed", str(seed),
        "--dataset", "DTU", "--dtu_scene_id", "5",
        "--num_train", "42", "--data_dir", DATA,
        "--ckpt_dir", work, "--expname", exp,
        "--no_batching", "--use_viewdirs", "--white_bkgd",
        "--N_rand", "1024", "--N_samples", str(NS),
        "--N_importance", str(NI), "--mlp_dtype", "bfloat16",
        "--precrop_iters", "500", "--lrate", "5e-4",
        "--lrate_decay", "250", "--constant_init", "1000",
    ]


def train(plnerf_main, work, exp, seed, iters, extra=()):
    plnerf_main(common_args(work, exp, seed) + [
        "--task", "train",
        "--num_iterations", str(iters),
        "--i_weights", str(iters), "--i_print", "500",
        "--i_img", "999999", "--i_testset", "999999",
        "--i_video", "999999",
    ] + list(extra))


def eval_and_record(plnerf_main, work, exp, run, since, out, extra=None):
    plnerf_main(["--task", "test", "--ckpt_dir", work, "--expname", exp,
                 "--data_dir", DATA, "--dataset", "DTU"])
    ev = {}
    with open(os.path.join(work, exp, f"test_images_constant_{NS}_{NI}lego",
                           "metrics.txt")) as f:
        for line in f:
            k, _, v = line.partition(":")
            try:
                ev[k.strip()] = float(v)
            except ValueError:
                pass
    rows = []
    with open(os.path.join(work, exp, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("step", 0) >= since and "train/sigma0_pos_frac" in r:
                rows.append(r)
    rec = {
        "run": run, "final": True,
        "sigma0_pos_frac_curve": [round(r["train/sigma0_pos_frac"], 4)
                                  for r in rows[::2]],
        "psnr0_last": round(rows[-1]["train/psnr0"], 2),
        "psnr": round(ev["psnr"], 2), "ssim": round(ev["ssim"], 4),
        "psnr0": round(ev["psnr0"], 2),
    }
    if extra:
        rec.update(extra)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(out, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--branch_iter", type=int, default=3000)
    ap.add_argument("--to_iter", type=int, default=12000)
    ap.add_argument("--work", default="/tmp/early_rescue")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "convergence_runs.jsonl"))
    args = ap.parse_args()

    from plnerf.cli.run_plnerf import main as plnerf_main

    # 1. Base to the advisory firing point.
    base_dir = os.path.join(args.work, "base")
    base_ckpt = f"{args.branch_iter:06d}.ckpt"
    if not os.path.exists(os.path.join(base_dir, base_ckpt)):
        t0 = time.time()
        train(plnerf_main, args.work, "base", 0, args.branch_iter)
        print(f"[base] {time.time() - t0:.0f}s", flush=True)

    # 2. Branch arms.
    for arm, extra in (("rescue", ["--raw_noise_std", "1.0"]),
                       ("control", [])):
        exp = f"early_{arm}"
        exp_dir = os.path.join(args.work, exp)
        if os.path.exists(exp_dir):
            shutil.rmtree(exp_dir)
        os.makedirs(exp_dir)
        for name in (base_ckpt, "split.json"):
            shutil.copy(os.path.join(base_dir, name), exp_dir)
        train(plnerf_main, args.work, exp, 0, args.to_iter, extra)
        eval_and_record(
            plnerf_main, args.work, exp, f"early-rescue-constant-{arm}",
            args.branch_iter, args.out,
            {"resumed_from": args.branch_iter, "iter": args.to_iter})

    # 3. Healthy anchor: seed 1 from scratch.
    train(plnerf_main, args.work, "healthy_s1", 1, args.to_iter)
    eval_and_record(plnerf_main, args.work, "healthy_s1",
                    "healthy-seed1-constant", 0, args.out,
                    {"iter": args.to_iter, "seed": 1})


if __name__ == "__main__":
    main()
