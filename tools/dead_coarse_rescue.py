"""Can a dead coarse density head be rescued by RESUMING with noise?

The dead-coarse advisory (cli/run_plnerf._dead_coarse_advisory) cites
two verified mitigations — ``--raw_noise_std 1e0`` and re-seeding —
but both were verified only FROM SCRATCH (BASELINE.md anatomy).  For a
user 100k iters into a run, restarting is expensive; this study asks
whether resuming the dead checkpoint with noise enabled revives the
head mid-training (reference semantics: noise perturbs raw sigma
pre-relu, run_nerf.py:303-306, so a dead all-negative head regains
stochastic positive samples and therefore gradient).

Protocol: for each mode, copy the dead 8k-iter seed-0 DTU checkpoint
(tools/dtu_convergence.py runs) into rescue/control exp dirs, resume
both to ``--to_iter`` (rescue adds ``--raw_noise_std 1.0``, control
changes nothing), then eval held-out.  Appends JSONL records to
convergence_runs.jsonl.

Usage: python tools/dead_coarse_rescue.py [--to_iter 12000]
       [--src /tmp/dtu_conv] [--work /tmp/rescue_study]
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tools", ".cache", "dtu_mobj")

# (mode, source expname, N_samples, N_importance) — the dead seed-0 runs
SOURCES = {
    "linear": ("dtu_linear", 128, 64),
    "constant": ("dtu_constant", 64, 128),
}


def read_metrics_since(exp_dir, step):
    rows = []
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("step", 0) >= step:
                rows.append(r)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--to_iter", type=int, default=12000)
    ap.add_argument("--src", default="/tmp/dtu_conv")
    ap.add_argument("--work", default="/tmp/rescue_study")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "convergence_runs.jsonl"))
    args = ap.parse_args()

    from plnerf.cli.run_plnerf import main as plnerf_main

    for mode, (src_exp, ns, ni) in SOURCES.items():
        src_dir = os.path.join(args.src, src_exp)
        ckpts = sorted(p for p in os.listdir(src_dir) if p.endswith(".ckpt"))
        base_ckpt = ckpts[0]  # the clean 8000-iter save, not advisory debris
        base_step = int(base_ckpt.split(".")[0])
        for arm, extra in (("rescue", ["--raw_noise_std", "1.0"]),
                           ("control", [])):
            exp = f"{mode}_{arm}"
            exp_dir = os.path.join(args.work, exp)
            if os.path.exists(exp_dir):
                shutil.rmtree(exp_dir)
            os.makedirs(exp_dir)
            for name in (base_ckpt, "split.json"):
                shutil.copy(os.path.join(src_dir, name), exp_dir)
            plnerf_main([
                "--task", "train", "--mode", mode, "--seed", "0",
                "--dataset", "DTU", "--dtu_scene_id", "5",
                "--num_train", "42", "--data_dir", DATA,
                "--ckpt_dir", args.work, "--expname", exp,
                "--no_batching", "--use_viewdirs", "--white_bkgd",
                "--N_rand", "1024", "--N_samples", str(ns),
                "--N_importance", str(ni), "--mlp_dtype", "bfloat16",
                "--precrop_iters", "500", "--lrate", "5e-4",
                "--lrate_decay", "250", "--constant_init", "1000",
                "--num_iterations", str(args.to_iter),
                "--i_weights", str(args.to_iter), "--i_print", "500",
                "--i_img", "999999", "--i_testset", "999999",
                "--i_video", "999999",
            ] + extra)
            plnerf_main([
                "--task", "test", "--ckpt_dir", args.work,
                "--expname", exp, "--data_dir", DATA,
                "--dataset", "DTU",
            ])
            rows = read_metrics_since(exp_dir, base_step)
            train_rows = [r for r in rows if "train/sigma0_pos_frac" in r]
            ev = {}
            with open(os.path.join(
                    exp_dir, f"test_images_{mode}_{ns}_{ni}lego",
                    "metrics.txt")) as f:
                for mline in f:
                    k, _, v = mline.partition(":")
                    try:
                        ev[k.strip()] = float(v)
                    except ValueError:
                        pass
            pos_curve = [round(r["train/sigma0_pos_frac"], 4)
                         for r in train_rows]
            rec = {
                "run": f"rescue-{mode}-{arm}", "final": True,
                "resumed_from": base_step, "iter": args.to_iter,
                "sigma0_pos_frac_curve": pos_curve,
                "psnr0_last": round(train_rows[-1]["train/psnr0"], 2),
                "psnr": round(ev["psnr"], 2),
                "ssim": round(ev["ssim"], 4),
                "psnr0": round(ev["psnr0"], 2),
            }
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
