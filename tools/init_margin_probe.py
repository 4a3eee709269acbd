"""Why does seed 0 (and not seed 1) fall into the dead-coarse trap?

Probes the INIT-time raw density statistics of the default NVS MLP
(ModelConfig defaults = the DTU/fixture study configuration) across
seeds, using the same key derivation as the CLI
(init_state: PRNGKey(seed) -> split -> kc for the coarse net).

Finding (recorded in BASELINE.md anatomy): at init the coarse density
head is nearly CONSTANT-SIGN over space — the per-point std of raw
sigma is ~0.008 while the head's bias draw shifts the whole field by
+-0.03..0.07, so each seed starts either all-positive (healthy) or
all-negative (inside the dead-relu zone).  Death is then a race
between the billboard's color gradient drifting the trunk (which can
passively push sigma positive — the head's own weights get no
gradient, but sigma = W h(x) + b moves as h moves) and the image loss
entrenching the billboard.  The probe emits the init margin
(max raw sigma) per seed so the collapse-sweep outcome
(tools/collapse_seed_sweep.py) can be correlated against it.

Usage: python tools/init_margin_probe.py [--seeds 8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--sigma_bias_init", type=float, default=0.0,
                    help="probe the --sigma_bias_init mitigation: the "
                         "margin shift is exactly the bias offset")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "convergence_runs.jsonl"))
    args = ap.parse_args()

    import numpy as np
    import jax

    from plnerf.core.config import ModelConfig
    from plnerf.core.mlp import init_nerf_params, query_network

    # 8x256, multires 10/4, viewdirs: the study MLP
    cfg = ModelConfig(sigma_bias_init=args.sigma_bias_init)
    rng = np.random.default_rng(7)
    pts = jax.numpy.asarray(
        rng.uniform(-1.5, 1.5, (4096, 8, 3)).astype(np.float32))
    dirs = rng.normal(size=(4096, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jax.numpy.asarray(dirs)

    per_seed = {}
    for seed in range(args.seeds):
        kc, _ = jax.random.split(jax.random.PRNGKey(seed))
        p = init_nerf_params(kc, cfg)
        sig = np.asarray(query_network(p, pts, dirs, cfg)[..., 3],
                         np.float32)
        per_seed[seed] = {
            "init_pos_frac": round(float((sig > 0).mean()), 4),
            "init_mean": round(float(sig.mean()), 4),
            "init_std": round(float(sig.std()), 4),
            "init_margin": round(float(sig.max()), 4),
        }
        print(seed, per_seed[seed], flush=True)

    rec = {"run": "init-margin-probe", "final": True,
           "sigma_bias_init": args.sigma_bias_init, "per_seed": per_seed}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
