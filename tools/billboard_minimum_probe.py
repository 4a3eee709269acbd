"""Why does noise-resume rescue a dead CONSTANT coarse but not a LINEAR one?

tools/dead_coarse_rescue.py measured: resuming the dead seed-0 DTU runs
at 8k with ``--raw_noise_std 1.0``, the constant coarse revives within
1k iters (sigma0_pos_frac 0.28-0.44, coarse psnr 5.9 -> 21-25) while the
linear coarse stays at pos_frac exactly 0.0 for 4k noisy iters with eval
unchanged.  The obvious hypothesis — the billboarded linear head sits so
deep below zero that unit Gaussian noise can't reach the relu threshold
(reference noise semantics: raw sigma + N(0,1) pre-relu,
run_nerf.py:303-306) — is FALSIFIED by this probe: both dead heads hover
at raw sigma ~ -0.1, so noise flips ~45% of points positive on every
step and the head has abundant live gradient under noise.

The correct mechanism is therefore about the DIRECTION of that gradient:
  - constant: the dead coarse renders a constant background (loss
    pinned ~0.25), far from any optimum — restored gradient points UP
    and the head climbs out.
  - linear: the billboard already fits the images through the forced
    far-boundary interval (coarse psnr0 ~16), so interior density only
    ADDS wrong color — the restored gradient actively pushes sigma back
    below zero.  The billboard is a genuine local minimum, not a
    zero-gradient plateau; pos_frac pinned at 0.000 across 4k noisy
    iters (vs random drift) is the equilibrium signature.

Emits a ``billboard-minimum-probe`` row to convergence_runs.jsonl with
the measured sigma statistics of both dead 8k heads.

Usage: python tools/billboard_minimum_probe.py [--src /tmp/dtu_conv]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/dtu_conv")
    ap.add_argument("--step", type=int, default=8000)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "convergence_runs.jsonl"))
    args = ap.parse_args()

    import numpy as np
    import flax.serialization as fser
    import jax
    import jax.numpy as jnp
    from scipy.special import ndtr

    from plnerf.core.config import ModelConfig
    from plnerf.core.mlp import init_nerf_params, query_network

    cfg = ModelConfig()  # the DTU study MLP (8x256, multires 10/4)
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (4096, 8, 3)).astype(np.float32))
    dirs = rng.normal(size=(4096, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    tmpl = init_nerf_params(jax.random.PRNGKey(0), cfg)

    per_mode = {}
    for mode, exp in (("linear", "dtu_linear"), ("constant", "dtu_constant")):
        path = os.path.join(args.src, exp, f"{args.step:06d}.ckpt")
        raw = fser.msgpack_restore(open(path, "rb").read())
        pc = fser.from_state_dict(tmpl, raw["params_coarse"])
        sig = np.asarray(query_network(pc, pts, dirs, cfg)[..., 3],
                         np.float64).ravel()
        p_flip = ndtr(sig)  # P(sigma + N(0,1) > 0) per point
        per_mode[mode] = {
            "sigma_mean": round(float(sig.mean()), 4),
            "sigma_median": round(float(np.median(sig)), 4),
            "sigma_max": round(float(sig.max()), 4),
            "pos_frac": round(float((sig > 0).mean()), 4),
            "p_noise_flip_mean": round(float(p_flip.mean()), 4),
        }
        print(mode, per_mode[mode], flush=True)

    rec = {"run": "billboard-minimum-probe", "final": True,
           "step": args.step, **per_mode}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
