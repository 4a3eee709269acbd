"""Does the fused Pallas MLP win at EVAL (forward-only) time?

Training-step verdict (BASELINE.md / kernels/fused_mlp.py): the Pallas
fwd+bwd pair is at in-step parity with XLA's 3-D operand form (146.1 vs
144.7 ms/step), so the kernel ships opt-in.  But inference is a
different trade: there is no backward, and the XLA forward streams
every [N, 256] hidden activation through HBM (~16 transfers across the
8 layers) while the Pallas forward keeps the whole MLP in VMEM and
streams only the embedded inputs and the [N, 4] raws.  If the eval
path's MLP fraction is HBM-bound, the kernel should win here even
though it only ties in training.

Measures full-image 800x800 rendering (the reference's eval geometry,
run_plnerf.py:800-803 chunk=32768) for {linear 128+64, constant 64+128}
x {xla, pallas}, value-fetch-closed (axon relay rule), best of
``--rounds`` rounds each.  Appends JSON rows to convergence_runs.jsonl
with run="eval-pallas".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="convergence_runs.jsonl")
    ap.add_argument("--modes", default="linear,constant")
    ap.add_argument("--chunk", type=int, default=32768)
    args = ap.parse_args()

    import numpy as np
    import jax

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.core.mlp import init_nerf_params
    from plnerf.eval import images as EI

    mcfg = ModelConfig()
    pc = init_nerf_params(jax.random.key(0), mcfg)
    pf = init_nerf_params(jax.random.key(1), mcfg)
    H = W = 800
    focal = 0.5 * W / np.tan(0.25)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0

    recipes = {"linear": (128, 64), "constant": (64, 128)}
    rows = []
    for mode in args.modes.split(","):
        ns, ni = recipes[mode]
        for pallas in (False, True):
            rcfg = RenderConfig(n_samples=ns, n_importance=ni, mode=mode,
                                white_bkgd=True, perturb=True,
                                mlp_dtype="bfloat16",
                                use_pallas_mlp=pallas)

            def render():
                out = EI.render_image(pc, pf, c2w, (H, W, focal), K, mcfg,
                                      rcfg, jax.random.key(3),
                                      chunk=args.chunk)
                return float(np.asarray(out["rgb_map"]).sum())

            render()  # compile + settle
            render()
            best = float("inf")
            for r in range(args.rounds):
                t0 = time.perf_counter()
                render()
                dt = time.perf_counter() - t0
                best = min(best, dt)
                print(f"[probe] {mode} pallas={pallas} round {r}: "
                      f"{dt:.2f} s/img, {H*W/dt:,.0f} rays/s",
                      file=sys.stderr, flush=True)
            row = {"run": "eval-pallas", "mode": mode, "pallas": pallas,
                   "chunk": args.chunk, "s_per_img": round(best, 3),
                   "rays_per_sec": round(H * W / best, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(args.out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
