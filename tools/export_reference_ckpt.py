#!/usr/bin/env python
"""Export a plnerf ``.ckpt`` to the reference's ``.tar`` checkpoint format.

Closes the interop loop in the reverse direction of
``plnerf/checkpoint/convert_torch.load_reference_checkpoint``: a model
trained by this framework becomes loadable by the upstream PyTorch
scripts' resume path (reference run_plnerf.py:453-471 — keys
``global_step`` / ``network_fn_state_dict`` / ``network_fine_state_dict``
/ ``optimizer_state_dict``), e.g. for upstream-side evaluation or
fine-tuning.

Usage:
    python tools/export_reference_ckpt.py --ckpt logs/exp/050000.ckpt \
        --out exp_050000.tar [--lr 5e-4] [--fresh_opt]

Reads the checkpoint WITHOUT needing the training args: the msgpack
state-dict of the flax TrainState is keyed by field name, so the params
and the fine Adam moments are recovered structurally.  Real Adam moments
are exported for the viewdirs topology (reference parameter order —
see convert_torch._torch_param_arrays); ``--fresh_opt`` writes a
pre-first-step Adam state instead.  Depth-script extras
(depth scale/shift tensors) are exported when present.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _digitlist(d):
    """flax serializes lists/tuples as dicts keyed '0','1',...: normalize
    back to lists, recursively."""
    if isinstance(d, dict):
        if d and all(k.isdigit() for k in d):
            return [_digitlist(d[str(i)]) for i in range(len(d))]
        return {k: _digitlist(v) for k, v in d.items()}
    return d


def _find_adam(node):
    """Locate the ScaleByAdamState subtree ({count, mu, nu}) in a raw
    opt-state state-dict."""
    if isinstance(node, dict):
        if {"count", "mu", "nu"} <= set(node.keys()):
            return node
        for v in node.values():
            r = _find_adam(v)
            if r is not None:
                return r
    if isinstance(node, list):
        for v in node:
            r = _find_adam(v)
            if r is not None:
                return r
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="path to a plnerf .ckpt")
    ap.add_argument("--out", required=True, help="output .tar path")
    ap.add_argument("--lr", type=float, default=5e-4,
                    help="lr recorded in the exported Adam param_group "
                         "(the reference overwrites it every step)")
    ap.add_argument("--fresh_opt", action="store_true",
                    help="write a pre-first-step Adam state instead of the "
                         "checkpoint's real moments")
    args = ap.parse_args(argv)

    import flax.serialization as fser

    from plnerf.checkpoint.convert_torch import save_reference_checkpoint

    with open(args.ckpt, "rb") as f:
        raw = fser.msgpack_restore(f.read())

    step = int(np.asarray(raw["step"]))
    params_c = _digitlist(raw["params_coarse"])
    params_f = raw.get("params_fine")
    params_f = _digitlist(params_f) if params_f is not None else None

    # joint (run_vanilla / run_depth) checkpoints have no separate coarse
    # optimizer and their fine-Adam moments span (coarse, fine); the
    # exported torch Adam must cover coarse-then-fine parameters to match
    # run_nerf_vanilla's grad_vars order (reference :365-380)
    joint = raw.get("opt_coarse") is None and params_f is not None

    fine_adam = None
    if not args.fresh_opt and params_f is not None:
        adam = _find_adam(_digitlist(raw.get("opt_fine")))
        if adam is not None:
            fine_adam = (adam["mu"], adam["nu"],
                         int(np.asarray(adam["count"])))

    kind = save_reference_checkpoint(args.out, step, params_c, params_f,
                                     fine_adam=fine_adam, lr=args.lr,
                                     joint=joint)

    extras = {k: raw[k] for k in ("depth_scales", "depth_shifts")
              if raw.get(k) is not None}
    if extras:
        # depth-script checkpoints carry per-image scale/shift tensors
        # (reference run_nerf_sample_based_depth.py:1180-1181)
        import torch

        ckpt = torch.load(args.out, map_location="cpu", weights_only=False)
        for k in extras:
            ckpt[k] = torch.from_numpy(np.asarray(extras[k]))
        torch.save(ckpt, args.out)

    print(f"wrote {args.out}: step {step}, fine={'yes' if params_f is not None else 'no'}, "
          f"{kind}" + (f", extras={sorted(extras)}" if extras else ""))


if __name__ == "__main__":
    main()
