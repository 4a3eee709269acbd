#!/usr/bin/env python
"""Export pretrained LPIPS(alex) weights to the torch-free ``.npz`` layout
consumed by ``plnerf.eval.lpips.LPIPS.from_npz``.

Run this ON A NETWORKED MACHINE (the training/eval environment has zero
egress, so the pretrained weights cannot be downloaded there), then copy
the output to ``<repo>/weights/lpips_alex.npz`` or point
``--lpips_weights`` / ``$PLNERF_LPIPS_WEIGHTS`` at it.

Two source modes, tried in order:
1. the ``lpips`` pip package (reference dependency, run_plnerf.py:22):
   trunk convs from ``lpips.LPIPS(net='alex').net.slice*``, calibrated
   heads from ``.lins[i].model[1].weight``;
2. plain torchvision AlexNet (trunk only) + uniform heads — structurally
   valid but NOT the calibrated LPIPS metric; refused unless
   ``--allow-uncalibrated``.

Output keys (see plnerf/eval/lpips.py): ``conv{0..4}_w`` [H, W, I, O],
``conv{0..4}_b`` [O], ``lin{0..4}_w`` [C, 1].

Usage:
    python tools/export_lpips_weights.py weights/lpips_alex.npz
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

_CHANNELS = [64, 192, 384, 256, 256]
_CONV_IDX = [0, 3, 6, 8, 10]  # conv positions inside torchvision features


def _to_np(t):
    return t.detach().cpu().numpy().astype(np.float32)


def export_from_lpips_package() -> dict:
    import lpips  # pip install lpips

    model = lpips.LPIPS(net="alex", spatial=False)
    out = {}
    # trunk: slices are nn.Sequentials indexed by GLOBAL feature position
    convs = []
    for s in range(1, 6):
        sl = getattr(model.net, f"slice{s}")
        for m in sl:
            if m.__class__.__name__ == "Conv2d":
                convs.append(m)
    assert len(convs) == 5, len(convs)
    for i, m in enumerate(convs):
        out[f"conv{i}_w"] = _to_np(m.weight).transpose(2, 3, 1, 0)  # OIHW->HWIO
        out[f"conv{i}_b"] = _to_np(m.bias)
    for i, lin in enumerate(model.lins):
        w = _to_np(lin.model[1].weight).reshape(1, _CHANNELS[i])  # [1,C,1,1]
        out[f"lin{i}_w"] = w.T                                    # [C, 1]
    return out


def export_from_torchvision() -> dict:
    from torchvision.models import alexnet

    try:
        from torchvision.models import AlexNet_Weights

        net = alexnet(weights=AlexNet_Weights.IMAGENET1K_V1)
    except ImportError:
        net = alexnet(pretrained=True)
    out = {}
    for i, ci in enumerate(_CONV_IDX):
        m = net.features[ci]
        out[f"conv{i}_w"] = _to_np(m.weight).transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = _to_np(m.bias)
    for i, c in enumerate(_CHANNELS):
        out[f"lin{i}_w"] = np.full((c, 1), 1.0 / c, np.float32)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output .npz path (e.g. weights/lpips_alex.npz)")
    ap.add_argument("--allow-uncalibrated", action="store_true",
                    help="fall back to torchvision trunk + uniform heads "
                         "when the lpips package is unavailable")
    args = ap.parse_args()

    try:
        params = export_from_lpips_package()
        src = "lpips package (calibrated heads)"
    except ImportError:
        if not args.allow_uncalibrated:
            print("ERROR: the `lpips` pip package is required for the "
                  "calibrated metric (pip install lpips). Pass "
                  "--allow-uncalibrated to export a torchvision-only trunk "
                  "with uniform heads (NOT the published metric).",
                  file=sys.stderr)
            return 1
        params = export_from_torchvision()
        src = "torchvision trunk + UNIFORM heads (uncalibrated!)"

    import os

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **params)
    total = sum(v.size for v in params.values())
    print(f"wrote {args.out}: {len(params)} tensors, {total:,} params, "
          f"source = {src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
