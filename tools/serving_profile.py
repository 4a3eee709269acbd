#!/usr/bin/env python
"""Decompose the serving-artifact throughput gap (VERDICT r3 item 5).

Round 3 measured the fused whole-image artifact at 0.78x the in-process
eval renderer (BASELINE.md serving section) without saying WHERE the 22%
goes.  Both run the same lax.map-over-chunks program
(eval/images._render_flat_local), so the candidate sinks are:

  a) multi-platform lowering — the default artifact is exported for
     (cpu, tpu); jax.export wraps the program in a platform-index case
     whose TPU branch may compile differently than a native lowering
     -> measured by exporting a TPU-only artifact alongside;
  b) weights-as-constants vs weights-as-arguments — the artifact embeds
     the params as StableHLO constants; the in-process path passes them
     as jit arguments (layout/fusion freedom differs)
     -> measured by the "fused-args" arm: the same fused program
     exported with the param pytrees as call ARGUMENTS, weights staged
     to device once;
  c) host-side costs — padding/staging the [n,11] ray array, the
     exported call's argument checks, D2H of the 6 output maps
     -> measured as wall time minus device-busy time (xplane);
  d) the round-3 runtime's ray ROUND TRIP — render_image computed rays
     on device, pulled them to numpy, and re-uploaded (~2x28 MB at
     800^2).  The runtime now keeps device arrays resident; the
     "fused-native-hostrays" arm re-creates the old behavior to price
     it.

Method: time in-process vs fused-multiplatform vs fused-tpu-only
(value-fetch closed, best of --rounds), then jax.profiler-trace one call
of each arm and aggregate device-op durations (utils/xplane): equal
device totals => the gap is host-side; a fatter op table names the
compiled-in regression.  Appends run="serving-profile" rows to
convergence_runs.jsonl.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_totals(trace_dir):
    from plnerf.utils import xplane

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None, []
    path = max(paths, key=os.path.getmtime)
    top = xplane.top_device_ops(path, k=14)
    planes = xplane.op_durations(path)
    total_ms = 0.0
    for pname, ops in planes.items():
        if "TPU" in pname or "/device" in pname.lower():
            total_ms += sum(ops.values()) / 1e9
    return total_ms, top


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--out", default="convergence_runs.jsonl")
    ap.add_argument("--profile", action="store_true", default=True)
    ap.add_argument("--no-profile", dest="profile", action="store_false")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from plnerf.core.config import ModelConfig, RenderConfig
    from plnerf.core.mlp import init_nerf_params
    from plnerf.eval import images as EI
    from plnerf.serving import export as SE
    from plnerf.serving.runtime import ServingRenderer

    mcfg = ModelConfig()
    rcfg = RenderConfig(n_samples=128, n_importance=64, mode="linear",
                        white_bkgd=True, perturb=True,
                        mlp_dtype="bfloat16")
    pc = init_nerf_params(jax.random.key(0), mcfg)
    pf = init_nerf_params(jax.random.key(1), mcfg)

    H = W = args.size
    n_rays = H * W
    backend = jax.default_backend()

    servers = {}
    for name, plats in (("multiplat", None),          # default (cpu,tpu)
                        ("native", [backend])):       # single-platform
        art = tempfile.mkdtemp(prefix=f"serve_prof_{name}_")
        try:
            SE.export_renderer(pc, pf, mcfg, rcfg, art, chunk=args.chunk,
                               fused_n_rays=n_rays, platforms=plats)
        except Exception as e:
            print(f"[serve-profile] export {name} failed: {e}",
                  file=sys.stderr, flush=True)
            continue
        servers[name] = ServingRenderer.load(art)

    focal = 0.5 * W / np.tan(0.25)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0

    arms = {}
    for name, server in servers.items():
        arms[f"fused-{name}"] = (
            lambda s=server: float(
                s.render_image(c2w, (H, W, focal), K)["rgb_map"].sum()))

    if "native" in servers:
        # hypothesis (d): the round-3 runtime's D2H+H2D ray round trip,
        # re-created by forcing the packed rays through numpy
        from plnerf.core import rays as raysmod
        from plnerf.core import render as rendermod

        def hostrays(s=servers["native"]):
            ro, rd = raysmod.get_rays(H, W, K, jnp.asarray(c2w)[:3, :4])
            packed, _ = rendermod.make_ray_batch(
                ro, rd, 2.0, 6.0, rcfg.use_viewdirs, False, H, W, focal)
            out = s.render_rays(np.asarray(packed))  # force host copy
            return float(out["rgb_map"][:n_rays].sum())

        arms["fused-native-hostrays"] = hostrays

    # hypothesis (b): same fused program exported with the params as
    # call ARGUMENTS (staged to device once) instead of baked constants
    try:
        from plnerf.core import rays as raysmod
        from plnerf.core import render as rendermod
        from plnerf.eval.images import _render_flat_local

        rdim = SE.ray_dim(rcfg)
        fused_total = -(-n_rays // args.chunk) * args.chunk

        def arg_fn(pc_, pf_, rays, seed):
            key = jax.random.PRNGKey(seed)
            return _render_flat_local(pc_, pf_, rays, key, mcfg, rcfg,
                                      args.chunk, keep_hyp=False)

        struct = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
        exp_args = jax.export.export(jax.jit(arg_fn), platforms=[backend])(
            struct(pc), struct(pf),
            jax.ShapeDtypeStruct((fused_total, rdim), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.uint32))
        args_call = jax.jit(exp_args.call)
        pc_dev = jax.device_put(pc)
        pf_dev = jax.device_put(pf)

        def argscall():
            ro, rd = raysmod.get_rays(H, W, K, jnp.asarray(c2w)[:3, :4])
            packed, _ = rendermod.make_ray_batch(
                ro, rd, 2.0, 6.0, rcfg.use_viewdirs, False, H, W, focal)
            pad = fused_total - packed.shape[0]
            if pad:
                packed = jnp.concatenate(
                    [packed, jnp.broadcast_to(packed[-1:], (pad, rdim))], 0)
            out = args_call(pc_dev, pf_dev, packed, jnp.uint32(0))
            return float(np.asarray(out["rgb_map"])[:n_rays].sum())

        arms["fused-args"] = argscall
    except Exception as e:
        print(f"[serve-profile] fused-args export failed: {e}",
              file=sys.stderr, flush=True)

    arms["inprocess"] = lambda: float(np.asarray(
        EI.render_image(pc, pf, c2w, (H, W, focal), K, mcfg, rcfg,
                        jax.random.PRNGKey(3),
                        chunk=args.chunk)["rgb_map"].sum()))

    rows = []
    for name, fn in arms.items():
        fn()  # compile
        fn()  # settle
        best = float("inf")
        for r in range(args.rounds):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = min(best, dt)
            print(f"[serve-profile] {name} round {r}: {dt:.2f} s/img",
                  file=sys.stderr, flush=True)
        row = {"run": "serving-profile", "path": name, "size": H,
               "chunk": args.chunk, "s_per_img": round(best, 3),
               "rays_per_sec": round(n_rays / best, 1)}
        if args.profile:
            td = tempfile.mkdtemp(prefix=f"serve_trace_{name}_")
            with jax.profiler.trace(td):
                fn()
            dev_ms, top = device_totals(td)
            if dev_ms is not None:
                row["device_ms"] = round(dev_ms, 1)
                print(f"[serve-profile] {name} device busy "
                      f"{dev_ms:.0f} ms; top ops:", file=sys.stderr)
                for op, ms in top:
                    print(f"    {ms:9.2f} ms  {op}", file=sys.stderr)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
