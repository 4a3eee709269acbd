"""Portable serving artifacts for trained models (TPU-native addition).

The reference has no deployment story: its eval loops live inside the
training scripts (run_plnerf.py:284-363 ``render_images_with_metrics``)
and serving a trained model means carrying the whole torch codebase.
Here a trained checkpoint is exported ONCE into a self-contained
artifact directory:

* ``module.bin`` — the hierarchical render function for one ray chunk,
  lowered to StableHLO via ``jax.export`` with the model weights (and
  the occupancy grid, when the model was trained with one) embedded as
  constants.  The artifact carries no Python model code — any process
  with jax installed can load and run it, on every platform it was
  lowered for (default: cpu + tpu).
* ``module_fused.bin`` (optional, ``fused_n_rays`` / ``--serve_image``)
  — a whole-batch variant running the eval frontend's exact
  lax.map-over-chunks program: one device dispatch per fixed-size
  image instead of n_chunks.
* ``manifest.json`` — chunk size, ray layout, output keys and the
  provenance (mode/sample counts/checkpoint path/ray-geometry hints)
  needed to drive it.

Serving semantics follow ``--task test`` exactly: ``raw_noise_std=0``
with the reference's perturb-at-test quirk preserved by default (the
artifact takes an RNG seed input), and the same eval dials apply at
export time — ``--eval_det`` bakes deterministic placement (the
measured free win, BASELINE.md), ``--eval_N_samples``/``--eval_N_importance``
bake a different serving sample budget.

``plnerf.serving.runtime.ServingRenderer`` is the matching loader: it
pads arbitrary ray counts to the baked chunk grid and exposes
ray-level and image-level rendering.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import render
from ..core.config import ModelConfig, RenderConfig

MODULE_FILE = "module.bin"
MODULE_FUSED_FILE = "module_fused.bin"
MANIFEST_FILE = "manifest.json"
WEIGHTS_FILE = "weights.npz"
FORMAT_VERSION = 1


def ray_dim(rcfg: RenderConfig) -> int:
    return 11 if rcfg.use_viewdirs else 8


def build_chunk_fn(params_c, params_f, mcfg: ModelConfig,
                   rcfg: RenderConfig,
                   mcfg_fine: Optional[ModelConfig] = None,
                   occ_grid=None):
    """One-chunk render closure: (rays [chunk, rdim], seed u32) -> dict.

    Weights/grid are closed over, so ``jax.export`` embeds them as
    constants — the serialized module IS the model.
    """
    keys = list(_OUTPUT_KEYS)
    if params_f is None:
        keys = [k for k in keys if not k.endswith("0")]

    def fn(rays, seed):
        key = jax.random.PRNGKey(seed)
        ret = render.render_rays(params_c, params_f, rays, key, mcfg,
                                 rcfg, mcfg_fine=mcfg_fine,
                                 occ_grid=occ_grid)
        return {k: ret[k] for k in keys if k in ret}

    return fn


# per-ray outputs a serving client can consume (subset of render_rays'
# returns; *0 = coarse-network maps, present with a fine network only)
_OUTPUT_KEYS = ("rgb_map", "disp_map", "acc_map", "depth_map",
                "rgb0", "depth0")


def build_fused_fn(params_c, params_f, mcfg: ModelConfig,
                   rcfg: RenderConfig, chunk: int,
                   mcfg_fine: Optional[ModelConfig] = None,
                   occ_grid=None):
    """Whole-batch render closure: (rays [n_total, rdim], seed u32) with
    ``n_total`` a chunk multiple — the eval frontend's exact program
    (eval/images._render_flat_local: one device dispatch, lax.map over
    chunks, per-chunk keys from jax.random.split).  Use when dispatch
    latency matters (an 800x800 image is ONE call instead of 20)."""
    from ..eval.images import _render_flat_local

    def fn(rays, seed):
        key = jax.random.PRNGKey(seed)
        return _render_flat_local(params_c, params_f, rays, key, mcfg,
                                  rcfg, chunk, keep_hyp=False,
                                  mcfg_fine=mcfg_fine, occ_grid=occ_grid)

    return fn


def _export_one(fn, args, platforms):
    tried = [tuple(platforms)] if platforms else [("cpu", "tpu"), None]
    err = None
    for plats in tried:
        try:
            return jax.export.export(
                jax.jit(fn), platforms=list(plats) if plats else None
            )(*args)
        except Exception as e:  # e.g. no TPU lowering rule in this env
            err = e
    raise RuntimeError(f"jax.export failed for {tried}: {err}")


def export_renderer(params_c, params_f, mcfg: ModelConfig,
                    rcfg: RenderConfig, out_dir: str, chunk: int = 32768,
                    mcfg_fine: Optional[ModelConfig] = None,
                    occ_grid=None,
                    platforms: Optional[Sequence[str]] = None,
                    fused_n_rays: Optional[int] = None,
                    weights_mode: str = "baked",
                    provenance: Optional[dict] = None) -> dict:
    """Serialize the render function + weights into ``out_dir``.

    ``platforms``: lowering targets (default tries ``("cpu", "tpu")``
    and falls back to the current backend alone if a cross-platform
    lowering rule is unavailable).  ``fused_n_rays``: additionally
    export a single-dispatch whole-batch module for exactly this many
    rays (rounded up to a chunk multiple — pass H*W to serve fixed-size
    images in one call).

    ``weights_mode``: ``"baked"`` embeds the weights as StableHLO
    constants (one self-contained module.bin); ``"args"`` exports the
    module with the weight leaves as call ARGUMENTS and writes them to
    ``weights.npz`` in flattened pytree order — the runtime stages them
    to device once at load.  Throughput-neutral vs baked (BASELINE.md
    round-4 serving decomposition, `serving-bench` parity rows), but
    the module becomes weight-free: retrained weights drop into the
    sidecar without re-lowering/re-shipping the module.  Still no model
    code or checkpoint loader at serve time: the npz is a plain ordered
    array list, the pytree structure lives inside the traced module.
    The occ grid (when present) stays baked in both modes.  Returns the
    manifest dict.
    """
    if weights_mode not in ("baked", "args"):
        raise ValueError(f"weights_mode must be baked|args: {weights_mode}")
    rdim = ray_dim(rcfg)
    os.makedirs(out_dir, exist_ok=True)

    leaves, treedef = jax.tree.flatten((params_c, params_f))
    if weights_mode == "args":
        import numpy as np

        np.savez(os.path.join(out_dir, WEIGHTS_FILE),
                 *[np.asarray(l) for l in leaves])

        def with_weights(build, *bargs):
            def fn(wleaves, rays, seed):
                pc, pf = jax.tree.unflatten(treedef, list(wleaves))
                return build(pc, pf, *bargs)(rays, seed)
            return fn

        wstruct = tuple(jax.ShapeDtypeStruct(l.shape, l.dtype)
                        for l in leaves)
        fn = with_weights(build_chunk_fn, mcfg, rcfg, mcfg_fine, occ_grid)
        args = (wstruct,
                jax.ShapeDtypeStruct((chunk, rdim), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.uint32))
    else:
        fn = build_chunk_fn(params_c, params_f, mcfg, rcfg, mcfg_fine,
                            occ_grid)
        args = (jax.ShapeDtypeStruct((chunk, rdim), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.uint32))
    out_shapes = jax.eval_shape(fn, *args)  # ground truth for the manifest

    exported = _export_one(fn, args, platforms)

    with open(os.path.join(out_dir, MODULE_FILE), "wb") as f:
        f.write(exported.serialize())

    fused_total = None
    if fused_n_rays:
        fused_total = -(-int(fused_n_rays) // chunk) * chunk
        frays = (jax.ShapeDtypeStruct((fused_total, rdim), jnp.float32),
                 jax.ShapeDtypeStruct((), jnp.uint32))
        if weights_mode == "args":
            ffn = with_weights(build_fused_fn, mcfg, rcfg, chunk,
                               mcfg_fine, occ_grid)
            fargs = (wstruct,) + frays
        else:
            ffn = build_fused_fn(params_c, params_f, mcfg, rcfg, chunk,
                                 mcfg_fine, occ_grid)
            fargs = frays
        fexp = _export_one(ffn, fargs, platforms)
        with open(os.path.join(out_dir, MODULE_FUSED_FILE), "wb") as f:
            f.write(fexp.serialize())

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "chunk": chunk,
        "ray_dim": rdim,
        "use_viewdirs": rcfg.use_viewdirs,
        "output_keys": sorted(out_shapes.keys()),
        "mode": rcfg.mode,
        "n_samples": rcfg.n_samples,
        "n_importance": rcfg.n_importance,
        "perturb": rcfg.perturb,
        "occ_grid_embedded": occ_grid is not None,
        "fused_n_rays": fused_total,
        "weights_mode": weights_mode,
        "n_weight_leaves": len(leaves) if weights_mode == "args" else 0,
        "provenance": provenance or {},
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
