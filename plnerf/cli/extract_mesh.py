"""Mesh-extraction driver: trained checkpoint -> density grid on TPU ->
marching cubes -> floater removal -> PLY.

Reference: nerf_extract_mesh.py driver (:758-1115): reload args.json, load
the GT mesh to define the bbox (+-0.25 margin, :1030-1051), evaluate the
fine network at 512^3, ``mcubes.marching_cubes(u, 25)``, trimesh
connected-component cleanup (min_len=10000), export
``extracted_meshes/{scene}_{mode}_res{res}_thresh{thresh}_cleaned.ply``.
"""
from __future__ import annotations

import os

import numpy as np

import jax

from ..checkpoint import io as ckio
from ..mesh import extract as MX
from .config import add_base_flags, ConfigArgumentParser, resolve_args
from .run_plnerf import build_configs, exp_dir, get_mesh
from ..train.step import init_state


def config_parser() -> ConfigArgumentParser:
    p = ConfigArgumentParser()
    add_base_flags(p)
    a = p.add_argument
    a("--mesh_res", type=int, default=512,
      help="density grid resolution per axis")
    a("--mesh_threshold", type=float, default=25.0,
      help="density iso threshold")
    a("--adaptive_iso", action="store_true",
      help="adaptive iso level from density statistics")
    a("--gt_mesh_path", type=str, default=None,
      help="GT mesh (.ply/.obj) whose bbox +-0.25 bounds the grid; "
           "default <data_dir>/nerf_meshes_reoriented/<scene_id>.obj")
    a("--bbox_min", type=float, nargs=3, default=None)
    a("--bbox_max", type=float, nargs=3, default=None)
    a("--min_component_faces", type=int, default=10000,
      help="floater-removal threshold (faces per connected component)")
    a("--mesh_outdir", type=str, default="extracted_meshes")
    a("--mesh_chunk", type=int, default=64 ** 3)
    return p


def _load_obj_vertices(path: str) -> np.ndarray:
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(verts, np.float32)


def resolve_bbox(args):
    if args.bbox_min is not None and args.bbox_max is not None:
        return (np.asarray(args.bbox_min, np.float32),
                np.asarray(args.bbox_max, np.float32))
    path = args.gt_mesh_path
    if path is None:
        path = os.path.join(args.data_dir, "nerf_meshes_reoriented",
                            args.scene_id + ".obj")
    if os.path.exists(path):
        if path.endswith(".ply"):
            verts, _ = MX.load_ply(path)
        else:
            verts = _load_obj_vertices(path)
        return verts.min(0) - 0.25, verts.max(0) + 0.25
    print(f"WARNING: no GT mesh at {path}; using default bbox [-1.25,1.25]^3")
    return (np.full(3, -1.25, np.float32), np.full(3, 1.25, np.float32))


def run(args) -> str:
    mcfg, rcfg, setup = build_configs(args)
    state = init_state(jax.random.PRNGKey(args.seed), setup)
    path = args.ft_path or ckio.latest_checkpoint(exp_dir(args))
    if path and os.path.exists(path):
        # mesh script skips optimizer state on load (reference :230) —
        # restore_checkpoint restores the whole tree; only params matter here
        state = ckio.restore_checkpoint(path, state)
        print(f"Loaded {path}")
    else:
        print("WARNING: extracting from an untrained network")
    params = (state.params_fine
              if state.params_fine is not None else state.params_coarse)

    bmin, bmax = resolve_bbox(args)
    print("bbox:", bmin, bmax)
    verts, faces = MX.extract_geometry(
        params, mcfg, bmin, bmax, resolution=args.mesh_res,
        threshold=args.mesh_threshold, adaptive=args.adaptive_iso,
        chunk=args.mesh_chunk, mesh=get_mesh(args),
    )
    print(f"raw mesh: {verts.shape[0]} verts, {faces.shape[0]} faces")
    verts, faces = MX.filter_connected_components(
        verts, faces, min_len=args.min_component_faces)
    print(f"cleaned: {verts.shape[0]} verts, {faces.shape[0]} faces")

    os.makedirs(args.mesh_outdir, exist_ok=True)
    fname = (f"{args.scene_id}_{args.mode}_res{args.mesh_res}"
             f"_thresh{args.mesh_threshold:g}_cleaned.ply")
    out = os.path.join(args.mesh_outdir, fname)
    MX.export_ply(out, verts, faces)
    print("exported", out)
    return out


def main(argv=None):
    args = config_parser().parse_args(argv)
    args.task = "mesh"
    args = resolve_args(args)
    run(args)


if __name__ == "__main__":
    main()
