"""Mesh extraction: density-grid evaluation on TPU -> marching cubes
(native C++) -> connected-component floater removal -> PLY export.

Behavioral reference: ``extract_fields`` / ``extract_iso_level`` /
``extract_geometry`` (nerf_extract_mesh.py:531-594) and the trimesh-based
cleanup + export driver (:1084-1106).

TPU design: the reference's triple-nested 64-block Python loop (134M MLP
evals at 512^3) is replaced by one jitted program — grid points flattened,
padded, ``lax.map``'d over fixed-size chunks, optionally sharded across
the device mesh (each chip evaluates a slab of the grid).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import mlp
from ..core.config import ModelConfig
from ..parallel import mesh as pmesh
from .marching_cubes import marching_cubes


def _density_flat_local(params, pts, mcfg: ModelConfig, chunk: int):
    """pts: [n_chunks*chunk, 3] -> relu(sigma) [n_chunks*chunk].
    Zero viewdirs, matching reference extract_fields (:545)."""
    n_chunks = pts.shape[0] // chunk
    pts_c = pts.reshape(n_chunks, chunk, 1, 3)

    def body(p):
        vd = jnp.zeros((chunk, 3), p.dtype)
        raw = mlp.query_network(params, p, vd, mcfg)
        return jax.nn.relu(raw[..., 0, 3])

    return jax.lax.map(body, pts_c).reshape(-1)


@partial(jax.jit, static_argnames=("mcfg", "chunk"))
def _density_flat(params, pts, mcfg: ModelConfig, chunk: int):
    return _density_flat_local(params, pts, mcfg, chunk)


_SHARDED_DENSITY_CACHE: dict = {}


def _sharded_density(mesh, mcfg: ModelConfig, chunk: int):
    """shard_map'd grid eval: each chip evaluates ITS slab of the grid
    (lax.map over a sharded axis would all-gather and replicate the whole
    134M-point evaluation on every chip)."""
    key = (mesh, mcfg, chunk)
    if key in _SHARDED_DENSITY_CACHE:
        return _SHARDED_DENSITY_CACHE[key]
    P = pmesh.P

    def local(params, pts):
        return _density_flat_local(params, pts, mcfg, chunk)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(pmesh.DATA_AXIS)),
        out_specs=P(pmesh.DATA_AXIS),
        check_vma=False,
    ))
    _SHARDED_DENSITY_CACHE[key] = fn
    return fn


def extract_density_grid(
    params,
    mcfg: ModelConfig,
    bound_min,
    bound_max,
    resolution: int = 512,
    chunk: int = 64 ** 3,
    mesh=None,
) -> np.ndarray:
    """Evaluate relu(sigma) on a resolution^3 grid over the bbox."""
    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    axes = [np.linspace(bmin[d], bmax[d], resolution, dtype=np.float32)
            for d in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)

    n = pts.shape[0]
    n_dev = len(mesh.devices.flat) if mesh is not None else 1
    total = pmesh.pad_to_multiple(n, chunk * n_dev)
    pts_p = np.pad(pts, ((0, total - n), (0, 0)))
    pts_j = jnp.asarray(pts_p)
    if mesh is not None:
        pts_j = jax.device_put(pts_j, pmesh.batch_sharded(mesh))
        params = pmesh.replicate(params, mesh)
        sigma = np.asarray(
            _sharded_density(mesh, mcfg, chunk)(params, pts_j))[:n]
    else:
        sigma = np.asarray(_density_flat(params, pts_j, mcfg, chunk))[:n]
    return sigma.reshape(resolution, resolution, resolution)


def extract_iso_level(density: np.ndarray, threshold: float = 25.0) -> float:
    """Adaptive iso level (reference nerf_extract_mesh.py:564-573)."""
    min_a, max_a, std_a = density.min(), density.max(), density.std()
    return float(min(max(threshold, min_a + std_a), max_a - std_a))


def extract_geometry(
    params,
    mcfg: ModelConfig,
    bound_min,
    bound_max,
    resolution: int = 512,
    threshold: float = 25.0,
    adaptive: bool = False,
    chunk: int = 64 ** 3,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Density grid -> marching cubes -> verts scaled into the bbox
    (reference extract_geometry, nerf_extract_mesh.py:576-593)."""
    u = extract_density_grid(params, mcfg, bound_min, bound_max, resolution,
                             chunk, mesh)
    iso = extract_iso_level(u, threshold) if adaptive else threshold
    verts, faces = marching_cubes(u, iso)
    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    verts = verts / (resolution - 1.0) * (bmax - bmin)[None, :] + bmin[None, :]
    return verts.astype(np.float32), faces


def filter_connected_components(
    verts: np.ndarray, faces: np.ndarray, min_len: int = 10000
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep only face components with >= min_len faces, where faces are
    connected through shared edges (trimesh face_adjacency semantics —
    reference nerf_extract_mesh.py:1094-1100).  Vertices are re-indexed.

    Fully vectorized (numpy grouping + scipy.sparse.csgraph): a real 512^3
    extraction yields millions of faces, where the round-1 per-face Python
    union-find took minutes on the single host vCPU."""
    if faces.shape[0] == 0:
        return verts, faces
    n_faces = faces.shape[0]
    # all face edges as sorted vertex pairs -> unique edge ids
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    e = np.sort(e, axis=1)
    face_of = np.tile(np.arange(n_faces), 3)
    # scalar-encode the pair: 1-D unique is ~5x faster than axis=0 unique
    ekey = e[:, 0].astype(np.int64) * (verts.shape[0] + 1) + e[:, 1]
    _, edge_id = np.unique(ekey, return_inverse=True)
    # faces sharing an edge id become adjacent: after sorting incidences by
    # edge id, consecutive rows with equal ids are chained (a chain per
    # group is enough for connectivity, incl. non-manifold k>2 edges)
    order = np.argsort(edge_id, kind="stable")
    eid_s, face_s = edge_id[order], face_of[order]
    same = eid_s[1:] == eid_s[:-1]
    rows, cols = face_s[:-1][same], face_s[1:][same]

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    adj = coo_matrix(
        (np.ones(rows.shape[0], np.int8), (rows, cols)),
        shape=(n_faces, n_faces),
    )
    _, labels = connected_components(adj, directed=False)
    counts = np.bincount(labels)
    keep = counts[labels] >= min_len
    faces = faces[keep]
    used = np.unique(faces)
    remap = np.full(verts.shape[0], -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    return verts[used], remap[faces].astype(np.int32)


def export_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Binary little-endian PLY writer (replaces trimesh.export)."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {verts.shape[0]}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {faces.shape[0]}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        counts = np.full((faces.shape[0], 1), 3, np.uint8)
        rows = np.concatenate(
            [counts.view(np.uint8),
             faces.astype("<i4").view(np.uint8).reshape(faces.shape[0], 12)],
            axis=1,
        )
        f.write(rows.tobytes())


def load_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal PLY reader for round-trip tests and GT-mesh bbox loading
    (binary_little_endian and ascii, vertex xyz + triangular faces)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    n_vert = n_face = 0
    fmt = "binary_little_endian"
    vert_props = 0
    in_vertex = False
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if parts[1] == "vertex":
                n_vert = int(parts[2])
            elif parts[1] == "face":
                n_face = int(parts[2])
        elif parts[0] == "property" and in_vertex and parts[1] != "list":
            vert_props += 1
    if fmt == "ascii":
        rows = data[end:].decode("ascii").split()
        verts = np.array(rows[: n_vert * vert_props], np.float32)
        verts = verts.reshape(n_vert, vert_props)[:, :3]
        rest = rows[n_vert * vert_props:]
        faces = []
        i = 0
        for _ in range(n_face):
            c = int(rest[i])
            faces.append([int(v) for v in rest[i + 1: i + 1 + c]][:3])
            i += 1 + c
        return verts, np.asarray(faces, np.int32)
    body = data[end:]
    verts = np.frombuffer(
        body, "<f4", count=n_vert * vert_props
    ).reshape(n_vert, vert_props)[:, :3].copy()
    off = n_vert * vert_props * 4
    faces = np.zeros((n_face, 3), np.int32)
    for i in range(n_face):
        c = body[off]
        faces[i] = np.frombuffer(body, "<i4", count=3, offset=off + 1)
        off += 1 + 4 * c
    return verts, faces
