"""Marching cubes: native C++ kernel (ctypes) with a vectorized numpy
fallback — the TPU-native replacement for the reference's PyMCubes
dependency (``mcubes.marching_cubes(u, threshold)``,
nerf_extract_mesh.py:581).

The C++ extension is compiled lazily from ``_marching_cubes.cpp`` with g++
on first use and cached under ``~/.cache/plnerf``.  Both paths return
``(verts [V,3] float32, faces [F,3] int32)`` with verts in grid-index
coordinates (caller rescales to the world bbox) and shared, deduplicated
vertices.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_marching_cubes.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _cache_dir() -> str:
    d = os.environ.get("PLNERF_CACHE",
                       os.path.expanduser("~/.cache/plnerf"))
    os.makedirs(d, exist_ok=True)
    return d


def _build_library() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"mc_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    os.replace(so_path + ".tmp", so_path)
    return so_path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        so = _build_library()
        if so is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(so)
        lib.mc_run.restype = ctypes.c_int
        lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mc_free.argtypes = [ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int)]
        _LIB = lib
        return _LIB


def marching_cubes_native(grid: np.ndarray, iso: float
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ path; returns None if the toolchain is unavailable."""
    lib = _load()
    if lib is None:
        return None
    g = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = g.shape
    pv = ctypes.POINTER(ctypes.c_float)()
    pf = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int(0)
    nf = ctypes.c_int(0)
    rc = lib.mc_run(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf),
        ctypes.byref(nf),
    )
    if rc != 0:
        raise MemoryError("mc_run allocation failed")
    try:
        verts = np.ctypeslib.as_array(pv, (nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(pf, (nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mc_free(pv, pf)
    return verts.astype(np.float32), faces.astype(np.int32)


def marching_cubes_numpy(grid: np.ndarray, iso: float
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-python fallback: same algorithm, per-cube loop over only the
    active cubes (sign changes).  Slow for big grids; used when g++ is
    unavailable and in tests as the cross-check oracle."""
    from ._mc_tables import TRI_TABLE

    corner_ofs = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int64)
    edge_corner = np.array(
        [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
         [0, 4], [1, 5], [2, 6], [3, 7]], np.int64)

    g = np.asarray(grid, np.float32)
    inside = g > iso
    # cube index per cell, vectorized
    ci = np.zeros(tuple(s - 1 for s in g.shape), np.int32)
    for c, (dx, dy, dz) in enumerate(corner_ofs):
        ci |= (
            inside[dx: dx + ci.shape[0], dy: dy + ci.shape[1],
                   dz: dz + ci.shape[2]].astype(np.int32) << c
        )
    xs, ys, zs = np.nonzero((ci != 0) & (ci != 255))

    verts: list = []
    faces: list = []
    vert_ids: dict = {}

    def edge_vertex(x, y, z, e):
        a, b = edge_corner[e]
        ax, ay, az = corner_ofs[a]
        bx, by, bz = corner_ofs[b]
        ox, oy, oz = x + min(ax, bx), y + min(ay, by), z + min(az, bz)
        axis = 0 if ax != bx else (1 if ay != by else 2)
        key = (ox, oy, oz, axis)
        if key in vert_ids:
            return vert_ids[key]
        va = g[x + ax, y + ay, z + az]
        vb = g[x + bx, y + by, z + bz]
        t = 0.5 if vb == va else np.clip((iso - va) / (vb - va), 0.0, 1.0)
        idx = len(verts)
        verts.append((x + ax + t * (bx - ax), y + ay + t * (by - ay),
                      z + az + t * (bz - az)))
        vert_ids[key] = idx
        return idx

    for x, y, z in zip(xs, ys, zs):
        tri = TRI_TABLE[ci[x, y, z]]
        for t in range(0, 16, 3):
            if tri[t] == -1:
                break
            faces.append((edge_vertex(x, y, z, tri[t]),
                          edge_vertex(x, y, z, tri[t + 1]),
                          edge_vertex(x, y, z, tri[t + 2])))

    return (np.asarray(verts, np.float32).reshape(-1, 3),
            np.asarray(faces, np.int32).reshape(-1, 3))


def marching_cubes(grid: np.ndarray, iso: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    out = marching_cubes_native(grid, iso)
    if out is None:
        out = marching_cubes_numpy(grid, iso)
    return out
