"""Mesh subsystem tests: native-vs-numpy marching cubes parity, sphere
geometry sanity, floater removal, PLY round-trip, sharded density grid,
and the extract_mesh CLI end to end."""
import os

import numpy as np
import pytest

import jax

from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.mesh import extract as MX
from plnerf.mesh import marching_cubes as MC
from plnerf.parallel import mesh as pmesh
from plnerf.train.step import TrainSetup, init_state


def sphere_grid(n=32, r=1.0, extent=1.2, center=(0, 0, 0)):
    ax = np.linspace(-extent, extent, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (r - np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2 +
                        (Z - center[2]) ** 2)).astype(np.float32)


def test_native_matches_numpy():
    grid = sphere_grid(24)
    out = MC.marching_cubes_native(grid, 0.0)
    assert out is not None, "g++ toolchain missing?"
    v, f = out
    vn, fn = MC.marching_cubes_numpy(grid, 0.0)
    np.testing.assert_allclose(v, vn, atol=1e-6)
    np.testing.assert_array_equal(f, fn)


def test_sphere_geometry():
    n, r, extent = 48, 1.0, 1.2
    v, f = MC.marching_cubes(sphere_grid(n, r, extent), 0.0)
    scale = 2 * extent / (n - 1)
    vw = v * scale - extent
    rad = np.linalg.norm(vw, axis=1)
    assert np.abs(rad - r).max() < 0.01
    e1 = vw[f[:, 1]] - vw[f[:, 0]]
    e2 = vw[f[:, 2]] - vw[f[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert abs(area - 4 * np.pi * r ** 2) < 0.2
    # watertight: every edge shared by exactly two faces
    from collections import Counter

    cnt = Counter()
    for tri in f:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            cnt[(min(tri[a], tri[b]), max(tri[a], tri[b]))] += 1
    assert all(c == 2 for c in cnt.values())
    assert v.shape[0] - len(cnt) + f.shape[0] == 2  # Euler characteristic


def test_floater_removal():
    # big sphere + tiny floater sphere
    g = np.maximum(sphere_grid(48, r=0.8),
                   sphere_grid(48, r=0.08, center=(1.0, 1.0, 1.0)))
    v, f = MC.marching_cubes(g, 0.0)
    v2, f2 = MX.filter_connected_components(v, f, min_len=200)
    assert 0 < f2.shape[0] < f.shape[0]
    # all kept vertices belong to the big sphere (radius ~0.8 in grid units)
    scale = 2.4 / 47
    rad = np.linalg.norm(v2 * scale - 1.2, axis=1)
    assert np.all(rad < 0.95)
    # removing with a huge threshold empties the mesh
    _, f3 = MX.filter_connected_components(v, f, min_len=10 ** 7)
    assert f3.shape[0] == 0


def test_ply_roundtrip(tmp_path):
    v, f = MC.marching_cubes(sphere_grid(16), 0.0)
    path = str(tmp_path / "m.ply")
    MX.export_ply(path, v, f)
    v2, f2 = MX.load_ply(path)
    np.testing.assert_allclose(v, v2, atol=1e-6)
    np.testing.assert_array_equal(f, f2)


MCFG = ModelConfig(netdepth=2, netwidth=16, multires=4, multires_views=2)


@pytest.fixture(scope="module")
def params():
    setup = TrainSetup(mcfg=MCFG, rcfg=RenderConfig(n_samples=4,
                                                    n_importance=4))
    st = init_state(jax.random.PRNGKey(0), setup)
    return st.params_fine


def test_density_grid_sharded_matches_single(params):
    bmin, bmax = np.full(3, -1.0), np.full(3, 1.0)
    g1 = MX.extract_density_grid(params, MCFG, bmin, bmax, resolution=16,
                                 chunk=128)
    mesh = pmesh.make_mesh()
    g8 = MX.extract_density_grid(params, MCFG, bmin, bmax, resolution=16,
                                 chunk=128, mesh=mesh)
    assert g1.shape == (16, 16, 16)
    assert np.all(g1 >= 0)  # relu'd density
    np.testing.assert_allclose(g1, g8, atol=1e-5)


def test_extract_geometry_runs(params):
    v, f = MX.extract_geometry(
        params, MCFG, np.full(3, -1.0), np.full(3, 1.0), resolution=16,
        threshold=None or 0.05, chunk=128,
    )
    assert v.dtype == np.float32 and (f.size == 0 or f.max() < v.shape[0])
    if v.size:
        assert v.min() >= -1.0 - 1e-5 and v.max() <= 1.0 + 1e-5


def test_extract_mesh_cli(tmp_path):
    """Train 4 iters on the fixture scene, then run the mesh CLI."""
    import sys

    from fixtures import make_blender_scene
    from plnerf.cli.run_plnerf import main as plnerf_main
    from plnerf.cli.extract_mesh import main as mesh_main

    data_dir = str(tmp_path / "data")
    make_blender_scene(os.path.join(data_dir, "ms"), 2, 1, 1)
    ckpt_dir = str(tmp_path / "ck")
    common = [
        "--dataset", "blender", "--no_batching", "--use_viewdirs",
        "--white_bkgd", "--N_rand", "32", "--N_samples", "4",
        "--N_importance", "4", "--netdepth", "2", "--netwidth", "16",
        "--multires", "4", "--multires_views", "2", "--chunk", "128",
        "--data_dir", data_dir, "--scene_id", "ms", "--ckpt_dir", ckpt_dir,
        "--expname", "m", "--i_print", "4", "--i_img", "9999",
        "--i_testset", "9999", "--i_video", "9999",
    ]
    plnerf_main(common + ["--task", "train", "--num_iterations", "4",
                          "--i_weights", "4", "--constant_init", "0"])
    outdir = str(tmp_path / "meshes")
    mesh_main([
        "--ckpt_dir", ckpt_dir, "--expname", "m", "--data_dir", data_dir,
        "--scene_id", "ms", "--mesh_res", "16", "--mesh_threshold", "0.05",
        "--bbox_min", "-1", "-1", "-1", "--bbox_max", "1", "1", "1",
        "--min_component_faces", "0", "--mesh_outdir", outdir,
        "--mesh_chunk", "128",
    ])
    files = os.listdir(outdir)
    assert any(f.endswith("_cleaned.ply") for f in files), files
