"""End-to-end depth-supervised driver test on a fixture blender2_depth
scene: train with space carving -> checkpoint -> test task."""
import os

import numpy as np
import pytest

from plnerf.cli.run_depth import main as depth_main

from fixtures import make_blender2_scene

TINY = [
    "--dataset", "blender2_depth", "--N_rand", "64", "--N_samples", "8",
    "--N_importance", "8", "--netdepth", "2", "--netwidth", "16",
    "--multires", "4", "--multires_views", "2", "--chunk", "256",
    "--lrate", "5e-3", "--i_print", "4", "--mode", "linear",
    "--set_near_plane", "2.0", "--space_carving_weight", "0.007",
    "--freeze_ss", "100", "--white_bkgd",
]


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ddata") / "depthscene"
    make_blender2_scene(str(d), n_train=3, n_test=2, with_depth=True)
    return str(d.parent), "depthscene"


def test_depth_train_and_test(scene_dir, tmp_path):
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "dckpts")
    depth_main(["train"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "dexp",
        "--num_iterations", "8", "--i_weights", "8",
    ])
    exp = os.path.join(ckpt_dir, "dexp")
    assert os.path.exists(os.path.join(exp, "000008.ckpt"))
    # metrics carry the space-carving loss and scale/shift means
    import json

    with open(os.path.join(exp, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("train/space_carving_loss" in r for r in recs)
    assert any("train/depth_scale_mean" in r for r in recs)

    depth_main(["test"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "dexp",
    ])
    test_dirs = [d for d in os.listdir(exp) if d.startswith("test_images_")]
    assert test_dirs
    metrics = open(os.path.join(exp, test_dirs[0], "metrics.txt")).read()
    assert "psnr" in metrics
    # depth RMSE tracked because the fixture has gt depths
    assert "depth_rmse" in metrics

    # eval-time sample-budget override (same dial as run_plnerf)
    depth_main(["test"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "dexp",
        "--eval_N_samples", "4", "--eval_N_importance", "2",
    ])
    ov = [d for d in os.listdir(exp)
          if d.startswith("test_images_linear_4_2")]
    assert ov and os.path.exists(os.path.join(exp, ov[0], "metrics.txt"))


def test_depth_occ_grid_train_and_test(scene_dir, tmp_path):
    """Depth driver with --occ_grid: warmup -> grid-guided phase, sidecar
    grid saved next to the checkpoint, test task evaluates grid-guided
    (same contract as run_plnerf's occ path)."""
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "dockpts")
    depth_main(["train"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "docc",
        "--num_iterations", "12", "--i_weights", "12",
        "--steps_per_dispatch", "4",
        "--occ_grid", "--occ_warmup", "6", "--occ_res", "16",
        "--occ_candidates", "16", "--occ_bound", "1.5",
    ])
    exp = os.path.join(ckpt_dir, "docc")
    assert os.path.exists(os.path.join(exp, "000012.ckpt"))
    assert os.path.exists(os.path.join(exp, "000012.occ"))
    import json

    with open(os.path.join(exp, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert all(np.isfinite(r["train/loss"]) for r in recs
               if "train/loss" in r)

    depth_main(["test"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "docc",
    ])
    test_dirs = [d for d in os.listdir(exp) if d.startswith("test_images_")]
    assert test_dirs
    assert "psnr" in open(
        os.path.join(exp, test_dirs[0], "metrics.txt")).read()


def test_depth_samples_error_and_video(scene_dir, tmp_path):
    """Depth driver's remaining tasks: test_samples_error + video."""
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "dck2")
    depth_main(["train"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "d2",
        "--num_iterations", "4", "--i_weights", "4",
        "--steps_per_dispatch", "2",
    ])
    exp = os.path.join(ckpt_dir, "d2")
    depth_main(["test_samples_error"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "d2",
    ])
    assert os.path.exists(os.path.join(
        exp, "test_predicted_samples_error_8", "metrics_depth_samples.txt"))

    depth_main(["video"] + TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "d2",
    ])
    vid = os.path.join(exp, "video")
    files = os.listdir(vid)
    assert any(f.startswith("depth_") for f in files), files
    assert any(f.startswith("depthcolor_") for f in files)


def test_depth_fine_dims_honored():
    """--netdepth_fine/--netwidth_fine build a distinct fine network
    (ADVICE round 1: they were silently ignored; reference builds
    model_fine from them, run_nerf_sample_based_depth.py:581)."""
    from plnerf.cli.run_depth import build_configs, config_parser

    args = config_parser().parse_args([
        "train", "--netdepth", "4", "--netwidth", "64",
        "--netdepth_fine", "6", "--netwidth_fine", "128",
    ])
    mcfg, rcfg, setup = build_configs(args)
    assert setup.mcfg_fine is not None
    assert setup.mcfg_fine.netdepth == 6
    assert setup.mcfg_fine.netwidth == 128
    assert mcfg.netdepth == 4 and mcfg.netwidth == 64
    # equal dims -> no separate fine config (shared jit cache)
    args = config_parser().parse_args(["train"])
    _, _, setup = build_configs(args)
    assert setup.mcfg_fine is None
