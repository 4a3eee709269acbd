"""End-to-end CLI tests: config parsing/layering, args.json round-trip,
train -> checkpoint -> resume -> test/test_samples_error/video tasks on a
tiny fixture blender scene."""
import json
import os

import numpy as np
import pytest

from plnerf.cli.config import config_parser, read_config_file, resolve_args
from plnerf.cli.run_plnerf import main as plnerf_main
from plnerf.cli.run_vanilla import main as vanilla_main

from fixtures import make_blender_scene

TINY = [
    "--dataset", "blender", "--no_batching", "--use_viewdirs",
    "--white_bkgd", "--N_rand", "64", "--N_samples", "8",
    "--N_importance", "8", "--netdepth", "2", "--netwidth", "16",
    "--multires", "4", "--multires_views", "2", "--chunk", "256",
    "--lrate", "5e-3", "--i_print", "5", "--i_img", "1000000",
    "--i_testset", "1000000", "--i_video", "1000000", "--testskip", "1",
]


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "tinyscene"
    make_blender_scene(str(d), n_train=3, n_val=1, n_test=1)
    return str(d.parent), "tinyscene"


def test_farcolorfix_flag_rides_into_rcfg():
    """--farcolorfix reaches RenderConfig (the reference exposes the flag
    only in nerf_extract_mesh.py:730 and keeps it internal-False in the
    training drivers, run_plnerf.py:645 — we surface it for all tasks);
    --coarse_weight parses accepted-inert (parse-only in the reference,
    nerf_extract_mesh.py:735)."""
    from plnerf.cli.run_plnerf import build_configs

    args = config_parser().parse_args(["--farcolorfix", "True",
                                       "--coarse_weight", "0.5"])
    _, rcfg, _ = build_configs(args)
    assert rcfg.farcolorfix is True
    assert args.coarse_weight == 0.5
    _, rcfg, _ = build_configs(config_parser().parse_args([]))
    assert rcfg.farcolorfix is False


def test_config_file_layering(tmp_path):
    cfg = tmp_path / "conf.txt"
    cfg.write_text(
        "expname = fromfile\nN_samples = 32\nuse_viewdirs = True\n"
        "# comment\nlrate = 1e-3\n"
    )
    args = config_parser().parse_args(["--config", str(cfg)])
    assert args.expname == "fromfile"
    assert args.N_samples == 32
    assert args.use_viewdirs is True
    assert args.lrate == 1e-3
    # explicit CLI flag beats the file
    args = config_parser().parse_args(
        ["--config", str(cfg), "--N_samples", "16"]
    )
    assert args.N_samples == 16


def test_config_file_unknown_key(tmp_path):
    cfg = tmp_path / "bad.txt"
    cfg.write_text("not_a_flag = 3\n")
    with pytest.raises(SystemExit):
        config_parser().parse_args(["--config", str(cfg)])


def test_reference_configs_parse():
    """The reference's shipped config style parses (same key set)."""
    for name in ("blender_linear", "blender_constant",
                 "llff_linear", "llff_constant"):
        path = f"/root/reference/configs/{name}.txt"
        if not os.path.exists(path):
            pytest.skip("reference configs unavailable")
        vals = read_config_file(path)
        parser = config_parser()
        known = {a.dest for a in parser._actions}
        unknown = set(vals) - known
        assert not unknown, f"{name}: {unknown}"


def test_shipped_configs_parse():
    """Every config shipped in configs/ parses against the NVS parser."""
    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    parser = config_parser()
    known = {a.dest for a in parser._actions}
    for name in sorted(os.listdir(cfg_dir)):
        vals = read_config_file(os.path.join(cfg_dir, name))
        unknown = set(vals) - known
        assert not unknown, f"{name}: {unknown}"


def test_train_test_video_roundtrip(scene_dir, tmp_path):
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "ckpts")
    common = TINY + [
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "exp",
    ]
    plnerf_main(common + [
        "--task", "train", "--mode", "linear", "--constant_init", "3",
        "--precrop_iters", "4", "--num_iterations", "12",
        "--i_weights", "10",
    ])
    exp = os.path.join(ckpt_dir, "exp")
    assert os.path.exists(os.path.join(exp, "args.json"))
    assert os.path.exists(os.path.join(exp, "000012.ckpt"))
    assert os.path.exists(os.path.join(exp, "metrics.jsonl"))
    with open(os.path.join(exp, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("train/psnr" in r for r in recs)

    # resume: continue to 16 from the step-12 checkpoint
    plnerf_main(common + [
        "--task", "train", "--mode", "linear", "--constant_init", "3",
        "--num_iterations", "16", "--i_weights", "16",
    ])
    assert os.path.exists(os.path.join(exp, "000016.ckpt"))

    # test task reloads args.json (expname from CLI)
    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "exp",
        "--data_dir", data_dir, "--scene_id", scene_id, "--white_bkgd",
    ])
    test_dir = os.path.join(exp, f"test_images_linear_8_8{scene_id}")
    assert os.path.exists(os.path.join(test_dir, "metrics.txt"))
    assert os.path.exists(os.path.join(test_dir, "0_rgb.png"))
    metrics = open(os.path.join(test_dir, "metrics.txt")).read()
    assert "psnr" in metrics and "ssim" in metrics

    # eval-time sample-budget override + deterministic placement
    # (serving dials; the budget override writes its own result dir so
    # the full-budget eval above is not clobbered)
    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "exp",
        "--data_dir", data_dir, "--scene_id", scene_id, "--white_bkgd",
        "--eval_N_samples", "4", "--eval_N_importance", "2", "--eval_det",
    ])
    ov_dir = os.path.join(exp, f"test_images_linear_4_2{scene_id}")
    assert os.path.exists(os.path.join(ov_dir, "metrics.txt"))
    # args.json must keep the trained values (overrides must not leak)
    with open(os.path.join(exp, "args.json")) as f:
        aj = json.load(f)
    assert aj["N_samples"] == 8 and aj["perturb"] == 1.0

    # sample-error eval
    plnerf_main([
        "--task", "test_samples_error", "--ckpt_dir", ckpt_dir,
        "--expname", "exp", "--data_dir", data_dir, "--scene_id", scene_id,
        "--white_bkgd",
    ])
    assert os.path.exists(os.path.join(
        exp, "test_samples_error_8", "metrics_expecteddepth.txt"))

    # video task renders the pose path
    plnerf_main([
        "--task", "video", "--ckpt_dir", ckpt_dir, "--expname", "exp",
        "--data_dir", data_dir, "--scene_id", scene_id, "--white_bkgd",
        "--render_factor", "2",
    ])
    vids = [d for d in os.listdir(exp) if d.startswith("renderonly_path")]
    assert vids, os.listdir(exp)
    frames = os.listdir(os.path.join(exp, vids[0]))
    assert any(f.endswith(".png") for f in frames)


def test_vanilla_driver_use_batching(scene_dir, tmp_path):
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "ckpts_v")
    args = [a for a in TINY if a != "--no_batching"]
    vanilla_main(args + [
        "--task", "train", "--mode", "constant", "--data_dir", data_dir,
        "--scene_id", scene_id, "--ckpt_dir", ckpt_dir, "--expname", "v",
        "--num_iterations", "8", "--i_weights", "8",
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "v", "000008.ckpt"))


def test_missing_expname_for_test_errors(tmp_path):
    with pytest.raises(SystemExit):
        args = config_parser().parse_args(["--task", "test"])
        resolve_args(args)


def test_distinct_fine_network_dims(scene_dir, tmp_path):
    """--netdepth_fine/--netwidth_fine different from the coarse net
    (reference create_nerf run_plnerf.py:428-437) train + test."""
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "ckpts_f")
    plnerf_main(TINY + [
        "--task", "train", "--mode", "constant", "--data_dir", data_dir,
        "--scene_id", scene_id, "--ckpt_dir", ckpt_dir, "--expname", "f",
        "--netdepth_fine", "3", "--netwidth_fine", "24",
        "--num_iterations", "6", "--i_weights", "6",
    ])
    import flax.serialization as fser

    with open(os.path.join(ckpt_dir, "f", "000006.ckpt"), "rb") as fh:
        sd = fser.msgpack_restore(fh.read())
    pf = sd["params_fine"]["pts_linears"]
    assert len(pf) == 3
    assert pf["0"]["w"].shape[1] == 24
    pc = sd["params_coarse"]["pts_linears"]
    assert len(pc) == 2 and pc["0"]["w"].shape[1] == 16

    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "f",
        "--data_dir", data_dir, "--scene_id", scene_id, "--white_bkgd",
    ])
    test_dir = os.path.join(ckpt_dir, "f",
                            f"test_images_constant_8_8{scene_id}")
    assert os.path.exists(os.path.join(test_dir, "metrics.txt"))


def test_llff_ndc_pool_training(tmp_path):
    """LLFF dataset end to end: recentered poses, NDC ray pool
    (use_batching), llffhold split, train + test task."""
    from fixtures import make_llff_scene

    data_dir = str(tmp_path / "ldata")
    make_llff_scene(os.path.join(data_dir, "fern"), n=6)
    ckpt_dir = str(tmp_path / "lck")
    common = [
        "--dataset", "llff", "--factor", "1", "--llffhold", "3",
        "--use_viewdirs", "--N_rand", "64", "--N_samples", "8",
        "--N_importance", "8", "--netdepth", "2", "--netwidth", "16",
        "--multires", "4", "--multires_views", "2", "--chunk", "256",
        "--lrate", "5e-3", "--i_print", "4", "--i_img", "99999",
        "--i_testset", "99999", "--i_video", "99999",
        "--data_dir", data_dir, "--scene_id", "fern",
        "--ckpt_dir", ckpt_dir, "--expname", "l",
    ]
    plnerf_main(common + [
        "--task", "train", "--mode", "linear", "--constant_init", "2",
        "--num_iterations", "8", "--i_weights", "8",
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "l", "000008.ckpt"))

    # dataset is in the reference's CLI-override list (run_plnerf.py:963),
    # so the test invocation must name it too
    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "l",
        "--data_dir", data_dir, "--scene_id", "fern", "--dataset", "llff",
    ])
    dirs = [d for d in os.listdir(os.path.join(ckpt_dir, "l"))
            if d.startswith("test_images_")]
    assert dirs
    metrics = open(os.path.join(ckpt_dir, "l", dirs[0],
                                "metrics.txt")).read()
    assert "psnr" in metrics


def test_dtu_cli_train_and_test(tmp_path):
    """--dataset DTU end to end: 49-view fixture, split.json dump, short
    train, test task."""
    from fixtures import make_dtu_scene

    data_dir = str(tmp_path / "dtu")
    make_dtu_scene(data_dir, scene_id=5)
    ckpt_dir = str(tmp_path / "dck")
    common = [
        "--dataset", "DTU", "--dtu_scene_id", "5", "--num_train", "42",
        "--no_batching", "--use_viewdirs", "--N_rand", "64",
        "--N_samples", "8", "--N_importance", "8", "--netdepth", "2",
        "--netwidth", "16", "--multires", "4", "--multires_views", "2",
        "--chunk", "256", "--i_print", "4", "--i_img", "99999",
        "--i_testset", "99999", "--i_video", "99999",
        "--data_dir", data_dir, "--ckpt_dir", ckpt_dir, "--expname", "d",
    ]
    plnerf_main(common + ["--task", "train", "--mode", "constant",
                          "--num_iterations", "4", "--i_weights", "4"])
    exp = os.path.join(ckpt_dir, "d")
    assert os.path.exists(os.path.join(exp, "000004.ckpt"))
    assert os.path.exists(os.path.join(exp, "split.json"))
    with open(os.path.join(exp, "split.json")) as f:
        split = json.load(f)
    assert len(split["train_frames"]) == 42
    assert len(split["test_frames"]) == 7
    assert split["near"] == pytest.approx(2.0)

    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "d",
        "--data_dir", data_dir, "--dataset", "DTU",
    ])
    dirs = [x for x in os.listdir(exp) if x.startswith("test_images_")]
    assert dirs and os.path.exists(os.path.join(exp, dirs[0], "metrics.txt"))


def test_fixed_dist_sweep(scene_dir, tmp_path):
    """--task test_fixed_dist: multi-distance quadrature-stability sweep
    (reference run_plnerf.py:1497-1560) over a fixed-dist fixture."""
    from fixtures import make_fixed_dist_scene

    data_dir, scene_id = scene_dir
    eval_dir = str(tmp_path / "fixdata")
    make_fixed_dist_scene(os.path.join(eval_dir, "fixscene"),
                          dists=(0.25, 0.5, 0.75, 1.0), n=2)
    ckpt_dir = str(tmp_path / "fck")
    plnerf_main(TINY + [
        "--task", "train", "--mode", "linear", "--constant_init", "2",
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "fx",
        "--num_iterations", "6", "--i_weights", "6",
    ])
    plnerf_main([
        "--task", "test_fixed_dist", "--ckpt_dir", ckpt_dir,
        "--expname", "fx", "--data_dir", data_dir, "--scene_id", scene_id,
        "--white_bkgd", "--eval_data_dir", eval_dir,
        "--eval_scene_id", "fixscene",
    ])
    exp = os.path.join(ckpt_dir, "fx")
    for dist in ("0.25", "0.5", "0.75", "1.0"):
        d = os.path.join(exp, f"test_images_dist{dist}_{scene_id}")
        assert os.path.exists(os.path.join(d, "metrics.txt")), d
        assert os.path.exists(os.path.join(d, "0_rgb.png"))


def test_steps_per_dispatch_exact_count(scene_dir, tmp_path):
    """Fused dispatch with a non-dividing step count must execute exactly
    num_iterations steps, with phase windows split at constant_init /
    precrop boundaries."""
    import flax.serialization as fser

    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "wck")
    plnerf_main(TINY + [
        "--task", "train", "--mode", "linear", "--constant_init", "10",
        "--precrop_iters", "5", "--steps_per_dispatch", "7",
        "--num_iterations", "23", "--i_weights", "23",
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--ckpt_dir", ckpt_dir, "--expname", "w",
    ])
    with open(os.path.join(ckpt_dir, "w", "000023.ckpt"), "rb") as f:
        sd = fser.msgpack_restore(f.read())
    assert int(sd["step"]) == 23


def test_pool_mode_occ_grid(scene_dir, tmp_path):
    """Occupancy grid in POOL (use_batching) mode — the occ x pool
    interaction: grid-guided slices from the shuffled ray pool, warmup
    boundary inside the run, sidecar saved (no_batching occ is covered by
    test_train_occ_grid_cli)."""
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "pock")
    args = [a for a in TINY if a != "--no_batching"]
    plnerf_main(args + [
        "--task", "train", "--mode", "linear", "--constant_init", "2",
        "--steps_per_dispatch", "4", "--num_iterations", "14",
        "--i_weights", "14", "--data_dir", data_dir,
        "--scene_id", scene_id, "--ckpt_dir", ckpt_dir, "--expname", "po",
        "--occ_grid", "--occ_warmup", "6", "--occ_res", "16",
        "--occ_candidates", "16", "--occ_bound", "1.5",
    ])
    exp = os.path.join(ckpt_dir, "po")
    assert os.path.exists(os.path.join(exp, "000014.ckpt"))
    assert os.path.exists(os.path.join(exp, "000014.occ"))
    log = [json.loads(l) for l in open(os.path.join(exp, "metrics.jsonl"))]
    assert all(np.isfinite(r["train/loss"]) for r in log
               if "train/loss" in r)


def test_pool_epoch_tail_consumed(scene_dir, tmp_path):
    """Pool (use_batching) mode must consume the epoch tail with full-batch
    remainder steps before reshuffling (reference consumes every ray,
    run_plnerf.py:1244-1248): pool = 3*32*32 = 3072 rays, N_rand=80 ->
    38 full batches/epoch; dispatch windows of 8 leave a 6-step remainder
    window at the epoch boundary, then reshuffle.  50 iters cross it."""
    import flax.serialization as fser

    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "ptck")
    args = [a for a in TINY if a != "--no_batching"]
    args[args.index("64")] = "80"  # --N_rand value
    plnerf_main(args + [
        "--task", "train", "--mode", "constant",
        "--steps_per_dispatch", "8", "--num_iterations", "50",
        "--i_weights", "50", "--data_dir", data_dir,
        "--scene_id", scene_id, "--ckpt_dir", ckpt_dir, "--expname", "pt",
    ])
    with open(os.path.join(ckpt_dir, "pt", "000050.ckpt"), "rb") as f:
        sd = fser.msgpack_restore(f.read())
    assert int(sd["step"]) == 50


def test_train_occ_grid_cli(scene_dir, tmp_path):
    """--occ_grid end to end: warmup phase (uniform) then grid-guided
    steps, crossing the warmup boundary inside the run; fused dispatch."""
    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "ckpts_occ")
    plnerf_main(TINY + [
        "--task", "train", "--mode", "linear", "--constant_init", "2",
        "--expname", "exp_occ", "--ckpt_dir", ckpt_dir,
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--num_iterations", "14", "--i_weights", "14",
        "--steps_per_dispatch", "4",
        "--occ_grid", "--occ_warmup", "6", "--occ_res", "16",
        "--occ_candidates", "16", "--occ_bound", "1.5",
    ])
    exp = os.path.join(ckpt_dir, "exp_occ")
    assert os.path.exists(os.path.join(exp, "000014.ckpt"))
    log = [json.loads(l) for l in
           open(os.path.join(exp, "metrics.jsonl"))]
    assert all(np.isfinite(r["train/loss"]) for r in log if "train/loss" in r)

    # the trained grid is saved as a sidecar next to the checkpoint, and
    # the standalone test task restores it and evaluates with grid-guided
    # sampling (train/eval sample distributions must match)
    assert os.path.exists(os.path.join(exp, "000014.occ"))
    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "exp_occ",
        "--data_dir", data_dir, "--scene_id", scene_id, "--white_bkgd",
    ])
    test_dir = os.path.join(exp, f"test_images_linear_8_8{scene_id}")
    assert os.path.exists(os.path.join(test_dir, "metrics.txt"))


def test_occ_resume_and_eval_guardrails(scene_dir, tmp_path, capsys,
                                        monkeypatch):
    """Round-3 occ guard rails (ADVICE r2 + VERDICT r2 item 5):

    a) resuming with a restored .occ sidecar engages the grid IMMEDIATELY
       (warmup is an absolute step count, not re-applied per resume);
    b) degenerate-guidance guard (VERDICT r3 item 6): on a scene where
       most candidate bins along rays stay occupied, the driver prints a
       loud warning AND auto-disables guidance for the rest of the run
       (uniform steps, no further .occ sidecars) unless
       --occ_keep_degenerate;
    c) --occ_grid eval without a sidecar is a hard error unless
       --occ_eval_fresh_grid is passed.
    """
    from plnerf.cli import run_plnerf as rp

    data_dir, scene_id = scene_dir
    ckpt_dir = str(tmp_path / "ckpts_occg")
    common = TINY + [
        "--task", "train", "--mode", "linear", "--constant_init", "2",
        "--expname", "g", "--ckpt_dir", ckpt_dir,
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--i_weights", "10", "--i_print", "2",
        "--occ_grid", "--occ_warmup", "6", "--occ_res", "16",
        "--occ_candidates", "16", "--occ_bound", "1.5",
    ]
    plnerf_main(common + ["--num_iterations", "10"])
    exp = os.path.join(ckpt_dir, "g")
    assert os.path.exists(os.path.join(exp, "000010.occ"))

    # (a)+(b): resume past the absolute warmup with the sidecar present;
    # arm the advisory immediately (the tiny fresh-ish grid stays mostly
    # occupied, so occ_ray_frac > 0.6 on this fixture)
    monkeypatch.setattr(rp, "OCC_ADVISORY_GRACE", 0)
    # the tiny fixture's rays spend much of [near, far] outside the AABB
    # (out-of-bounds bins count unoccupied), so force the threshold down —
    # this tests the metric->advisory plumbing, not the 0.6 calibration
    monkeypatch.setattr(rp, "OCC_DEGENERATE_RAY_FRAC", 0.0)
    capsys.readouterr()
    plnerf_main(common + ["--num_iterations", "16"])
    out = capsys.readouterr().out
    log = [json.loads(l) for l in open(os.path.join(exp, "metrics.jsonl"))]
    post = [r for r in log if "train/occ_ray_frac" in r and r["step"] > 10]
    # occ engaged right after resume: the first post-resume print (iter 12)
    # already carries the grid metric (the old bug re-warmed 6 steps)
    assert post and min(r["step"] for r in post) <= 12
    assert "DEGENERATE" in out
    # (b) the guard ACTS: guidance is dropped from the advisory step on —
    # later prints carry no grid metric and the final checkpoint has no
    # .occ sidecar (eval must be uniform to match the training tail)
    assert "AUTO-FALLBACK" in out
    fb_step = min(r["step"] for r in post)
    assert all(r["step"] <= fb_step for r in post)
    assert not os.path.exists(os.path.join(exp, "000016.occ"))

    # (b') --occ_keep_degenerate force-keeps guidance: advisory still
    # prints, grid metrics continue, sidecar is written
    capsys.readouterr()
    plnerf_main([a if a != "g" else "gk" for a in common]
                + ["--num_iterations", "16", "--occ_keep_degenerate"])
    out_k = capsys.readouterr().out
    assert "DEGENERATE" in out_k and "AUTO-FALLBACK" not in out_k
    exp_k = os.path.join(ckpt_dir, "gk")
    assert os.path.exists(os.path.join(exp_k, "000016.occ"))
    log_k = [json.loads(l) for l in open(
        os.path.join(exp_k, "metrics.jsonl"))]
    assert any("train/occ_ray_frac" in r and r["step"] >= 14
               for r in log_k)

    # (c): occ eval with the sidecar deleted
    for f in os.listdir(exp):
        if f.endswith(".occ"):
            os.remove(os.path.join(exp, f))
    with pytest.raises(FileNotFoundError):
        plnerf_main([
            "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "g",
            "--data_dir", data_dir, "--scene_id", scene_id,
        ])
    plnerf_main([
        "--task", "test", "--ckpt_dir", ckpt_dir, "--expname", "g",
        "--data_dir", data_dir, "--scene_id", scene_id,
        "--occ_eval_fresh_grid",
    ])
    assert os.path.exists(os.path.join(
        exp, f"test_images_linear_8_8{scene_id}", "metrics.txt"))


def test_sigma_bias_init_flag_reaches_model_config():
    """TPU-native --sigma_bias_init plumbs parser -> build_configs ->
    ModelConfig (default 0.0 = exact reference init, mlp.py)."""
    from plnerf.cli.run_plnerf import build_configs

    args = config_parser().parse_args(["--use_viewdirs"])
    mcfg, _, _ = build_configs(args)
    assert mcfg.sigma_bias_init == 0.0
    args = config_parser().parse_args(
        ["--use_viewdirs", "--sigma_bias_init", "0.1"])
    mcfg, _, setup = build_configs(args)
    assert mcfg.sigma_bias_init == 0.1
    assert setup.mcfg.sigma_bias_init == 0.1


def test_eval_det_survives_the_test_perturb_quirk():
    """Regression: --eval_det must override the reference's
    perturb-forced-True-at-test quirk (run_plnerf.py:497-499 /
    eval/images.test_render_config).  The original wiring mutated
    args.perturb upstream, which test_render_config clobbered — caught
    by test_serving's baked-manifest assert."""
    import argparse

    from plnerf.cli.run_plnerf import eval_render_config
    from plnerf.core.config import RenderConfig

    rcfg = RenderConfig(perturb=True)
    det = eval_render_config(argparse.Namespace(eval_det=True), rcfg)
    assert det.perturb is False and det.raw_noise_std == 0.0
    quirk = eval_render_config(argparse.Namespace(eval_det=False), rcfg)
    assert quirk.perturb is True  # reference quirk preserved by default
    # even a perturb=0-trained model evals with the quirk (reference
    # sets render_kwargs_test['perturb']=True unconditionally)
    quirk2 = eval_render_config(argparse.Namespace(eval_det=False),
                                RenderConfig(perturb=False))
    assert quirk2.perturb is True


def test_use_pallas_tristate_resolution():
    """Round-4 promotion: --use_pallas default (None) is AUTO — folded
    Pallas kernel for the TRAIN step on TPU+bf16+viewdirs, XLA
    elsewhere; explicit flags win both ways; eval_render_config strips
    the kernel unless the user forced --use_pallas (it is a measured
    eval-side LOSS, BASELINE.md round-3 verdict)."""
    import argparse

    from plnerf.cli.run_plnerf import build_configs, eval_render_config
    from plnerf.core.config import RenderConfig

    # AUTO on the CPU test backend -> off even at bf16
    args = config_parser().parse_args(
        ["--use_viewdirs", "--mlp_dtype", "bfloat16"])
    assert args.use_pallas is None
    _, rcfg, _ = build_configs(args)
    assert rcfg.use_pallas_mlp is False
    # explicit --use_pallas wins over backend, and rides into eval
    args = config_parser().parse_args(["--use_viewdirs", "--use_pallas"])
    _, rcfg, _ = build_configs(args)
    assert rcfg.use_pallas_mlp is True and rcfg.pallas_fold_heads is True
    ev = eval_render_config(args, rcfg)
    assert ev.use_pallas_mlp is True
    # explicit --no-use_pallas forces off
    args = config_parser().parse_args(
        ["--use_viewdirs", "--mlp_dtype", "bfloat16", "--no-use_pallas"])
    _, rcfg, _ = build_configs(args)
    assert rcfg.use_pallas_mlp is False
    # AUTO (or off): eval strips the kernel even if the train rcfg has it
    ev = eval_render_config(
        argparse.Namespace(eval_det=False, use_pallas=None),
        RenderConfig(use_pallas_mlp=True, pallas_fold_heads=True))
    assert ev.use_pallas_mlp is False and ev.pallas_fold_heads is False
    # AUTO is recipe-gated: on a (faked) TPU backend it enables for the
    # linear recipe only — the constant budget measured a ~5% LOSS with
    # the kernel (BENCH r4), so constant stays XLA unless forced
    from plnerf.cli import run_plnerf as RP
    from unittest import mock
    with mock.patch.object(RP.jax, "default_backend", lambda: "tpu"):
        ns = lambda mode: argparse.Namespace(  # noqa: E731
            use_pallas=None, mlp_dtype="bfloat16", use_viewdirs=True,
            mode=mode)
        assert RP._resolve_pallas(ns("linear")) is True
        assert RP._resolve_pallas(ns("constant")) is False
        forced = argparse.Namespace(use_pallas=True, mode="constant")
        assert RP._resolve_pallas(forced) is True


def test_auto_pallas_gated_off_under_mesh(capsys):
    """AUTO --use_pallas is single-device scope: under a multi-chip mesh
    the train step falls back to XLA (Mosaic custom-call partitioning
    under the dp batch constraint is unvalidated on real pods — the
    virtual dryrun only emulates), while an explicit --use_pallas still
    rides through for users who can validate on their hardware."""
    import argparse
    import dataclasses

    from plnerf.cli import run_plnerf as RP
    from plnerf.core.config import RenderConfig
    from plnerf.train.step import TrainSetup

    rcfg = RenderConfig(use_pallas_mlp=True, pallas_fold_heads=True)
    setup = TrainSetup(rcfg=rcfg)
    # AUTO (use_pallas=None): the gate strips the kernel from BOTH the
    # rcfg and the jit-keyed TrainSetup, and says so once
    auto = argparse.Namespace(use_pallas=None)
    s2, r2 = RP.gate_auto_pallas_for_mesh(auto, setup, rcfg)
    assert r2.use_pallas_mlp is False and r2.pallas_fold_heads is False
    assert s2.rcfg is r2
    assert "multi-chip" in capsys.readouterr().out
    # everything else in the setup is untouched
    assert dataclasses.replace(s2, rcfg=rcfg) == setup
    # explicit --use_pallas: kept verbatim, no note
    forced = argparse.Namespace(use_pallas=True)
    s3, r3 = RP.gate_auto_pallas_for_mesh(forced, setup, rcfg)
    assert r3.use_pallas_mlp is True and s3 is setup
    assert capsys.readouterr().out == ""
    # already-XLA rcfg: no-op
    r_off = dataclasses.replace(rcfg, use_pallas_mlp=False)
    s4, r4 = RP.gate_auto_pallas_for_mesh(auto, setup, r_off)
    assert s4 is setup and r4 is r_off


def test_training_eval_chunk_policy():
    """In-training eval renders must not OOM against a resident 64M-ray
    pool (round-5 geo800 study: RESOURCE_EXHAUSTED at the first 800^2
    i_img render with chunk 32768 + a 2.3 GB pool on v5e-16GB).
    Policy: explicit --eval_chunk wins; otherwise shrink to 8192 only
    when the pool exceeds 1 GB; never grow a smaller --chunk."""
    import argparse

    from plnerf.cli.run_plnerf import training_eval_chunk

    mk = lambda **kw: argparse.Namespace(chunk=32768, eval_chunk=None, **kw)
    assert training_eval_chunk(mk(), 0) == 32768              # no pool
    assert training_eval_chunk(mk(), 2_300_000_000) == 8192   # big pool
    a = mk(); a.eval_chunk = 4096
    assert training_eval_chunk(a, 2_300_000_000) == 4096      # explicit
    a = mk(); a.chunk = 2048
    assert training_eval_chunk(a, 2_300_000_000) == 2048      # never grow
