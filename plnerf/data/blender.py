"""Blender-family dataset loaders.

Four variants with the reference's exact file layouts and skip rules:

* ``load_blender``: ``transforms_{split}.json`` + imageio png, optional
  half-res INTER_AREA resize (reference load_blender.py:64-116).
* ``load_blender2``: ``{split}_transforms.json`` naming, per-frame
  intrinsics, test skip 8 (reference load_blender.py:209-280).
* ``load_blender_fixed_dist``: ``radius_{dist}_{split}`` folders +
  ``transforms_radius{dist}_{split}.json``, test skip 4 — the multi-
  distance quadrature-stability eval data (reference load_blender.py:
  119-206).
* ``load_blender2_depth``: blender2 plus 16-bit depth maps scaled by
  255/max_depth, validity mask near<d<far, clip to [near, far]
  (reference depth_supervised_exps/data/load_scene_blender.py:521-635).

All return numpy on host; arrays go to device once, at trainer start.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .common import (
    composite_white_background, hemisphere_render_poses, intrinsics_from_fov,
    pose_spherical, read_image_rgb, strip_alpha,
)


@dataclass
class SceneData:
    images: np.ndarray                 # [N, H, W, C]
    poses: np.ndarray                  # [N, 4, 4] or [N, 3, 5]
    render_poses: np.ndarray
    hwf: list                          # [H, W, focal]
    i_split: list                      # [i_train, i_val, i_test]
    K: Optional[np.ndarray] = None
    intrinsics: Optional[np.ndarray] = None   # [N, 4] (fx, fy, cx, cy)
    near: Optional[float] = None
    far: Optional[float] = None
    depths: Optional[np.ndarray] = None
    valid_depths: Optional[np.ndarray] = None
    gt_depths: Optional[np.ndarray] = None
    gt_valid_depths: Optional[np.ndarray] = None


def load_blender(basedir: str, half_res: bool = False, testskip: int = 1) -> SceneData:
    import cv2
    import imageio.v2 as imageio

    all_imgs, all_poses, counts = [], [], [0]
    meta = None
    for split in ("train", "val", "test"):
        with open(os.path.join(basedir, f"transforms_{split}.json")) as fp:
            meta = json.load(fp)
        skip = 1 if (split == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"], np.float32))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)  # keep RGBA
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(np.array(poses, np.float32))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    focal, _ = intrinsics_from_fov(H, W, float(meta["camera_angle_x"]))
    render_poses = hemisphere_render_poses()

    if half_res:
        H, W, focal = H // 2, W // 2, focal / 2.0
        half = np.zeros((imgs.shape[0], H, W, imgs.shape[-1]), np.float32)
        for i, img in enumerate(imgs):
            half[i] = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        imgs = half

    return SceneData(imgs, poses, render_poses, [H, W, focal], i_split)


def _load_blender2_family(
    basedir: str,
    json_name_fn,
    folder_splits=("train", "val", "test"),
    skips=None,
    half_res: bool = True,
    with_depth: bool = False,
    near_plane: float = 2.0,
    far_plane: float = 6.0,
    train_skip: int = 1,
    depth_path_fn=None,
    synth_video: bool = False,
) -> SceneData:
    """Shared frame-walking core for the blender2 / fixed-dist / depth
    loaders (they differ only in json naming, per-split skip, and whether
    depth maps are read)."""
    import cv2

    skips = skips or {"train": train_skip, "val": 1, "test": 8}
    downsample = 2 if half_res else 1

    all_imgs: List[np.ndarray] = []
    all_depths: List[np.ndarray] = []
    all_valid: List[np.ndarray] = []
    all_poses: List[np.ndarray] = []
    all_intr: List[np.ndarray] = []
    counts = [0]
    H = W = 0
    focal = 0.0

    for split in folder_splits:
        json_path = os.path.join(basedir, json_name_fn(split))
        if not os.path.exists(json_path):
            if split == "video" and synth_video and H > 0:
                # missing video json: synthesize 40 spherical poses
                # (reference depth_supervised_exps/data/load_scene_blender.py
                # :606-622)
                vposes = hemisphere_render_poses(40)
                all_poses.append(vposes.astype(np.float32))
                all_intr.append(np.repeat(
                    np.array([(focal, focal, W / 2.0, H / 2.0)], np.float32),
                    len(vposes), axis=0))
                counts.append(counts[-1] + len(vposes))
                continue
            counts.append(counts[-1])
            continue
        with open(json_path) as fp:
            meta = json.load(fp)
        camera_angle_x = float(meta["camera_angle_x"])

        imgs, depths, valids, poses, intr = [], [], [], [], []
        for frame in meta["frames"][::skips[split]]:
            if len(frame["file_path"]) != 0:
                img = read_image_rgb(
                    os.path.join(basedir, frame["file_path"] + ".png"),
                    downsample=downsample,
                )
                imgs.append(img)
                if with_depth:
                    max_depth = frame["max_depth"]
                    dp = frame["depth_file_path"]
                    dpath = os.path.join(
                        basedir,
                        depth_path_fn(dp) if depth_path_fn is not None
                        else dp[:-1] + ".png",
                    )
                    d = cv2.imread(dpath, cv2.IMREAD_UNCHANGED).astype(np.float64)
                    d = (d / (255.0 / max_depth)).astype(np.float32)
                    if d.ndim == 2:
                        d = d[..., None]
                    valid = np.logical_and(
                        d[:, :, 0] > near_plane, d[:, :, 0] < far_plane
                    )
                    depths.append(np.clip(d, near_plane, far_plane))
                    valids.append(valid)
            poses.append(np.array(frame["transform_matrix"], np.float32))
            if imgs:  # dims from the last actually-read image
                H, W = imgs[-1].shape[:2]
                focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
            if H == 0:
                raise ValueError(
                    f"{json_path}: first frame has an empty file_path; "
                    "cannot infer image dimensions")
            intr.append(np.array((focal, focal, W / 2.0, H / 2.0), np.float32))

        counts.append(counts[-1] + len(poses))
        if imgs:
            all_imgs.append(np.array(imgs))
            if with_depth:
                all_depths.append(np.array(depths))
                all_valid.append(np.array(valids))
        all_poses.append(np.array(poses, np.float32))
        all_intr.append(np.array(intr, np.float32))

    i_split = [
        np.arange(counts[i], counts[i + 1]) for i in range(len(folder_splits))
    ]
    data = SceneData(
        images=np.concatenate(all_imgs, 0),
        poses=np.concatenate(all_poses, 0),
        render_poses=hemisphere_render_poses(),
        hwf=[H, W, focal],
        i_split=i_split,
        intrinsics=np.concatenate(all_intr, 0),
        near=near_plane,
        far=far_plane,
    )
    if with_depth:
        data.depths = np.concatenate(all_depths, 0)
        data.valid_depths = np.concatenate(all_valid, 0)
        data.gt_depths = data.depths
        data.gt_valid_depths = data.valid_depths
    return data


def load_blender2(basedir: str, half_res: bool = True) -> SceneData:
    return _load_blender2_family(
        basedir, lambda s: f"{s}_transforms.json", half_res=half_res,
        skips={"train": 1, "val": 1, "test": 8},
    )


def load_blender_fixed_dist(
    basedir: str, half_res: bool = True, train_dist: float = 1.0,
    test_dist: float = 1.0, val_dist: float = 1.0,
) -> SceneData:
    dists = {"train": train_dist, "val": val_dist, "test": test_dist}
    return _load_blender2_family(
        basedir,
        lambda s: f"transforms_radius{dists[s]}_{s}.json",
        half_res=half_res,
        skips={"train": 1, "val": 1, "test": 4},
    )


def load_blender2_depth(
    basedir: str, half_res: bool = True, train_skip: int = 1,
    near_plane: float = 2.0,
) -> SceneData:
    return _load_blender2_family(
        basedir, lambda s: f"{s}_transforms.json", half_res=half_res,
        with_depth=True, near_plane=near_plane, train_skip=train_skip,
        skips={"train": train_skip, "val": 1, "test": 8, "video": 1},
        folder_splits=("train", "val", "test", "video"), synth_video=True,
    )


def load_blender_depth(
    basedir: str, half_res: bool = True, train_skip: int = 1,
    near_plane: float = 2.0,
) -> SceneData:
    """``transforms_{split}.json`` naming with a 4th ``video`` split
    (synthesized spherical poses when absent); depth png path is
    ``depth_file_path + "0000.png"`` ("0001" for non-chair scenes) —
    reference load_scene_blender_depth (depth_supervised_exps/data/
    load_scene_blender.py:521-635, suffix quirk at :568-571)."""
    suffix = "0000.png" if "chair" in basedir else "0001.png"
    return _load_blender2_family(
        basedir, lambda s: f"transforms_{s}.json", half_res=half_res,
        with_depth=True, near_plane=near_plane, train_skip=train_skip,
        skips={"train": train_skip, "val": 1, "test": 8, "video": 1},
        folder_splits=("train", "val", "test", "video"), synth_video=True,
        depth_path_fn=lambda dp: dp + suffix,
    )


def apply_background(images: np.ndarray, white_bkgd: bool) -> np.ndarray:
    if white_bkgd:
        return composite_white_background(images)
    return strip_alpha(images)
