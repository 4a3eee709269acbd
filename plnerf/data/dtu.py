"""DTU multi-view stereo loaders.

Behavioral reference: load_dtu.py.
* ``load_dtu``: Rectified/scan{id}_train pngs (lighting 3) + Cameras/train
  txt files; intrinsics x4 then x downsample; extrinsic translation scaled
  by 1/200; near/far from per-view depth ranges (load_dtu.py:47-130).
* ``load_dtu2``: scan{id}/cameras.npz world matrices decomposed into K/R/t,
  scale-normalized, averaged intrinsics, near/far 0.1/5.0
  (load_dtu.py:135-214).

Both use the every-8th-view test split unless an explicit split is given.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .common import hemisphere_render_poses

N_VIEWS = 49
LIGHTING_ID = 3
_OPENCV2BLENDER = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], np.float32
)


def _default_split(train_split: Optional[List[int]], num_train: int):
    if train_split is None:
        i_test = list(range(N_VIEWS))[::8]
        i_train = [i for i in range(N_VIEWS) if i not in i_test]
    else:
        assert len(train_split) == num_train
        i_train = train_split
        i_test = [i for i in range(N_VIEWS) if i not in i_train]
    return i_train, i_test


def _read_cam_file(path: str, scale_factor: float):
    with open(path) as f:
        lines = [ln.rstrip() for ln in f.readlines()]
    extr = np.fromstring(" ".join(lines[1:5]), np.float32, sep=" ").reshape(4, 4)
    extr = extr @ _OPENCV2BLENDER
    intr = np.fromstring(" ".join(lines[7:10]), np.float32, sep=" ").reshape(3, 3)
    d0, dint = lines[11].split()[:2]
    depth_min = float(d0) * scale_factor
    depth_max = depth_min + float(dint) * 192 * scale_factor
    return intr, extr, (depth_min, depth_max)


def _read_view(root_dir, scene_id, vid, downsample):
    from PIL import Image

    path = os.path.join(
        root_dir,
        f"Rectified/scan{scene_id}_train/rect_{vid + 1:03d}_{LIGHTING_ID}_r5000.png",
    )
    img = Image.open(path)
    wh = np.round(np.array(img.size) * downsample).astype(int)
    img = img.resize(wh, Image.BILINEAR)
    return np.array(img, np.float32) / 255.0


def load_dtu(root_dir: str, scene_id: int, num_train: int = 42,
             scale_factor: float = 1.0 / 200.0, half_res: bool = True,
             train_split=None):
    """Returns (imgs, intrinsics[3x3 per view], poses, render_poses,
    hwf, i_split, near, far, [i_train, i_test]).

    Pose convention matches the reference VERBATIM: load_dtu.py:71-130
    returns the transformed cam-file extrinsic itself (its read_poses
    labels it ``w2c`` and also computes the inverse, but the driver is fed
    the un-inverted matrix) — reproduced here so reference-format DTU data
    renders identically; documented as a quirk rather than "fixed"."""
    i_train, i_test = _default_split(train_split, num_train)
    downsample = 0.5 if half_res else 1.0

    imgs, intrinsics, c2ws, near_fars = [], [], [], []
    H = W = 0
    focal = 0.0
    for vid in list(i_train) + list(i_test):
        img = _read_view(root_dir, scene_id, vid, downsample)
        imgs.append(img)
        intr, extr, nf = _read_cam_file(
            os.path.join(root_dir, f"Cameras/train/{vid:08d}_cam.txt"),
            scale_factor,
        )
        intr = intr.copy()
        intr[:2] *= 4  # rectified images are 4x the camera-file resolution
        extr = extr.copy()
        extr[:3, 3] *= scale_factor
        intr[:2] *= downsample
        intrinsics.append(intr)
        c2ws.append(extr)  # reference returns the un-inverted matrix
        near_fars.append(nf)
        H, W = img.shape[:2]
        focal = intr[0, 0]

    near = min(nf[0] for nf in near_fars)
    far = max(nf[1] for nf in near_fars)
    counts = [0, len(i_train), N_VIEWS]
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(2)]

    return (
        np.stack(imgs).astype(np.float32),
        np.stack(intrinsics).astype(np.float32),
        np.stack(c2ws).astype(np.float32),
        hemisphere_render_poses(),
        [H, W, focal],
        i_split,
        near,
        far,
        [i_train, i_test],
    )


def load_dtu2(root_dir: str, scene_id: int, num_train: int = 42,
              half_res: bool = True, train_split=None):
    """IDR-style layout: scan{id}/image/%06d.png + cameras.npz."""
    import cv2
    from PIL import Image

    scene_dir = os.path.join(root_dir, f"scan{scene_id}")
    all_cam = np.load(os.path.join(scene_dir, "cameras.npz"))
    downsample = 0.5 if half_res else 1.0

    fx = fy = cx = cy = 0.0
    imgs, poses = [], []
    H = W = 0
    for i in range(N_VIEWS):
        img = Image.open(os.path.join(scene_dir, "image", f"{i:06d}.png"))
        wh = np.round(np.array(img.size) * downsample).astype(int)
        W, H = int(wh[0]), int(wh[1])
        img = img.resize(wh, Image.BILINEAR)
        imgs.append(np.array(img, np.float32) / 255.0)

        P = all_cam[f"world_mat_{i}"][:3]
        K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
        K = K / K[2, 2]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R.transpose()
        pose[:3, 3] = (t[:3] / t[3])[:, 0]

        scale_mtx = all_cam.get(f"scale_mat_{i}")
        if scale_mtx is not None:
            pose[:3, 3:] -= scale_mtx[:3, 3:]
            pose[:3, 3:] /= np.diagonal(scale_mtx[:3, :3])[..., None]

        fx += K[0, 0] * downsample
        fy += K[1, 1] * downsample
        cx += K[0, 2] * downsample
        cy += K[1, 2] * downsample
        poses.append(_OPENCV2BLENDER @ pose @ _OPENCV2BLENDER)

    fx, fy, cx, cy = (v / N_VIEWS for v in (fx, fy, cx, cy))
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    i_train, i_test = _default_split(train_split, num_train)
    order = list(i_train) + list(i_test)
    imgs = np.stack([imgs[i] for i in order]).astype(np.float32)
    poses = np.stack([poses[i] for i in order]).astype(np.float32)
    counts = [0, len(i_train), N_VIEWS]
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(2)]

    return (
        imgs, K, poses, hemisphere_render_poses(), [H, W, fx], i_split,
        0.1, 5.0, [i_train, i_test],
    )


def build_json_for_dtu(splits, intrinsics, poses, near, far):
    """Split-dump dict written to <expname>/split.json by the DTU branch of
    the driver (reference run_plnerf.py:44-65)."""
    i_train, i_test = splits
    def frames(idx):
        return [
            {
                "extrinsic": np.asarray(poses[i]).tolist(),
                "intrinsic": np.asarray(intrinsics[i]).tolist(),
                "pose_id": int(i),
            }
            for i in idx
        ]
    return {
        "near": float(near),
        "far": float(far),
        "train_frames": frames(i_train),
        "test_frames": frames(i_test),
    }
