"""On-the-fly tiny dataset fixtures in each reference file layout, backed
by the analytic sphere renderer.  Used by loader and CLI end-to-end tests."""
import json
import os

import numpy as np

from plnerf.data.synthetic import pose_spherical_np, render_sphere_image

H = W = 32
CAMERA_ANGLE_X = 0.6911112070083618  # blender lego default fov


def _write_png(path, img01, sixteen_bit=False):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    if sixteen_bit:
        arr = (np.clip(img01, 0, 1) * 65535).astype(np.uint16)
    else:
        arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 4:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGBA2BGRA)
    elif arr.ndim == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, arr)


def _focal():
    return 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)


def _render_rgba(c2w):
    rgb = render_sphere_image(c2w, H, W, _focal(), white_bkgd=False)
    # alpha from accumulated opacity: re-render with white to infer alpha
    white = render_sphere_image(c2w, H, W, _focal(), white_bkgd=True)
    alpha = 1.0 - np.clip((white - rgb).mean(-1), 0, 1)
    return np.concatenate([rgb, alpha[..., None]], -1)


def _poses(n, radius=4.0, seed=0):
    rng = np.random.default_rng(seed)
    thetas = np.linspace(-180, 180, n, endpoint=False)
    phis = rng.uniform(-40, -20, n)
    return [pose_spherical_np(t, p, radius) for t, p in zip(thetas, phis)]


def make_blender_scene(basedir, n_train=3, n_val=2, n_test=2):
    """transforms_{split}.json + {split}/r_i.png (RGBA)."""
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for si, (split, n) in enumerate(counts.items()):
        frames = []
        for i, c2w in enumerate(_poses(n, seed=si)):
            rel = f"./{split}/r_{i}"
            _write_png(
                os.path.join(basedir, split, f"r_{i}.png"), _render_rgba(c2w)
            )
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return basedir


def make_blender2_scene(basedir, n_train=3, n_test=2, with_depth=False):
    """{split}_transforms.json naming (blender2 family)."""
    counts = {"train": n_train, "test": n_test}
    for si, (split, n) in enumerate(counts.items()):
        frames = []
        for i, c2w in enumerate(_poses(n, seed=10 + si)):
            rel = f"./{split}/im_{i}"
            _write_png(
                os.path.join(basedir, split, f"im_{i}.png"), _render_rgba(c2w)
            )
            frame = {"file_path": rel, "transform_matrix": c2w.tolist()}
            if with_depth:
                max_depth = 8.0
                depth = np.full((H, W), 3.5, np.float32)
                # stored scaled by 255/max_depth in a 16-bit png; loader
                # divides by (255/max_depth)
                stored = depth * (255.0 / max_depth) / 65535.0
                dp = f"./{split}/d_{i}x"   # loader strips last char + .png
                _write_png(
                    os.path.join(basedir, split, f"d_{i}.png"),
                    stored, sixteen_bit=True,
                )
                frame["depth_file_path"] = dp
                frame["max_depth"] = max_depth
            frames.append(frame)
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        with open(os.path.join(basedir, f"{split}_transforms.json"), "w") as f:
            json.dump(meta, f)
    return basedir


def make_fixed_dist_scene(basedir, dists=(0.25, 1.0), n=2):
    """radius_{dist}_{split} folders (train at 1.0, test at each dist)."""
    all_dists = set(list(dists) + [1.0])
    for dist in sorted(all_dists):
        for split in ("train", "test"):
            if split == "train" and dist != 1.0:
                continue
            frames = []
            for i, c2w in enumerate(_poses(n, radius=4.0 * dist, seed=int(dist * 10))):
                rel = f"./radius_{dist}_{split}/r_{i}"
                _write_png(
                    os.path.join(basedir, f"radius_{dist}_{split}", f"r_{i}.png"),
                    _render_rgba(c2w),
                )
                frames.append({"file_path": rel, "transform_matrix": c2w.tolist()})
            meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
            name = f"transforms_radius{dist}_{split}.json"
            with open(os.path.join(basedir, name), "w") as f:
                json.dump(meta, f)
    return basedir


def make_llff_scene(basedir, n=6):
    """images/ + poses_bounds.npy, forward-facing cluster."""
    os.makedirs(os.path.join(basedir, "images"), exist_ok=True)
    poses_rows = []
    focal = _focal()
    for i in range(n):
        c2w = pose_spherical_np(-5 + 2 * i, -30 + i, 4.0)
        img = render_sphere_image(c2w, H, W, focal, white_bkgd=True)
        _write_png(os.path.join(basedir, "images", f"img{i:03d}.png"), img)
        # poses_bounds row: 3x5 [ (down right back) | t | hwf ] + 2 bounds —
        # built from our c2w whose columns are (right, up, back)
        R = c2w[:3, :3]
        m = np.stack([-R[:, 1], R[:, 0], R[:, 2]], 1)
        m = np.concatenate([m, c2w[:3, 3:4]], 1)
        hwf = np.array([[H], [W], [focal]], np.float32)
        row = np.concatenate([m, hwf], 1).reshape(-1)
        row = np.concatenate([row, [2.0, 6.0]])
        poses_rows.append(row)
    np.save(os.path.join(basedir, "poses_bounds.npy"), np.stack(poses_rows))
    return basedir


def make_dtu_scene(root_dir, scene_id=5):
    """DTU layout: Rectified/scan{id}_train/rect_{i+1:03d}_3_r5000.png (49
    views) + Cameras/train/{i:08d}_cam.txt in the MVSNet text format."""
    import numpy as np

    from plnerf.data.dtu import _OPENCV2BLENDER, N_VIEWS

    img_dir = os.path.join(root_dir, f"Rectified/scan{scene_id}_train")
    cam_dir = os.path.join(root_dir, "Cameras/train")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(cam_dir, exist_ok=True)
    sf = 1.0 / 200.0
    inv_cv2b = np.linalg.inv(_OPENCV2BLENDER)
    for i in range(N_VIEWS):
        c2w = pose_spherical_np(-180 + i * 360.0 / N_VIEWS, -30.0, 4.0)
        img = render_sphere_image(c2w, H, W, _focal(), white_bkgd=True)
        _write_png(os.path.join(img_dir, f"rect_{i + 1:03d}_3_r5000.png"),
                   img)
        # loader: pose = (file @ CV2B) with translation scaled by sf
        # (reference returns the un-inverted matrix as the pose)
        target = c2w.copy()
        target[:3, 3] /= sf
        file_extr = target @ inv_cv2b
        # loader: K_file * 4 * downsample must equal our pinhole K
        K = np.array([[_focal(), 0, W / 2], [0, _focal(), H / 2],
                      [0, 0, 1]], np.float64) / 4.0
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.8f}" for v in row) for row in file_extr]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.8f}" for v in row) for row in K]
        lines += ["", "400.0 4.1667"]   # near 2.0, far ~6.0 after sf
        with open(os.path.join(cam_dir, f"{i:08d}_cam.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root_dir


def make_dtu2_scene(root_dir, scene_id=5):
    """IDR-style DTU layout: scan{id}/image/%06d.png (49 views) +
    cameras.npz with world_mat_i (P = K @ [R|t]) and scale_mat_i."""
    from plnerf.data.dtu import N_VIEWS

    scene_dir = os.path.join(root_dir, f"scan{scene_id}")
    img_dir = os.path.join(scene_dir, "image")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    cams = {}
    for i in range(N_VIEWS):
        c2w = pose_spherical_np(-180 + i * 360.0 / N_VIEWS, -30.0, 4.0)
        img = render_sphere_image(c2w, H, W, _focal(), white_bkgd=True)
        _write_png(os.path.join(img_dir, f"{i:06d}.png"), img)
        # synthetic but well-formed projection: proper rotation (QR with
        # positive-diagonal fix), camera center near the sphere shell
        q, r = np.linalg.qr(rng.normal(size=(3, 3)))
        q = q * np.sign(np.diagonal(r))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        center = rng.normal(size=3) * 0.5 + np.array([0.0, 0.0, 4.0])
        t = -q @ center
        K = np.array([[2 * _focal(), 0, W / 2],
                      [0, 2 * _focal(), H / 2], [0, 0, 1.0]])
        P = np.eye(4)
        P[:3] = K @ np.concatenate([q, t[:, None]], axis=1)
        cams[f"world_mat_{i}"] = P
        scale = np.eye(4)
        scale[0, 0] = scale[1, 1] = scale[2, 2] = 2.5
        scale[:3, 3] = [0.1, -0.2, 0.3]
        cams[f"scale_mat_{i}"] = scale
    np.savez(os.path.join(scene_dir, "cameras.npz"), **cams)
    return root_dir
