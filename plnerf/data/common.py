"""Shared dataset helpers: spherical camera paths and image IO.

Conventions match the reference loaders (load_blender.py:10-50,
load_dtu.py:19-44): OpenGL camera axes, hemisphere render paths of 40
poses at radius 4, cv2 BGR->RGB reads that keep alpha when present.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _rot_xyz(phi: float, theta: float, radius: float) -> np.ndarray:
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rx = np.eye(4, dtype=np.float32)
    rx[1, 1], rx[1, 2] = np.cos(phi), -np.sin(phi)
    rx[2, 1], rx[2, 2] = np.sin(phi), np.cos(phi)
    ry = np.eye(4, dtype=np.float32)
    ry[0, 0], ry[0, 2] = np.cos(theta), -np.sin(theta)
    ry[2, 0], ry[2, 2] = np.sin(theta), np.cos(theta)
    return ry @ rx @ trans


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Camera-to-world for a camera on a sphere looking at the origin."""
    c2w = _rot_xyz(np.deg2rad(phi_deg), np.deg2rad(theta_deg), radius)
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ c2w


def hemisphere_render_poses(n: int = 40, phi: float = -30.0,
                            radius: float = 4.0) -> np.ndarray:
    """The standard 40-pose spiral used by every blender-family loader."""
    angles = np.linspace(-180, 180, n + 1)[:-1]
    return np.stack([pose_spherical(a, phi, radius) for a in angles], 0)


def read_image_rgb(path: str, downsample: Optional[float] = None,
                   keep_alpha: bool = True) -> np.ndarray:
    """cv2 read, BGR(A)->RGB(A), [0,1] float32, optional bilinear
    downsample by an integer factor (reference read_files,
    load_blender.py:36-50)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if downsample is not None and downsample != 1:
        img = cv2.resize(
            img,
            (int(img.shape[1] / downsample), int(img.shape[0] / downsample)),
            interpolation=cv2.INTER_LINEAR,
        )
    if img.ndim == 3 and img.shape[-1] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    elif img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = (img / 255.0).astype(np.float32)
    if not keep_alpha and img.ndim == 3 and img.shape[-1] == 4:
        img = img[..., :3]
    return img


def intrinsics_from_fov(H: int, W: int, camera_angle_x: float):
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    K = np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32
    )
    return focal, K


def composite_white_background(images: np.ndarray) -> np.ndarray:
    """RGBA -> RGB over white (reference run_plnerf.py:1022-1025)."""
    if images.shape[-1] == 4:
        return images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
    return images


def strip_alpha(images: np.ndarray) -> np.ndarray:
    return images[..., :3]
