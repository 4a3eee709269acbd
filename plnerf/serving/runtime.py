"""Loader/runner for serving artifacts written by ``serving.export``.

``ServingRenderer`` wraps the deserialized module: it pads an arbitrary
ray count to the baked chunk size, loops chunks (one device dispatch
each — the same batching the reference's ``batchify_rays`` does in
python, run_plnerf.py:115-133), and reassembles full-size outputs.
``render_image`` reproduces the eval frontend's ray packing
(eval/images.render_image) so a client needs only camera geometry.

The module file is self-contained (weights embedded) — this runtime
never touches checkpoints and needs no model configuration beyond the
manifest.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core import render
from ..core import rays as raysmod
from .export import (MANIFEST_FILE, MODULE_FILE, MODULE_FUSED_FILE,
                     WEIGHTS_FILE)


class ServingRenderer:
    def __init__(self, manifest: dict, exported, devices=None,
                 fused=None, weight_leaves=None):
        self.manifest = manifest
        self.chunk = int(manifest["chunk"])
        self.ray_dim = int(manifest["ray_dim"])
        self.devices = list(devices) if devices else None
        self.fused_n_rays = manifest.get("fused_n_rays")
        if weight_leaves is None:
            self._call = jax.jit(exported.call)
            self._fused_call = (jax.jit(fused.call)
                                if fused is not None else None)
        else:
            # weights_mode="args": stage the leaves once per serving
            # device; they stay resident across every dispatch (measured
            # 1.18x vs baked constants, BASELINE.md round-4 serving
            # decomposition)
            devs = self.devices or [None]
            staged = [tuple(jax.device_put(l, d) for l in weight_leaves)
                      for d in devs]
            self._staged = {(d.id if d else None): w
                            for d, w in zip(devs, staged)}
            raw = jax.jit(exported.call)
            self._call = lambda rays, seed: raw(
                self._staged[getattr(
                    getattr(rays, "device", None), "id", None)
                    if self.devices else None], rays, seed)
            # fused whole-image path: single-device only (render_rays
            # guards it with `not self.devices`), and with devices= the
            # staged dict is keyed by device ids — so only build the
            # callable when its None key actually exists (ADVICE r4)
            fraw = (jax.jit(fused.call)
                    if fused is not None and not self.devices else None)
            self._fused_call = (
                (lambda rays, seed: fraw(self._staged[None], rays, seed))
                if fraw is not None else None)

    @classmethod
    def load(cls, artifact_dir: str, devices=None) -> "ServingRenderer":
        """``devices``: optional list of jax devices to serve on —
        chunks round-robin across them and execute concurrently (the
        render is embarrassingly parallel over rays; the multi-chip
        analogue of eval/images' shard_map renderer, without needing
        the model code).  Default: the backend's default device."""
        with open(os.path.join(artifact_dir, MANIFEST_FILE)) as f:
            manifest = json.load(f)
        if manifest.get("format_version") != 1:
            raise ValueError(
                f"unsupported artifact format: {manifest.get('format_version')}")
        with open(os.path.join(artifact_dir, MODULE_FILE), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        fused = None
        fpath = os.path.join(artifact_dir, MODULE_FUSED_FILE)
        if manifest.get("fused_n_rays") and os.path.exists(fpath):
            with open(fpath, "rb") as f:
                fused = jax.export.deserialize(bytearray(f.read()))
        weight_leaves = None
        if manifest.get("weights_mode") == "args":
            wz = np.load(os.path.join(artifact_dir, WEIGHTS_FILE))
            n = int(manifest["n_weight_leaves"])
            weight_leaves = [wz[f"arr_{i}"] for i in range(n)]
        return cls(manifest, exported, devices=devices, fused=fused,
                   weight_leaves=weight_leaves)

    def render_rays(self, rays, seed: int = 0,
                    keys: Optional[Sequence[str]] = None
                    ) -> Dict[str, np.ndarray]:
        """rays: [n, ray_dim] packed like core.render.make_ray_batch
        (origin, dir, near, far[, viewdir]).  Any n >= 1.

        Dispatch is async: every chunk is enqueued (round-robin over
        ``self.devices`` when set) before any result is fetched, so
        chunks overlap host packing and, multi-device, run
        concurrently.  Per-chunk rng (seed + chunk index) is placement-
        independent — the same rays give the same image on 1 or N
        devices.

        ``keys``: fetch only these output maps (default: all).  The
        device program always computes every output, but D2H through
        the relay is the dominant host cost at image scale — fetching
        rgb_map alone measures 3.38 vs 4.06 s/img at 800²
        (BASELINE.md round-4 serving decomposition, fetch-volume probe).

        Accepts numpy or jax arrays; device arrays stay resident (the
        round-3 runtime forced ``np.asarray`` here, paying a D2H+H2D
        round trip on rays already computed on device by
        ``render_image`` — see BASELINE.md serving-profile)."""
        if not isinstance(rays, jax.Array):
            rays = np.asarray(rays, np.float32)
        if rays.ndim != 2 or rays.shape[1] != self.ray_dim:
            raise ValueError(
                f"expected rays [n, {self.ray_dim}], got {rays.shape}")
        n = rays.shape[0]
        rays = jnp.asarray(rays, jnp.float32)
        pad = (-n) % self.chunk
        if pad:
            rays = jnp.concatenate(
                [rays, jnp.broadcast_to(rays[-1:], (pad, self.ray_dim))], 0)
        want = (None if keys is None else set(keys))
        if (self._fused_call is not None and not self.devices
                and rays.shape[0] == self.fused_n_rays):
            # single-dispatch whole-batch module (the eval frontend's
            # exact program, incl. its split-per-chunk key semantics)
            out = self._fused_call(rays, jnp.uint32(seed))
            return {k: np.asarray(v)[:n] for k, v in out.items()
                    if want is None or k in want}
        outs = []
        for i in range(rays.shape[0] // self.chunk):
            cb = rays[i * self.chunk:(i + 1) * self.chunk]
            sd = jnp.uint32(np.uint32(seed) + np.uint32(i))
            if self.devices:
                dev = self.devices[i % len(self.devices)]
                cb = jax.device_put(cb, dev)
                sd = jax.device_put(sd, dev)
            ret = self._call(cb, sd)
            outs.append(ret if want is None
                        else {k: v for k, v in ret.items() if k in want})
        out = jax.tree.map(lambda *xs: np.concatenate(
            [np.asarray(x) for x in xs], 0), *outs)
        return {k: v[:n] for k, v in out.items()}

    def render_image(self, c2w, hwf, K, near: float = 2.0,
                     far: float = 6.0, ndc: bool = False,
                     seed: int = 0,
                     keys: Optional[Sequence[str]] = None
                     ) -> Dict[str, np.ndarray]:
        """Render one full image from camera geometry (same packing as
        eval/images.render_image; H/W/focal from ``hwf``).  ``keys``:
        fetch only these maps — see render_rays."""
        H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])
        c2w = jnp.asarray(c2w)[:3, :4]
        rays_o, rays_d = raysmod.get_rays(H, W, np.asarray(K), c2w)
        packed, _ = render.make_ray_batch(
            rays_o, rays_d, near, far, self.manifest["use_viewdirs"],
            ndc, H, W, focal)
        out = self.render_rays(packed, seed=seed, keys=keys)
        return {k: v.reshape(H, W, *v.shape[1:]) for k, v in out.items()}
