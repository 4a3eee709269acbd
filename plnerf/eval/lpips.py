"""LPIPS (AlexNet backbone) as a pure-JAX metric.

The reference evaluates LPIPS with the ``lpips`` pip package
(run_plnerf.py:22,1163 — ``lpips.LPIPS(net="alex")`` called with
``normalize=True`` at :340).  That package is CUDA/torch and downloads
pretrained torchvision weights; here the same computation is expressed in
JAX (NHWC convs on the MXU) with a loader that ingests a torch state dict
(either the torchvision AlexNet ``features.*`` + lpips ``lin*`` heads, or a
fully merged dict).  Without pretrained weights the metric is not
meaningful — callers must pass a weights file; tests exercise the
architecture with random weights.

Pipeline (lpips v0.1 semantics):
  x in [0,1] -> 2x-1 -> (x - shift)/scale -> AlexNet relu1..relu5 features
  -> channelwise unit-normalize -> squared diff -> 1x1 "lin" conv (no bias)
  -> spatial mean -> sum over the 5 stages.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

# torchvision AlexNet feature extractor: (out_ch, kernel, stride, pad),
# with max-pools after stages 1, 2 and 5.
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # pool between stage i and i+1 (and one after 5, unused)
_CHANNELS = [64, 192, 384, 256, 256]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    # x: NHWC, w: HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b if b is not None else y


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _features(params, x):
    """relu1..relu5 feature maps of the AlexNet trunk."""
    feats = []
    h = x
    for i, (_, _, stride, pad) in enumerate(_ALEX):
        h = jax.nn.relu(_conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"],
                              stride, pad))
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


@jax.jit
def _lpips_apply(params: Dict[str, jnp.ndarray], img: jnp.ndarray,
                 ref: jnp.ndarray) -> jnp.ndarray:
    """img, ref: [N, H, W, 3] in [0, 1].  Returns [N] distances."""
    def prep(x):
        x = 2.0 * x - 1.0
        return (x - _SHIFT) / _SCALE

    fa = _features(params, prep(img))
    fb = _features(params, prep(ref))
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = params[f"lin{i}_w"]          # [C, 1]
        val = jnp.einsum("nhwc,co->nhwo", d, w)
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


class LPIPS:
    """Callable LPIPS metric.  ``lp(img_hw3, ref_hw3) -> float``."""

    def __init__(self, params: Dict[str, jnp.ndarray]):
        self.params = params

    def __call__(self, img, ref) -> float:
        img = jnp.asarray(img, jnp.float32)[None]
        ref = jnp.asarray(ref, jnp.float32)[None]
        return float(_lpips_apply(self.params, img, ref)[0])

    # ---- constructors ----

    @classmethod
    def init_random(cls, key: jax.Array) -> "LPIPS":
        """Random weights — architecture/shape testing only."""
        params = {}
        in_ch = 3
        for i, (out_ch, k, _, _) in enumerate(_ALEX):
            key, k1 = jax.random.split(key)
            params[f"conv{i}_w"] = jax.random.normal(
                k1, (k, k, in_ch, out_ch), jnp.float32
            ) * (1.0 / np.sqrt(k * k * in_ch))
            params[f"conv{i}_b"] = jnp.zeros((out_ch,), jnp.float32)
            in_ch = out_ch
        for i, c in enumerate(_CHANNELS):
            key, k1 = jax.random.split(key)
            params[f"lin{i}_w"] = jnp.abs(
                jax.random.normal(k1, (c, 1), jnp.float32)
            ) / c
        return cls(params)

    @classmethod
    def from_torch_state_dict(cls, sd: Dict[str, Any]) -> "LPIPS":
        """Build from torch tensors/ndarrays.

        Accepts torchvision naming (``features.{0,3,6,8,10}.weight/bias``),
        lpips-package naming (``net.slice{1..5}.*`` merged in), and heads as
        ``lin{0..4}.model.1.weight`` / ``lins.{i}.model.1.weight``.
        """
        def to_np(v):
            if hasattr(v, "detach"):
                v = v.detach().cpu().numpy()
            return np.asarray(v, np.float32)

        sd = {k: v for k, v in sd.items()}
        params: Dict[str, jnp.ndarray] = {}
        conv_idx = [0, 3, 6, 8, 10]  # positions in torchvision features
        for i, ci in enumerate(conv_idx):
            cands = [
                f"features.{ci}.weight",
                f"net.features.{ci}.weight",
                f"net.slice{i + 1}.{ci}.weight",
            ]
            wk = next((c for c in cands if c in sd), None)
            if wk is None:
                raise KeyError(f"AlexNet conv {i} weights not found "
                               f"(tried {cands})")
            w = to_np(sd[wk])                      # OIHW
            b = to_np(sd[wk.replace("weight", "bias")])
            params[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
            params[f"conv{i}_b"] = jnp.asarray(b)
        for i, c in enumerate(_CHANNELS):
            cands = [
                f"lin{i}.model.1.weight",
                f"lins.{i}.model.1.weight",
                f"lin{i}.weight",
            ]
            wk = next((k for k in cands if k in sd), None)
            if wk is None:
                raise KeyError(f"LPIPS lin head {i} not found (tried {cands})")
            w = to_np(sd[wk]).reshape(1, c)        # [1, C, 1, 1] -> [1, C]
            params[f"lin{i}_w"] = jnp.asarray(w.T)
        return cls(params)

    @classmethod
    def from_npz(cls, path: str) -> "LPIPS":
        """Load the torch-free ``.npz`` produced by
        ``tools/export_lpips_weights.py`` (keys exactly ``conv{i}_w`` HWIO,
        ``conv{i}_b``, ``lin{i}_w`` [C, 1])."""
        with np.load(path) as z:
            params = {k: jnp.asarray(z[k], jnp.float32) for k in z.files}
        for i in range(5):
            for k in (f"conv{i}_w", f"conv{i}_b", f"lin{i}_w"):
                if k not in params:
                    raise KeyError(f"{path}: missing LPIPS tensor {k}")
        return cls(params)

    @classmethod
    def from_file(cls, path: str) -> "LPIPS":
        """Load exported ``.npz`` (preferred, torch-free) or a merged torch
        checkpoint (torch required on host only)."""
        if path.endswith(".npz"):
            return cls.from_npz(path)
        import torch

        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return cls.from_torch_state_dict(sd)


def default_weights_path() -> Optional[str]:
    """Documented weights locations, first hit wins:
    ``$PLNERF_LPIPS_WEIGHTS`` then ``<repo>/weights/lpips_alex.npz``."""
    import os

    env = os.environ.get("PLNERF_LPIPS_WEIGHTS")
    if env and os.path.isfile(env):
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(repo, "weights", "lpips_alex.npz")
    return cand if os.path.isfile(cand) else None


def load_lpips(weights_path: Optional[str]) -> Optional[LPIPS]:
    """CLI helper: returns a metric callable or None (metric skipped,
    which the eval harness reports loudly in metrics.txt).  With no
    explicit path, falls back to ``default_weights_path()``."""
    path = weights_path or default_weights_path()
    if not path:
        return None
    return LPIPS.from_file(path)
