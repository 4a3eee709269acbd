"""Small shared utilities (reference run_nerf_helpers.py:16-20,536-570)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def to16b(x) -> np.ndarray:
    return ((2 ** 16 - 1) * np.clip(np.asarray(x), 0, 1)).astype(np.uint16)


def compute_rmse(prediction, target):
    return jnp.sqrt(jnp.mean((prediction - target) ** 2))


class MeanTracker:
    """Running weighted means of metric dicts (reference
    run_nerf_helpers.py:541-570)."""

    def __init__(self):
        self.reset()

    def add(self, metrics: dict, weight: float = 1.0):
        for key, value in metrics.items():
            prev = self.mean_dict.get(key, 0.0)
            self.mean_dict[key] = (prev * self.total_weight + value) / (
                self.total_weight + weight
            )
        self.total_weight += weight

    def has(self, key):
        return key in self.mean_dict

    def get(self, key):
        return self.mean_dict[key]

    def as_dict(self):
        return dict(self.mean_dict)

    def reset(self):
        self.mean_dict = {}
        self.notes = {}
        self.total_weight = 0.0

    def note(self, key: str, text: str):
        """Non-numeric annotation printed alongside the means (e.g.
        ``lpips: UNAVAILABLE (...)`` when no weights file exists — an eval
        consumer diffing metrics.txt against the reference must see the
        metric named, not silently missing)."""
        self.notes[key] = text

    def print(self, f=None):
        for key, value in self.mean_dict.items():
            print(f"{key}: {value}", file=f)
        for key, text in self.notes.items():
            print(f"{key}: {text}", file=f)
