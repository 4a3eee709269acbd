"""Training observability: JSONL metrics log + optional TensorBoard.

The reference logs mse/psnr scalars and val images to TensorBoard
(run_plnerf.py:1195,1335-1397).  Here every scalar goes to an append-only
``metrics.jsonl`` (machine-readable, survives without TB) and, when the
``tensorboard`` package is importable, to TB event files as well.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        rec = {"step": int(step), "ts": time.time()}
        for k, v in values.items():
            rec[prefix + k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(prefix + k, float(v), int(step))

    def image(self, step: int, tag: str, img) -> None:
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(img)
            if arr.ndim == 3 and arr.shape[-1] in (1, 3, 4):
                arr = arr.transpose(2, 0, 1)
            self._tb.add_image(tag, arr, int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
