"""Train state: params + optimizer states + step, as one pytree.

Mirrors the reference's training quantities (model/model_fine + Adam(s) +
global_step, run_plnerf.py:417-502) in a functional JAX layout.  The same
structure serves the NVS trainers (two optimizers), the vanilla trainer
(one joint optimizer, stored in ``opt_fine`` with ``opt_coarse`` empty) and
the depth trainer (joint optimizer + per-image depth scale/shift with their
own Adam).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                      # scalar int32
    params_coarse: Any
    params_fine: Optional[Any]
    opt_coarse: Optional[Any]
    opt_fine: Any
    # depth-supervision extras (None for NVS):
    depth_scales: Optional[Any] = None     # [n_images, 1]
    depth_shifts: Optional[Any] = None     # [n_images, 1]
    opt_ss: Optional[Any] = None
    cam_embeddings: Optional[Any] = None   # [n_images, input_ch_cam]
    # Adam state for cam_embeddings when trained (--opt_ch_cam).  The
    # reference declares this intent (run_nerf_sample_based_depth.py:1164
    # steps an ``optimizer_latent``) but ships it broken: the optimizer is
    # never created (NameError) and ``embedcam_fn[img_i]`` indexes an
    # nn.Embedding module (TypeError).  Here the path works; default off.
    opt_latent: Optional[Any] = None
