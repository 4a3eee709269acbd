"""Static configuration objects for the renderer and model.

These are frozen (hashable) dataclasses so they can be passed as static
arguments to ``jax.jit``: everything that changes the *structure* of the
computation (sample counts, mode, color mode, ...) lives here, while
everything that is data (rays, params, rng) is traced.

Behavioral surface mirrors the reference driver flags
(reference: run_plnerf.py:761-916 ``config_parser`` and the
``render_kwargs_train`` dict at run_plnerf.py:475-502).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .occgrid import OccGridConfig


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """NeRF MLP + positional-encoding configuration.

    Mirrors reference ``NeRF.__init__`` (run_nerf_helpers.py:76-104) and
    ``get_embedder`` (run_nerf_helpers.py:57-72), plus the depth-experiment
    variant's differences (depth_supervised_exps/model/run_nerf_helpers.py:
    89-205): pi-scaled embedding frequencies, optional camera-embedding
    channels and softplus(beta=10) density activation.
    """
    netdepth: int = 8
    netwidth: int = 256
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    multires: int = 10          # position encoding frequencies
    multires_views: int = 4     # view-direction encoding frequencies
    i_embed: int = 0            # 0 = positional encoding, -1 = identity
    pi_bands: bool = False      # depth-exps variant: multiply x by pi*freq
    input_ch_cam: int = 0       # camera-embedding channels (depth exps)
    # 'none': raw density out, relu applied downstream (NVS scripts)
    # 'softplus10': softplus(beta=10) on density (depth script)
    density_activation: str = "none"
    output_ch: int = 4          # only used when use_viewdirs=False
    # Parameter init: 'torch_linear' = U(-1/sqrt(fan_in), +1/sqrt(fan_in))
    # (torch nn.Linear default); 'xavier' = DenseLayer xavier_uniform with
    # relu/linear gain and zero bias (depth script).
    init: str = "torch_linear"
    # TPU-native extra (default 0.0 = exact reference init): constant
    # added to the density head's bias at INIT time.  The NVS scripts'
    # raw-relu density head can land all-negative at init (measured init
    # margin -0.035..-0.029 on the dead seeds, BASELINE.md "collapse seed
    # sweep"), which kills every constant-mode gradient and degrades
    # linear to a billboard; +0.1 lifts every seed clear of that basin.
    sigma_bias_init: float = 0.0

    @property
    def input_ch(self) -> int:
        if self.i_embed == -1:
            return 3
        return 3 + 3 * 2 * self.multires

    @property
    def input_ch_views(self) -> int:
        if not self.use_viewdirs:
            return 0
        if self.i_embed == -1:
            return 3
        return 3 + 3 * 2 * self.multires_views


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration for ``render_rays``.

    Mirrors the reference ``render_rays`` keyword surface
    (run_plnerf.py:627-646 and depth variant
    depth_supervised_exps/run_nerf_sample_based_depth.py:792-816).
    """
    n_samples: int = 64
    n_importance: int = 128
    mode: str = "linear"              # 'linear' | 'constant'
    color_mode: str = "midpoint"      # 'midpoint' | 'left' | 'tau_weighted' (TPU extra)
    lindisp: bool = False
    perturb: bool = True              # stratified jitter of coarse samples
    use_viewdirs: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    zero_tol: float = 1e-4
    epsilon: float = 1e-3
    farcolorfix: bool = False
    constant_init: bool = False       # force constant mode (warmup)
    # Depth-supervision extras (reference depth script render_rays):
    compute_pred_hyp: bool = False    # re-run sampler on fine weights -> quantiles
    is_joint: bool = False            # share one u across all rays in batch
    trim_first_weight: bool = True    # depth script drops weights[...,0] in linear
    retraw: bool = False
    # Compute dtype for the MLP matmuls: 'float32' or 'bfloat16'.
    mlp_dtype: str = "float32"
    # Use the fused Pallas MLP kernel when available.
    use_pallas_mlp: bool = False
    # Pallas head schedule: fold the (relu-free) feature dot into the
    # views layer and N-concat-merge it with the alpha head — same math,
    # one fewer MXU pass per tile (kernels/fused_mlp._padded_weights).
    pallas_fold_heads: bool = False
    # Occupancy-grid guided coarse sampling (core/occgrid.py).  None =
    # exact reference uniform sampling (the default; parity tests rely on
    # it).  Set to an OccGridConfig to place coarse samples by the grid —
    # the grid state itself is passed to render_rays as traced data.
    occ: Optional["OccGridConfig"] = None
    # Rematerialize the MLP in backward (jax.checkpoint): the fwd pass
    # keeps only the MLP inputs live between coarse/fine passes.  NOTE
    # (measured 2026-08-16): it does NOT lift the single-pass HBM peak —
    # the backward recompute still materializes all layer activations of
    # one pass at once, so a 16k-ray 64+128-sample v5e step OOMs with or
    # without it.  Useful when several render passes coexist.
    remat_mlp: bool = False

    @property
    def effective_mode(self) -> str:
        # reference run_plnerf.py:709-711: constant_init overwrites mode
        return "constant" if self.constant_init else self.mode


def replace(cfg, **kw):
    """Convenience: dataclasses.replace that works for both config types."""
    return dataclasses.replace(cfg, **kw)
