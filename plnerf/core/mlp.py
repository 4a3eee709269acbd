"""The NeRF MLP as a pure function over an explicit parameter pytree.

Topology matches the reference ``NeRF`` module (run_nerf_helpers.py:76-128):
8 x 256 relu MLP over embedded positions with a skip concat of the embedded
input after layer 4, then either

* viewdirs head: ``alpha = alpha_linear(h)``; ``feature_linear(h)`` concat
  embedded views -> one 128-wide relu layer -> ``rgb_linear``; output is
  ``[rgb(3), alpha(1)]``; or
* plain head: ``output_linear(h) -> output_ch``.

The depth-experiments variant (depth_supervised_exps/model/
run_nerf_helpers.py:151-205) adds optional camera-embedding channels
concatenated to the view input and applies ``softplus(beta=10)`` to the
density channel; both are options here (``ModelConfig.input_ch_cam``,
``ModelConfig.density_activation``).

Weights are stored as ``[fan_in, fan_out]`` so the forward pass is
``x @ w + b`` — the natural layout for the TPU MXU (the reference's torch
``[out, in]`` layout needs a transpose on conversion, see
plnerf/checkpoint/convert_torch.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from . import encoding

Params = Dict[str, Any]


def _linear_init(key, fan_in: int, fan_out: int, mode: str, gain: str):
    """Parameter init.

    'torch_linear': torch nn.Linear default — weight and bias both
    U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
    'xavier': reference DenseLayer (depth_supervised_exps/.../run_nerf_helpers.py:
    89-97) — xavier_uniform with calculate_gain(activation), zero bias.
    """
    wk, bk = jax.random.split(key)
    if mode == "xavier":
        g = np.sqrt(2.0) if gain == "relu" else 1.0
        bound = g * np.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound)
        b = jnp.zeros((fan_out,), jnp.float32)
    else:
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound)
        b = jax.random.uniform(bk, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Build the parameter pytree for one NeRF MLP."""
    D, W = cfg.netdepth, cfg.netwidth
    in_ch = cfg.input_ch
    in_views = cfg.input_ch_views + cfg.input_ch_cam

    n_keys = D + 4
    keys = list(jax.random.split(key, n_keys))
    params: Params = {}

    pts = []
    fan_in = in_ch
    for i in range(D):
        pts.append(_linear_init(keys[i], fan_in, W, cfg.init, "relu"))
        # skip concat happens after layer i (0-based), feeding layer i+1
        fan_in = W + in_ch if i in cfg.skips else W
    params["pts_linears"] = pts

    if cfg.use_viewdirs:
        params["feature_linear"] = _linear_init(keys[D], W, W, cfg.init, "linear")
        params["alpha_linear"] = _linear_init(keys[D + 1], W, 1, cfg.init, "linear")
        params["views_linears"] = [
            _linear_init(keys[D + 2], in_views + W, W // 2, cfg.init, "relu")
        ]
        params["rgb_linear"] = _linear_init(keys[D + 3], W // 2, 3, cfg.init, "linear")
    else:
        params["output_linear"] = _linear_init(keys[D], W, cfg.output_ch, cfg.init, "linear")

    if cfg.sigma_bias_init != 0.0:
        # Lift the density head's init bias (init-time only; 0.0 default
        # keeps the reference init bit-identical).  Density channel:
        # alpha_linear output (viewdirs head) / output channel 3 (plain
        # head, raw order [rgb, alpha] — run_nerf_helpers.py:126-128).
        off = jnp.float32(cfg.sigma_bias_init)
        if cfg.use_viewdirs:
            al = params["alpha_linear"]
            params["alpha_linear"] = {"w": al["w"], "b": al["b"] + off}
        else:
            ol = params["output_linear"]
            params["output_linear"] = {
                "w": ol["w"], "b": ol["b"].at[3].add(off)}
    return params


def _dense(x, layer, dtype, out_dtype=jnp.float32):
    # float32 path: force true fp32 matmuls (TPU default would silently
    # round operands to bf16); bfloat16 path: fast MXU-native matmuls with
    # fp32 accumulation.  ``out_dtype=bf16`` (hidden layers in bf16 mode)
    # makes the dot emit bf16 directly — profiled on v5e, f32 dot outputs
    # of shape [rays, samples, 256] were materialized between fusions at
    # ~1.6 GB each because the relu lives in a separate fusion.
    w = layer["w"].astype(dtype)
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    out = jnp.dot(x.astype(dtype), w, precision=precision,
                  preferred_element_type=out_dtype)
    return out + layer["b"].astype(out_dtype)


def apply_mlp(
    params: Params,
    pts_embed: jnp.ndarray,
    views_embed: Optional[jnp.ndarray],
    cfg: ModelConfig,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Forward pass on already-embedded inputs.

    pts_embed: [..., input_ch]; views_embed: [..., input_ch_views(+cam)] or
    None.  Returns raw [..., 4] (rgb logits + density channel).
    Mirrors reference NeRF.forward (run_nerf_helpers.py:105-128).

    In bf16 mode hidden activations are stored bf16 between layers: the
    next dot would round them to bf16 anyway, so forward values are
    unchanged while the residuals autodiff saves for backward halve —
    profiled on v5e, the f32 [rays, samples, 256] activation writes were
    the single largest cost of a training step.
    """
    act_dtype = dtype if dtype == jnp.bfloat16 else jnp.float32

    h = pts_embed
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_dense(h, layer, dtype, act_dtype))
        if i in cfg.skips:
            h = jnp.concatenate([pts_embed.astype(act_dtype), h], axis=-1)

    # heads stay fp32: raw sigma/rgb feed the quadrature
    if cfg.use_viewdirs:
        alpha = _dense(h, params["alpha_linear"], dtype)
        feature = _dense(h, params["feature_linear"], dtype, act_dtype)
        h = jnp.concatenate(
            [feature, views_embed.astype(act_dtype)], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_dense(h, layer, dtype, act_dtype))
        rgb = _dense(h, params["rgb_linear"], dtype)
        out = jnp.concatenate([rgb, alpha], axis=-1)
    else:
        out = _dense(h, params["output_linear"], dtype)

    if cfg.density_activation == "softplus10":
        # depth script: softplus(alpha, beta=10)
        # (depth_supervised_exps/model/run_nerf_helpers.py:200,203)
        dens = jax.nn.softplus(10.0 * out[..., 3:]) / 10.0
        out = jnp.concatenate([out[..., :3], dens], axis=-1)
    return out


def query_network(
    params: Params,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    cfg: ModelConfig,
    cam_embedding: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_fold_heads: bool = False,
) -> jnp.ndarray:
    """Embed + forward, the JAX analogue of the reference ``run_network``
    (run_plnerf.py:78-92) without any chunking — XLA handles memory tiling.

    pts: [R, S, 3]; viewdirs: [R, 3] (broadcast over samples) or None.
    Returns raw [R, S, 4].
    """
    if cfg.i_embed == -1:
        pts_embed = pts
    else:
        pts_embed = encoding.embed(pts, cfg.multires, cfg.pi_bands)

    views_embed = None
    if cfg.use_viewdirs:
        assert viewdirs is not None
        if cfg.i_embed == -1:
            ve = viewdirs
        else:
            ve = encoding.embed(viewdirs, cfg.multires_views, cfg.pi_bands)
        views_embed = jnp.broadcast_to(
            ve[..., None, :], pts.shape[:-1] + (ve.shape[-1],)
        )
        if cfg.input_ch_cam > 0:
            if cam_embedding is None:
                cam = jnp.zeros(pts.shape[:-1] + (cfg.input_ch_cam,), pts.dtype)
            else:
                cam = jnp.broadcast_to(
                    cam_embedding, pts.shape[:-1] + (cfg.input_ch_cam,)
                )
            views_embed = jnp.concatenate([views_embed, cam], axis=-1)

    if use_pallas:
        from ..kernels import fused_mlp  # lazy: only when requested
        return fused_mlp.apply(params, pts_embed, views_embed, cfg, dtype,
                               fold_heads=pallas_fold_heads)
    # keep the [R, S, ch] 3-D form: measured on v5e, flattening to
    # [R*S, ch] makes the step 25% SLOWER (142.6 vs 113.5 ms/step) —
    # XLA handles the batched form better than explicit reshapes
    return apply_mlp(params, pts_embed, views_embed, cfg, dtype)
