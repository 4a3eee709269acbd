"""Fused NeRF-MLP Pallas kernel.

The rendering hot loop evaluates an 8x256 relu MLP (skip concat at layer 4,
viewdir head) on ~1e5-1e6 points per step (reference inner hot loop,
run_plnerf.py:78-92 / SURVEY.md section 3.1).  Under plain XLA every layer's
[N, 256] activation round-trips HBM (~16 transfers per forward); this
kernel streams point tiles through VMEM instead: all weights (~3 MB fp32,
half in bf16) stay resident in VMEM, a tile of T points flows through all
layers + both heads without touching HBM, and only the [T, 4] raw output
is written back.  HBM traffic drops from O(D * N * W) to O(N * (in_ch+4))
— the kernel is MXU-bound instead of bandwidth-bound.

Zero-padding correctness: all feature dims are padded to lane multiples
(128).  Padded weight rows/cols and biases are zero, and relu(0) = 0, so
padded channels stay exactly 0 through every layer; outputs are bit-equal
(fp32) to the unpadded XLA path up to dot-product association order
(measured max abs err 3e-8 on a v5e at N=2048).

Training: ``apply`` carries a custom VJP.  For the viewdirs topology the
backward is a fused Pallas kernel too (``_bwd_kernel``): activations are
recomputed tile-by-tile in VMEM and weight/bias grads accumulate across
sequential grid steps in revisited VMEM blocks; gradient parity vs the
XLA vjp is tested to 1e-4.  Other topologies fall back to an XLA vjp.

Measured on TPU v5e (2026-08-16): after the profiling-driven XLA-path
fixes (bf16 dot outputs + bf16 stored activations, masked-sum gathers)
the full training step runs 113.6 ms/step XLA vs 120.4 ms/step with this
kernel pair at 8192 rays — XLA's fusions are already near-parity, so the
kernel stays OPT-IN (``RenderConfig.use_pallas_mlp`` / ``--use_pallas``).

Round-2 characterization at flagship scale (2.63M points, bf16,
tools/bench_kernel.py): XLA fwd 63.0 ms; Pallas fwd 64.3 ms; Pallas
fwd+bwd pair 108.1 ms vs the XLA step's MLP portion ~87 ms.  The kernel
eliminates ~40x of HBM activation traffic yet does not win, because it
sits at a Mosaic matmul-throughput wall (~52 TFLOP/s = ~26% of bf16
peak, where XLA's own matmul kernels sustain 88-98 TFLOP/s through the
same chip): forward time is INVARIANT to tile size (512/1024/2048 all
64-67 ms) and to interleaving two independent layer chains per tile
(_ILV=2 measured slower, 69.1 ms), ruling out per-dot overhead and
result-latency stalls — the per-dot lowering itself is the bound.
Mosaic constraints hit on the way: matmul accumulators must be 32-bit
(no bf16 preferred_element_type), and bf16 comparisons are rejected
(masks compare in f32).  Recompute lists are stored bf16 (numerically
identical — the next matmul casts operands to bf16 anyway), which lets
the bf16 backward fit tile 1024.  fp32 tiles >= 2048 exceed VMEM.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import ModelConfig

LANE = 128
# Independent sub-blocks interleaved per forward tile.  Measured on v5e:
# 2 is SLOWER than 1 (69.1 vs 64.3 ms fwd at 2.63M pts) — the serial
# layer chain's result latency is not what bounds the kernel, so the
# interleave only adds register pressure.  Kept as a documented knob.
_ILV = 1


def _rup(x: int, m: int = LANE) -> int:
    return -(-x // m) * m


def _pad2(w, rows: int, cols: int):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))


def _pad_bias(b, cols: int):
    return jnp.pad(b, (0, cols - b.shape[0])).reshape(1, cols)


def _padded_weights(params, cfg: ModelConfig, in_p: int, w_p: int,
                    v_p: int, h_p: int, dtype):
    """Zero-pad every weight to lane-multiple shapes.  Skip layers get
    their rows placed to match the padded concat layout
    [pts_embed (in_p) | h (w_p)]."""
    in_ch = cfg.input_ch
    W = cfg.netwidth
    tensors = []

    padded_in = in_p
    for i, layer in enumerate(params["pts_linears"]):
        w, b = layer["w"], layer["b"]
        if (i - 1) in cfg.skips:
            # input is the padded concat [pts_embed (in_p) | h (w_p)]:
            # scatter the original [in_ch + W, W] rows into that layout
            wp = jnp.zeros((in_p + w_p, w_p), w.dtype)
            wp = wp.at[:in_ch, :W].set(w[:in_ch])
            wp = wp.at[in_p: in_p + W, :W].set(w[in_ch:])
        else:
            wp = _pad2(w, padded_in, w_p)
        tensors += [wp.astype(dtype), _pad_bias(b, w_p)]
        padded_in = in_p + w_p if i in cfg.skips else w_p

    if cfg.use_viewdirs:
        tensors += [
            _pad2(params["alpha_linear"]["w"], w_p, LANE).astype(dtype),
            _pad_bias(params["alpha_linear"]["b"], LANE),
            _pad2(params["feature_linear"]["w"], w_p, w_p).astype(dtype),
            _pad_bias(params["feature_linear"]["b"], w_p),
        ]
        # views layer rows: [feature (w_p) | views (v_p)]
        vw = params["views_linears"][0]["w"]
        vv = jnp.zeros((w_p + v_p, h_p), vw.dtype)
        vv = vv.at[:W, : W // 2].set(vw[:W])
        vv = vv.at[w_p: w_p + vw.shape[0] - W, : W // 2].set(vw[W:])
        tensors += [
            vv.astype(dtype),
            _pad_bias(params["views_linears"][0]["b"], h_p),
            _pad2(params["rgb_linear"]["w"], h_p, LANE).astype(dtype),
            _pad_bias(params["rgb_linear"]["b"], LANE),
        ]
    else:
        tensors += [
            _pad2(params["output_linear"]["w"], w_p, LANE).astype(dtype),
            _pad_bias(params["output_linear"]["b"], LANE),
        ]
    return tensors


def _kernel(cfg: ModelConfig, n_pts_layers: int, dtype,
            x_ref, v_ref, *refs):
    """One tile: x [T, in_p], v [T, v_p] -> out [T, 128]
    (cols 0-2 rgb, col 3 density)."""
    out_ref = refs[-1]
    wrefs = refs[:-1]

    # fp32 path matches the XLA path's Precision.HIGHEST (true fp32
    # matmuls); bf16 uses fast MXU-native passes with fp32 accumulation
    # (Mosaic requires a 32-bit matmul accumulator — bf16 dot outputs are
    # rejected at verification).  The tile is split into ``_ILV``
    # independent sub-blocks whose layer chains are interleaved: a single
    # chain is strictly serial (each dot consumes the previous dot's
    # output), which leaves the MXU idle for the result latency of every
    # dot; interleaved chains give the scheduler independent matmuls to
    # overlap with.
    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)

    def dot(h, w_ref, b_ref):
        return (
            jax.lax.dot_general(
                h.astype(dtype), w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            + b_ref[:]
        )

    T = x_ref.shape[0]
    n_blk = _ILV if T % _ILV == 0 else 1
    blk = T // n_blk
    xs = [x_ref[k * blk:(k + 1) * blk] for k in range(n_blk)]
    hs = list(xs)
    ri = 0
    for i in range(n_pts_layers):
        hs = [jnp.maximum(dot(h, wrefs[ri], wrefs[ri + 1]), 0.0)
              for h in hs]
        ri += 2
        if i in cfg.skips:
            hs = [jnp.concatenate([x.astype(jnp.float32), h], axis=-1)
                  for x, h in zip(xs, hs)]

    if cfg.use_viewdirs:
        vs = [v_ref[k * blk:(k + 1) * blk] for k in range(n_blk)]
        alphas = [dot(h, wrefs[ri], wrefs[ri + 1]) for h in hs]
        feats = [dot(h, wrefs[ri + 2], wrefs[ri + 3]) for h in hs]
        hvs = [jnp.concatenate([f, v.astype(jnp.float32)], -1)
               for f, v in zip(feats, vs)]
        hvs = [jnp.maximum(dot(hv, wrefs[ri + 4], wrefs[ri + 5]), 0.0)
               for hv in hvs]
        rgbs = [dot(hv, wrefs[ri + 6], wrefs[ri + 7]) for hv in hvs]
        out = jnp.concatenate([
            jnp.concatenate([rgb[:, :LANE - 1], alpha[:, 0:1]], axis=-1)
            for rgb, alpha in zip(rgbs, alphas)
        ], axis=0)
    else:
        out = jnp.concatenate(
            [dot(h, wrefs[ri], wrefs[ri + 1]) for h in hs], axis=0)
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("cfg", "dtype_name", "tile", "interpret")
)
def _forward(params, pts_embed, views_embed, cfg: ModelConfig,
             dtype_name: str = "float32", tile: int = 512,
             interpret: bool = False):
    """pts_embed [N, in_ch]; views_embed [N, vch] or None -> raw [N, 4]."""
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    N, in_ch = pts_embed.shape
    W = cfg.netwidth
    in_p, w_p = _rup(in_ch), _rup(W)
    h_p = _rup(W // 2)
    vch = views_embed.shape[-1] if views_embed is not None else 0
    v_p = _rup(max(vch, 1))

    n_tiles = -(-N // tile)
    n_pad = n_tiles * tile
    x = jnp.pad(pts_embed, ((0, n_pad - N), (0, in_p - in_ch))).astype(dtype)
    if views_embed is not None:
        v = jnp.pad(views_embed,
                    ((0, n_pad - N), (0, v_p - vch))).astype(dtype)
    else:
        v = jnp.zeros((n_pad, v_p), dtype)

    weights = _padded_weights(params, cfg, in_p, w_p, v_p, h_p, dtype)
    n_layers = len(params["pts_linears"])

    kern = functools.partial(_kernel, cfg, n_layers, dtype)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, in_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, v_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        interpret=interpret,
    )(x, v, *weights)

    if cfg.use_viewdirs:
        # kernel packs rgb in cols 0-2 and density in the last lane
        raw = jnp.concatenate(
            [out[:N, 0:3], out[:N, LANE - 1:LANE]], axis=-1)
    else:
        raw = out[:N, :4]  # output_linear layout: [rgb(3), sigma, ...]
    return raw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _apply_flat(params, pts_embed, views_embed, cfg, dtype_name, tile,
                interpret):
    return _forward(params, pts_embed, views_embed, cfg, dtype_name, tile,
                    interpret)


def _apply_fwd(params, pts_embed, views_embed, cfg, dtype_name, tile,
               interpret):
    out = _forward(params, pts_embed, views_embed, cfg, dtype_name, tile,
                   interpret)
    return out, (params, pts_embed, views_embed)




def _bwd_kernel(cfg: ModelConfig, n_layers: int, dtype, in_p, w_p, v_p, h_p,
                x_ref, v_ref, g_ref, *refs):
    """Backward for the viewdirs topology, one tile per grid step.

    Recomputes the forward activations in VMEM, then backpropagates.
    Weight/bias grad outputs use a constant index map, so the same VMEM
    block is revisited every grid step: zero-initialized at step 0 and
    accumulated in place (sequential TPU grid).
    """
    n_w = 2 * n_layers + 8            # weight/bias refs
    wrefs = refs[:n_w]
    outs = refs[n_w:]
    dx_ref, dv_ref = outs[0], outs[1]
    grad_refs = outs[2:]              # matches wrefs order

    precision = (jax.lax.Precision.HIGHEST
                 if dtype == jnp.float32 else None)
    # Matmul outputs are f32 (Mosaic requires a 32-bit accumulator), but
    # the recomputed activations are STORED in the compute dtype: the next
    # matmul casts its operands to ``dtype`` anyway, so bf16 storage is
    # numerically identical and halves the recompute lists' VMEM.
    act = dtype if dtype == jnp.bfloat16 else jnp.float32

    def mm(a, b):                     # [T,K] @ [K,M]
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def mm_tn(a, b):                  # a^T @ b : [T,K]^T [T,M] -> [K,M]
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def mm_nt(a, b):                  # a @ b^T : [T,M] [K,M]^T -> [T,K]
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for gr in grad_refs:
            gr[...] = jnp.zeros(gr.shape, gr.dtype)

    def acc(idx, dw, db):
        grad_refs[idx][...] += dw
        grad_refs[idx + 1][...] += db.reshape(1, -1)

    # ---- forward recompute, keeping per-layer inputs & relu outputs ----
    x = x_ref[:].astype(act)
    v = v_ref[:].astype(act)
    inputs, relus = [], []
    h = x
    for i in range(n_layers):
        inputs.append(h)
        r = jnp.maximum(
            mm(h, wrefs[2 * i][:]) + wrefs[2 * i + 1][:], 0.0
        ).astype(act)
        relus.append(r)
        h = jnp.concatenate([x, r], axis=-1) if i in cfg.skips else r

    ri = 2 * n_layers
    wa, wf = wrefs[ri][:], wrefs[ri + 2][:]
    wv, wr = wrefs[ri + 4][:], wrefs[ri + 6][:]
    h_last = h
    feature = (mm(h_last, wf) + wrefs[ri + 3][:]).astype(act)
    hv_in = jnp.concatenate([feature, v], axis=-1)
    z = jnp.maximum(mm(hv_in, wv) + wrefs[ri + 5][:], 0.0).astype(act)

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32)           # [T, 128]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    d_rgb = jnp.where(lane_idx == LANE - 1, 0.0, g)
    d_alpha = jnp.where(lane_idx == 0, g[:, LANE - 1:LANE], 0.0)

    acc(ri + 6, mm_tn(z, d_rgb), jnp.sum(d_rgb, axis=0))      # dWr, dbr
    dz = mm_nt(d_rgb, wr)
    # masks compare in f32: the target rejects bf16 comparisons
    da_v = jnp.where(z.astype(jnp.float32) > 0.0, dz, 0.0)
    acc(ri + 4, mm_tn(hv_in, da_v), jnp.sum(da_v, axis=0))    # dWv, dbv
    dhv = mm_nt(da_v, wv)
    dfeat = dhv[:, :w_p]
    dv_ref[:] = dhv[:, w_p:]

    acc(ri + 2, mm_tn(h_last, dfeat), jnp.sum(dfeat, axis=0))  # dWf, dbf
    acc(ri, mm_tn(h_last, d_alpha), jnp.sum(d_alpha, axis=0))  # dWa, dba
    dh = mm_nt(dfeat, wf) + mm_nt(d_alpha, wa)

    dx = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    for i in range(n_layers - 1, -1, -1):
        if i in cfg.skips:
            dx += dh[:, :in_p]
            dr = dh[:, in_p:]
        else:
            dr = dh
        da = jnp.where(relus[i].astype(jnp.float32) > 0.0, dr, 0.0)
        acc(2 * i, mm_tn(inputs[i], da), jnp.sum(da, axis=0))
        dh = mm_nt(da, wrefs[2 * i][:])
    dx += dh
    dx_ref[:] = dx


@functools.partial(
    jax.jit, static_argnames=("cfg", "dtype_name", "tile", "interpret")
)
def _backward(params, pts_embed, views_embed, g, cfg: ModelConfig,
              dtype_name: str, tile: int, interpret: bool):
    """Fused backward: returns (dparams, dx, dv)."""
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    N, in_ch = pts_embed.shape
    W = cfg.netwidth
    in_p, w_p, h_p = _rup(in_ch), _rup(W), _rup(W // 2)
    vch = views_embed.shape[-1]
    v_p = _rup(vch)

    n_tiles = -(-N // tile)
    n_pad = n_tiles * tile
    x = jnp.pad(pts_embed, ((0, n_pad - N), (0, in_p - in_ch))).astype(dtype)
    v = jnp.pad(views_embed, ((0, n_pad - N), (0, v_p - vch))).astype(dtype)
    # cotangent [N, 4] -> kernel layout [N, 128]: rgb cols 0-2, alpha last
    g128 = jnp.zeros((n_pad, LANE), jnp.float32)
    g128 = g128.at[:N, 0:3].set(g[:, 0:3])
    g128 = g128.at[:N, LANE - 1].set(g[:, 3])

    weights = _padded_weights(params, cfg, in_p, w_p, v_p, h_p, dtype)
    n_layers = len(params["pts_linears"])

    kern = functools.partial(_bwd_kernel, cfg, n_layers, dtype,
                             in_p, w_p, v_p, h_p)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                   for w in weights]
    grad_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]

    out_shapes = (
        [jax.ShapeDtypeStruct((n_pad, in_p), jnp.float32),
         jax.ShapeDtypeStruct((n_pad, v_p), jnp.float32)] + grad_shapes
    )
    out_specs = (
        [pl.BlockSpec((tile, in_p), lambda i: (i, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((tile, v_p), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)] + grad_specs
    )

    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, in_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, v_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, v, g128, *weights)

    dx = outs[0][:N, :in_ch]
    dv = outs[1][:N, :vch]
    grads = outs[2:]

    # ---- unpad the weight grads back into the param pytree layout ----
    in_ch_, W_ = in_ch, W
    dparams = {"pts_linears": []}
    gi = 0
    for i in range(n_layers):
        dw, db = grads[gi], grads[gi + 1]
        gi += 2
        if (i - 1) in cfg.skips:
            w_orig = jnp.concatenate(
                [dw[:in_ch_, :W_], dw[in_p: in_p + W_, :W_]], axis=0)
        else:
            rows = params["pts_linears"][i]["w"].shape[0]
            w_orig = dw[:rows, :W_]
        dparams["pts_linears"].append(
            {"w": w_orig, "b": db[0, :W_]})

    dwa, dba = grads[gi], grads[gi + 1]
    dwf, dbf = grads[gi + 2], grads[gi + 3]
    dwv, dbv = grads[gi + 4], grads[gi + 5]
    dwr, dbr = grads[gi + 6], grads[gi + 7]
    vrows = params["views_linears"][0]["w"].shape[0]
    dparams["alpha_linear"] = {"w": dwa[:W_, :1], "b": dba[0, :1]}
    dparams["feature_linear"] = {"w": dwf[:W_, :W_], "b": dbf[0, :W_]}
    dparams["views_linears"] = [{
        "w": jnp.concatenate(
            [dwv[:W_, : W_ // 2], dwv[w_p: w_p + vrows - W_, : W_ // 2]],
            axis=0),
        "b": dbv[0, : W_ // 2],
    }]
    dparams["rgb_linear"] = {"w": dwr[: W_ // 2, :3], "b": dbr[0, :3]}
    return dparams, dx, dv


def _apply_bwd(cfg, dtype_name, tile, interpret, res, g):
    """Exact gradients: fused Pallas backward for the viewdirs topology
    (activations recomputed tile-by-tile in VMEM, dW accumulated across
    the grid); XLA-vjp fallback otherwise."""
    params, pts_embed, views_embed = res
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    if cfg.use_viewdirs and views_embed is not None:
        return _backward(params, pts_embed, views_embed, g, cfg,
                         dtype_name, tile, interpret)

    from ..core.mlp import apply_mlp
    import dataclasses as _dc

    cfg_plain = _dc.replace(cfg, density_activation="none")

    def f(p, x, v):
        return apply_mlp(p, x, v, cfg_plain, dtype)

    if views_embed is None:
        _, vjp = jax.vjp(lambda p, x: f(p, x, None), params, pts_embed)
        dp, dx = vjp(g)
        return dp, dx, None
    _, vjp = jax.vjp(f, params, pts_embed, views_embed)
    return vjp(g)


_apply_flat.defvjp(_apply_fwd, _apply_bwd)


def apply(params, pts_embed: jnp.ndarray,
          views_embed: Optional[jnp.ndarray], cfg: ModelConfig,
          dtype=jnp.float32, tile: int = 512,
          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in replacement for ``core.mlp.apply_mlp`` on embedded inputs
    of any leading shape."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = pts_embed.shape[:-1]
    x = pts_embed.reshape(-1, pts_embed.shape[-1])
    v = None
    if views_embed is not None:
        v = jnp.broadcast_to(
            views_embed, lead + (views_embed.shape[-1],)
        ).reshape(-1, views_embed.shape[-1])
    dtype_name = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    raw = _apply_flat(params, x, v, cfg, dtype_name, tile, interpret)
    if cfg.density_activation == "softplus10":
        # outside the custom-vjp'd core: autodiff handles the softplus
        dens = jax.nn.softplus(10.0 * raw[..., 3:]) / 10.0
        raw = jnp.concatenate([raw[..., :3], dens], axis=-1)
    return raw.reshape(lead + (4,))
