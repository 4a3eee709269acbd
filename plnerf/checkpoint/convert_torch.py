"""Convert reference PyTorch checkpoints / state_dicts into plnerf param
pytrees — and back (``save_reference_checkpoint`` /
tools/export_reference_ckpt.py write reference-loadable ``.tar`` files,
including the fine Adam moments, so models trained here can be evaluated
or fine-tuned by the upstream scripts).

The reference saves ``.tar`` pickles with ``network_fn_state_dict`` /
``network_fine_state_dict`` (run_plnerf.py:1324-1332).  Torch ``nn.Linear``
stores weights as [out, in]; plnerf stores [in, out], so every weight is
transposed on conversion.  This is the parity harness that lets a forward
pass of the rebuild be compared against the reference bit-for-bit-ish.

torch is only imported lazily — it is NOT a runtime dependency of the
framework, only of this converter.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def state_dict_to_params(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference ``NeRF`` state_dict to a plnerf param pytree."""
    def to_np(v):
        try:
            return np.asarray(v.detach().cpu().numpy(), dtype=np.float32)
        except AttributeError:
            return np.asarray(v, dtype=np.float32)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}

    n_pts = len({k.split(".")[1] for k in sd if k.startswith("pts_linears.")})
    params["pts_linears"] = [
        {"w": sd[f"pts_linears.{i}.weight"].T, "b": sd[f"pts_linears.{i}.bias"]}
        for i in range(n_pts)
    ]
    if "feature_linear.weight" in sd:
        params["feature_linear"] = {
            "w": sd["feature_linear.weight"].T, "b": sd["feature_linear.bias"]
        }
        params["alpha_linear"] = {
            "w": sd["alpha_linear.weight"].T, "b": sd["alpha_linear.bias"]
        }
        n_views = len({k.split(".")[1] for k in sd if k.startswith("views_linears.")})
        params["views_linears"] = [
            {"w": sd[f"views_linears.{i}.weight"].T, "b": sd[f"views_linears.{i}.bias"]}
            for i in range(n_views)
        ]
        params["rgb_linear"] = {
            "w": sd["rgb_linear.weight"].T, "b": sd["rgb_linear.bias"]
        }
    else:
        params["output_linear"] = {
            "w": sd["output_linear.weight"].T, "b": sd["output_linear.bias"]
        }
    return params


def params_to_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse mapping (for exporting back to the reference layout)."""
    sd: Dict[str, Any] = {}
    for i, layer in enumerate(params["pts_linears"]):
        sd[f"pts_linears.{i}.weight"] = np.asarray(layer["w"]).T
        sd[f"pts_linears.{i}.bias"] = np.asarray(layer["b"])
    if "feature_linear" in params:
        for name in ("feature_linear", "alpha_linear", "rgb_linear"):
            sd[f"{name}.weight"] = np.asarray(params[name]["w"]).T
            sd[f"{name}.bias"] = np.asarray(params[name]["b"])
        for i, layer in enumerate(params["views_linears"]):
            sd[f"views_linears.{i}.weight"] = np.asarray(layer["w"]).T
            sd[f"views_linears.{i}.bias"] = np.asarray(layer["b"])
    else:
        sd["output_linear.weight"] = np.asarray(params["output_linear"]["w"]).T
        sd["output_linear.bias"] = np.asarray(params["output_linear"]["b"])
    return sd


def _torch_param_arrays(tree: Dict[str, Any]):
    """Flatten a plnerf param pytree into the reference NeRF's
    ``model.parameters()`` registration order (run_nerf_helpers.py:88-101:
    pts_linears, views_linears, feature/alpha/rgb) — weights transposed to
    torch's [out, in].  Only the viewdirs topology maps 1:1 (the reference
    registers ``views_linears`` even with ``use_viewdirs=False``, which has
    no analogue in the plnerf pytree)."""
    if "feature_linear" not in tree:
        raise ValueError(
            "torch parameter-order export needs the viewdirs topology")
    out = []

    def add(layer):
        # np.array(copy=True): torch.from_numpy needs writable owned memory
        # (jax-backed buffers are read-only)
        out.append(np.array(np.asarray(layer["w"]).T, copy=True))
        out.append(np.array(np.asarray(layer["b"]), copy=True))

    for layer in tree["pts_linears"]:
        add(layer)
    for layer in tree["views_linears"]:
        add(layer)
    add(tree["feature_linear"])
    add(tree["alpha_linear"])
    add(tree["rgb_linear"])
    return out


def save_reference_checkpoint(path: str, step: int,
                              params_coarse: Dict[str, Any],
                              params_fine: Optional[Dict[str, Any]] = None,
                              fine_adam=None, lr: float = 5e-4,
                              joint: bool = False) -> str:
    """Write a reference-loadable ``.tar`` checkpoint.

    Produces the exact key set the reference's resume path consumes
    (run_plnerf.py:453-471, save at :1324-1332): ``global_step``,
    ``network_fn_state_dict``, ``network_fine_state_dict``, and
    ``optimizer_state_dict`` — so a model trained in this framework can be
    evaluated (or fine-tuned) by the upstream PyTorch scripts.

    ``optimizer_state_dict`` scope matches the target script:
    ``joint=False`` covers the FINE network only, like run_plnerf's saved
    Adam (its coarse optimizer state is never saved, run_plnerf.py:1326-1331);
    ``joint=True`` covers coarse-then-fine parameters, matching
    run_nerf_vanilla's single Adam over ``model`` + ``model_fine``
    (run_nerf_vanilla.py:365-380).  Pass ``fine_adam=(mu, nu, count)`` (the
    optax ``ScaleByAdamState`` pieces — pytrees shaped like ``params_fine``,
    or like the ``(params_coarse, params_fine)`` tuple when ``joint``) to
    export real first/second moments in torch's per-parameter layout;
    otherwise a fresh (pre-first-step) Adam state is written, which torch
    accepts and repopulates on the first ``step()``.
    """
    import torch  # lazy

    def to_torch_sd(params):
        # copy=True: jax-backed buffers are read-only, torch needs writable
        return {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in params_to_state_dict(params).items()}

    def flat_arrays(tree_or_seq):
        if isinstance(tree_or_seq, (list, tuple)):
            out = []
            for t in tree_or_seq:
                if t is not None:
                    out += _torch_param_arrays(t)
            return out
        return _torch_param_arrays(tree_or_seq)

    if joint:
        opt_template: Any = [params_coarse, params_fine]
    else:
        opt_template = params_fine if params_fine is not None \
            else params_coarse
    try:
        shapes = [a.shape for a in flat_arrays(opt_template)]
    except ValueError:
        shapes = None

    if shapes is not None:
        dummies = [torch.nn.Parameter(torch.zeros(s)) for s in shapes]
        opt = torch.optim.Adam(dummies, lr=lr, betas=(0.9, 0.999))
        osd = opt.state_dict()  # modern param_groups template, empty state
        if fine_adam is not None and params_fine is not None:
            mu, nu, count = fine_adam
            mus = flat_arrays(mu)
            nus = flat_arrays(nu)
            osd["state"] = {
                i: {"step": torch.tensor(float(count)),
                    "exp_avg": torch.from_numpy(mus[i]),
                    "exp_avg_sq": torch.from_numpy(nus[i])}
                for i in range(len(mus))
            }
    else:
        # non-viewdirs topology: parameter order is ambiguous (see
        # _torch_param_arrays) — emit a structurally-valid fresh state for
        # the caller to discard or adapt
        osd = {"state": {}, "param_groups": [
            {"lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
             "weight_decay": 0, "amsgrad": False, "params": []}]}

    ckpt = {
        "global_step": int(step),
        "network_fn_state_dict": to_torch_sd(params_coarse),
        "network_fine_state_dict": (to_torch_sd(params_fine)
                                    if params_fine is not None else None),
        "optimizer_state_dict": osd,
    }
    torch.save(ckpt, path)
    if shapes is None:
        return ("placeholder Adam state (non-viewdirs topology: torch "
                "param order is ambiguous)")
    if osd["state"]:
        return "real Adam moments"
    return "fresh Adam state"


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.tar`` checkpoint into plnerf pytrees.

    Returns dict with 'step', 'params_coarse', 'params_fine' (None if the
    checkpoint has no fine network).
    """
    import torch  # lazy

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {
        "step": int(ckpt.get("global_step", 0)),
        "params_coarse": state_dict_to_params(ckpt["network_fn_state_dict"]),
        "params_fine": None,
    }
    if ckpt.get("network_fine_state_dict") is not None:
        out["params_fine"] = state_dict_to_params(ckpt["network_fine_state_dict"])
    for k in ("depth_shifts", "depth_scales"):
        if k in ckpt:
            v = ckpt[k]
            out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out
