"""Convert reference PyTorch checkpoints / state_dicts into plnerf param
pytrees.

The reference saves ``.tar`` pickles with ``network_fn_state_dict`` /
``network_fine_state_dict`` (run_plnerf.py:1324-1332).  Torch ``nn.Linear``
stores weights as [out, in]; plnerf stores [in, out], so every weight is
transposed on conversion.  This is the parity harness that lets a forward
pass of the rebuild be compared against the reference bit-for-bit-ish.

torch is only imported lazily — it is NOT a runtime dependency of the
framework, only of this converter.
"""
from __future__ import annotations

from typing import Any, Dict

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
