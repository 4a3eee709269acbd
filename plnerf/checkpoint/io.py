"""Checkpoint save/restore.

Reference semantics (run_plnerf.py:453-471,1324-1332): checkpoints live in
``<ckpt_dir>/<expname>/`` named by step, resume picks the lexically-last
one unless ``no_reload``; a ``ft_path`` override loads a specific file.
Deviation (documented): the reference does NOT save the coarse optimizer
state — we save every optimizer state; restoring a converted reference
checkpoint simply reinitializes whatever is missing.

Format: flax msgpack state-dict (pure arrays, no pickled code), one file
per checkpoint: ``{step:06d}.ckpt``.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import flax.serialization as fser


CKPT_RE = re.compile(r"^(\d+)\.ckpt$")


def save_checkpoint(ckpt_dir: str, step: int, tree: Any) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{step:06d}.ckpt")
    data = fser.msgpack_serialize(fser.to_state_dict(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def aux_path(ckpt_path: str, suffix: str) -> str:
    """Sidecar file sharing a checkpoint's step stem: 000100.ckpt ->
    000100.<suffix> (e.g. the occupancy grid trained alongside the params —
    kept out of the .ckpt so its format stays reference-convertible)."""
    return os.path.splitext(ckpt_path)[0] + "." + suffix


def save_aux(ckpt_path: str, suffix: str, tree: Any) -> str:
    path = aux_path(ckpt_path, suffix)
    data = fser.msgpack_serialize(fser.to_state_dict(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def list_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    found = []
    for name in os.listdir(ckpt_dir):
        m = CKPT_RE.match(name)
        if m:
            found.append((int(m.group(1)), name))
    # numeric sort: lexical order misorders 1000000 vs 900000
    return [os.path.join(ckpt_dir, n) for _, n in sorted(found)]


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (a matching pytree).

    Forward compatibility: top-level fields added to TrainState after a
    checkpoint was written (e.g. ``opt_latent``) are backfilled from the
    template — flax's from_state_dict otherwise hard-errors on the missing
    key.  A non-None backfill (resuming an old run with a newly-enabled
    feature, e.g. --opt_ch_cam) keeps the template's fresh init and says
    so."""
    with open(path, "rb") as f:
        state_dict = fser.msgpack_restore(f.read())
    tmpl_dict = fser.to_state_dict(template)
    if isinstance(state_dict, dict) and isinstance(tmpl_dict, dict):
        for k, v in tmpl_dict.items():
            if k not in state_dict:
                if v is not None:
                    print(f"NOTE: checkpoint {os.path.basename(path)} "
                          f"predates state field '{k}' — keeping its "
                          f"fresh initialization")
                state_dict[k] = v
    return fser.from_state_dict(template, state_dict)
