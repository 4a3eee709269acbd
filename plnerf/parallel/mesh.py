"""Data parallelism over a TPU device mesh.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather over local GPUs (run_nerf_sample_based_depth.py:564,585) and
sequential chunk loops (run_plnerf.py:95-107).  The TPU-native replacement
(SURVEY.md section 2): a 1-D mesh over all chips, ray batches sharded along
the batch axis, parameters replicated, and gradient reduction as an XLA
``psum`` riding ICI — expressed declaratively with NamedSharding under
``jax.jit`` so the compiler inserts the collectives.

Helpers here build the mesh, the shardings, and wrap a train step or a
renderer so batches are consumed sharded.  Everything also runs unmodified
on the 8-device virtual CPU mesh used by the tests.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray/batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of [R, ...] arrays sharded along axis 0.
    Scalars (ndim 0) are replicated."""
    repl = replicated(mesh)
    shrd = batch_sharded(mesh)

    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, repl if x.ndim == 0 else shrd)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), repl), tree)


def _put(x, sharding: NamedSharding):
    """device_put only when the leaf is not already laid out as asked —
    an already-placed jax.Array passes through untouched, so calling the
    wrapper below every step does NOT re-stage the state."""
    if (isinstance(x, jax.Array)
            and getattr(x, "sharding", None) is not None
            and x.sharding.is_equivalent_to(sharding, x.ndim)):
        return x
    return jax.device_put(x, sharding)


def make_parallel_train_step(step_fn, mesh: Mesh, spec_overrides=None):
    """Wrap a jitted train step for DP execution: state replicated, batch
    sharded along rays, RNG key replicated.  The per-example photometric
    loss is a mean over the full (global) ray batch, so under SPMD the
    gradient all-reduce (psum over ICI) is inserted by XLA automatically.

    Intended use: one-shot harnesses and the multichip dryrun, where the
    state arrives host-side.  Placement is idempotent — leaves already
    holding the requested sharding are passed through, so per-step calls
    do not add host transfers — but a production loop should still place
    the state once with ``replicate`` and use sharding constraints inside
    the step (what cli/run_plnerf._make_sampled_step does).

    ``spec_overrides``: optional {batch_key: PartitionSpec} for batch
    entries whose leading axis is NOT the ray axis (e.g. the depth step's
    hypothesis-leading ``target_h [H, R, 1]`` wants ``P(None, 'dp')``).
    """
    repl = replicated(mesh)
    shrd = batch_sharded(mesh)
    overrides = {
        k: NamedSharding(mesh, spec) for k, spec in (spec_overrides or {}).items()
    }

    def sharding_of_batch(batch):
        return {
            k: overrides.get(
                k, repl if getattr(x, "ndim", 0) == 0 else shrd
            )
            for k, x in batch.items()
        }

    def run(state, batch, key):
        shardings = sharding_of_batch(batch)
        batch = {
            k: _put(x, shardings[k]) if x is not None else None
            for k, x in batch.items()
        }
        state = jax.tree.map(lambda x: _put(x, repl), state)
        return step_fn(state, batch, key)

    return run


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
