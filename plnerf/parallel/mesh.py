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


def make_parallel_train_step(step_fn, mesh: Mesh):
    """Wrap a jitted train step for DP execution: state replicated, batch
    sharded along rays, RNG key replicated.  The per-example photometric
    loss is a mean over the full (global) ray batch, so under SPMD the
    gradient all-reduce (psum over ICI) is inserted by XLA automatically.
    """
    repl = replicated(mesh)
    shrd = batch_sharded(mesh)

    def sharding_of_batch(batch):
        return jax.tree.map(
            lambda x: repl if getattr(x, "ndim", 0) == 0 else shrd, batch
        )

    def run(state, batch, key):
        batch = jax.tree.map(
            lambda x, s: jax.device_put(x, s), batch, sharding_of_batch(batch)
        )
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        return step_fn(state, batch, key)

    return run


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
