"""Device-mesh data parallelism for the GAN train step.

The reference is strictly single-device (reference bin/train.py:260,
SURVEY.md §2.7); this module is the TPU-native scaling layer it lacks:
a 1-D `jax.sharding.Mesh` over the batch axis, replicated parameters, and
`jax.jit` with explicit in/out shardings so the XLA SPMD partitioner inserts
the gradient all-reduce over ICI — no hand-written collectives.

Works identically on a real TPU slice and on a virtual CPU mesh
(`XLA_FLAGS=--xla_force_host_platform_device_count=N`), which is how the
test suite and the driver's multi-chip dry-run validate it without hardware.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, split along dim 0.

    Single-process: a plain sharded device_put.  Multi-process: each host
    passes its LOCAL slice of the global batch (from `batch_iterator`'s
    shard_index/shard_count) and the slices assemble into one global array
    (`jax.make_array_from_process_local_data`)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a (host or single-device) pytree onto every mesh device.
    In multi-process runs every host must hold the same values (e.g. from
    the same init seed or the same checkpoint)."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(state, rep)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(jax.device_get(x))
        ),
        state,
    )


def compile_train_step(
    step_fn: Callable,
    mesh: Mesh,
    donate_state: bool = True,
) -> Callable:
    """jit a `(state, mel, wav[, weight]) -> (state, metrics)` step with
    replicated state and batch-sharded inputs.

    Per-example losses are means over the global batch; with the batch dim
    sharded and parameters replicated, XLA emits a single fused gradient
    all-reduce (psum over ICI) — the scaling-book recipe: annotate shardings,
    let the partitioner place collectives.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, data, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
        static_argnames=(),
    )


def compile_train_step_no_weight(
    step_fn: Callable, mesh: Mesh, donate_state: bool = True
) -> Callable:
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )

