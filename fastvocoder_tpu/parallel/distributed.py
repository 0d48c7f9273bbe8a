"""Multi-host (multi-process) initialization for data-parallel training.

The reference is strictly single-machine (reference bin/train.py:260,
SURVEY.md §2.7).  This is the TPU-native multi-host layer: each host runs one
JAX process over its local chips, `jax.distributed.initialize` forms the
global runtime, the device mesh spans all hosts, and XLA's SPMD partitioner
places the gradient all-reduce over ICI (intra-slice) / DCN (multi-slice).

Activation is environment-driven so single-host behavior is unchanged:

  JAX_COORDINATOR_ADDRESS=host:port  (coordinator, process 0's address)
  JAX_NUM_PROCESSES=N
  JAX_PROCESS_ID=i

On Cloud TPU pods the three values are auto-detected and
`jax.distributed.initialize()` needs no arguments; setting just
JAX_NUM_PROCESSES>1 triggers that path.
"""

from __future__ import annotations

import os
from typing import Tuple


def multihost_env_requested() -> bool:
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return True
    try:
        return int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
    except ValueError:
        return False


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Initialize the multi-process runtime if the env requests it.

    Returns (process_index, process_count); (0, 1) for single-host runs.
    Idempotent: safe to call when already initialized.
    """
    import jax

    if multihost_env_requested():
        kw = {}
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coord:
            kw["coordinator_address"] = coord
        n = os.environ.get("JAX_NUM_PROCESSES")
        if n:
            kw["num_processes"] = int(n)
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is not None and pid != "":
            kw["process_id"] = int(pid)
        try:
            jax.distributed.initialize(**kw)
        except RuntimeError as e:  # already initialized
            if "already initialized" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns checkpoint/log/tensorboard writes."""
    import jax

    return jax.process_index() == 0
