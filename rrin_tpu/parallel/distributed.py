"""Multi-host bring-up (SURVEY.md §5 "Distributed communication backend").

The reference has no distributed runtime; the TPU-native equivalent is
``jax.distributed`` + a global mesh whose ``data`` axis rides ICI within a
slice and DCN across slices — all collectives still XLA-emitted from
sharded jit, nothing else changes in the framework.

On single-host (this environment) ``initialize()`` is a no-op that
returns local facts, so every entry point can call it unconditionally.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class DistributedContext:
    initialized: bool
    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistributedContext:
    """Initialize multi-host JAX when configured; harmless on one host.

    Explicit args win; else standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or TPU-pod auto-detection
    via ``jax.distributed.initialize()`` with no args.
    """
    import jax

    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    did_init = False
    if coordinator is not None and nproc and nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=nproc,
            process_id=pid or 0,
        )
        did_init = True

    return DistributedContext(
        initialized=did_init,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val else None
