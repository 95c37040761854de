"""Mesh + NamedSharding helpers for data-parallel (and spatially-sharded)
frame interpolation (SURVEY.md §7.2 step 5; BASELINE.json config 5).

Design: params replicated (the cascade is ~128 MB fp32 — small next to HBM),
batch dim sharded over ``data``; optionally the H dim over ``spatial``.
With inputs laid out this way, a plain ``jax.jit`` of the forward/train
step emits all needed ICI collectives (halo exchanges for spatially-
sharded convs, psum for gradient reduction) — the TPU-native replacement
for the reference's absent NCCL layer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: int = 0,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ('data', 'spatial') mesh. n_data=0 means "all remaining devices".

    On a real slice the mesh axes ride ICI; across hosts jax.distributed
    handles DCN — nothing here changes (SURVEY.md §5).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        if len(devices) % n_spatial:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_spatial={n_spatial}"
            )
        n_data = len(devices) // n_spatial
    n = n_data * n_spatial
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(n_data, n_spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(
    mesh: Mesh, spatial_dim: Optional[int] = None, ndim: int = 4
) -> NamedSharding:
    """Sharding for batch-leading arrays: B over data, optionally one
    spatial dim over ``spatial`` (halo exchanges for convs are
    XLA-inserted). ``ndim`` covers both (B,H,W,C) activations and the
    pipeline's (B,2,H,W,3) uint8 pair batches."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pairs(mesh: Mesh, *arrays: Any, spatial_dim: Optional[int] = None):
    """device_put arrays with batch-DP (+optional spatial) sharding."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, spatial_dim, ndim=a.ndim))
        for a in arrays
    )
    return out[0] if len(out) == 1 else out


def replicate_params(mesh: Mesh, params: Any) -> Any:
    return jax.device_put(params, replicate(mesh))
