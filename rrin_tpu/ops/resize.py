"""2x average-pool and 2x bilinear upsample as dense, fusion-friendly ops.

The reference uses ATen ``avg_pool2d`` and ``F.interpolate(scale_factor=2,
mode='bilinear')`` inside every U-Net stage (SURVEY.md §2.1 row 3). On TPU
we avoid gathers entirely: the exact-2x half-pixel bilinear upsample has
fixed weights {0.25, 0.75} per output row/column parity, so it is expressed
as shifted adds + an interleave reshape — pure VPU work XLA fuses into the
neighbouring convs. Semantics match PyTorch ``align_corners=False``
(half-pixel centers, edge-clamped), verified by tests/test_ops.py against
torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool on NHWC. H and W must be even."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    # Mean over the two window axes; XLA folds this into a single reduce.
    return (x[:, :, 0, :, 0] + x[:, :, 0, :, 1] + x[:, :, 1, :, 0] + x[:, :, 1, :, 1]) * 0.25


def _upsample_2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Double one spatial axis with half-pixel bilinear weights.

    Output position 2k   samples src k - 0.25 -> 0.25*x[k-1] + 0.75*x[k]
    Output position 2k+1 samples src k + 0.25 -> 0.75*x[k]   + 0.25*x[k+1]
    with edge clamping — exactly torch's bilinear align_corners=False for
    scale factor 2.
    """
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis), jax.lax.slice_in_dim(x, 0, -1, axis=axis)],
        axis=axis,
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, None, axis=axis), jax.lax.slice_in_dim(x, -1, None, axis=axis)],
        axis=axis,
    )
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)  # (..., L, 2, ...)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape)


def upsample_2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample on NHWC, torch align_corners=False semantics."""
    x = _upsample_2x_axis(x, axis=1)
    x = _upsample_2x_axis(x, axis=2)
    return x
