"""Pad spatial dims up to a multiple of 16 and crop back (SURVEY.md §1 L4).

The four 2x pooling stages of each U-Net require H and W divisible by 16
(SURVEY.md App-B); the reference pads every frame before the forward pass
and crops after. Padding is replicate-edge so synthetic flow at the border
stays sane (zero-pad would fabricate dark content for the flow U-Net).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def padded_size(size: int, multiple: int = 16) -> int:
    return -(-size // multiple) * multiple


def pad_to_multiple(
    x: jnp.ndarray, multiple: int = 16
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Pad NHWC (or HWC) ``x`` on the bottom/right to /multiple.

    Returns the padded array and the original (H, W) for :func:`unpad`.
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = padded_size(h, multiple) - h
    pw = padded_size(w, multiple) - w
    if ph == 0 and pw == 0:
        return x, (h, w)
    pad_width = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pad_width, mode="edge"), (h, w)


def unpad(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Crop NHWC (or HWC) ``x`` back to the original (H, W)."""
    h, w = hw
    return x[..., :h, :w, :]
