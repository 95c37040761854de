"""Backward bilinear warp + fused weighted blend (pure-XLA reference path).

Replaces the reference's ``torch.nn.functional.grid_sample`` CUDA kernel
(SURVEY.md §2.1 row 4, §2.2). The reference builds a pixel mesh-grid, adds
the flow, normalizes to [-1, 1] with ``2p/(S-1) - 1`` and calls grid_sample
(bilinear, zero padding). Running that under modern PyTorch defaults means
``align_corners=False``, i.e. the effective sample position is

    s = (p + f) * S / (S - 1) - 0.5        (align_corners=False)
    s = (p + f)                            (align_corners=True)

Out-of-bounds corner taps contribute zero (padding_mode='zeros'). Both
semantics are implemented and parity-tested against torch grid_sample in
tests/test_ops.py.

This module is the always-correct XLA gather path (works on CPU and TPU for
arbitrary flow magnitude). The Pallas fast path fused with the blend lives
in ops/warp_pallas.py; ``warp_blend`` is the dispatch point.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_coords(
    flow: jnp.ndarray, height: int, width: int, align_corners: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute bilinear sample positions (sy, sx) for each output pixel."""
    dtype = flow.dtype
    xs = jax.lax.broadcasted_iota(dtype, flow.shape[:-1], 2)
    ys = jax.lax.broadcasted_iota(dtype, flow.shape[:-1], 1)
    px = xs + flow[..., 0]
    py = ys + flow[..., 1]
    if align_corners:
        return py, px
    # grid_sample unnormalization for align_corners=False applied to the
    # reference's 2p/(S-1)-1 grid: ((u+1)*S - 1)/2 with u = 2p/(S-1)-1.
    sx = px * (width / max(width - 1, 1)) - 0.5
    sy = py * (height / max(height - 1, 1)) - 0.5
    return sy, sx


def _gather_2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, yi, xi, :] with clamped int indices.

    img: (B, H, W, C); yi/xi: (B, H, W) int32 already in-bounds.
    """
    b, h, w, c = img.shape
    flat = (yi * w + xi).reshape(b, h * w, 1)
    vals = jnp.take_along_axis(img.reshape(b, h * w, c), flat, axis=1)
    return vals.reshape(b, h, w, c)


@partial(jax.jit, static_argnames=("align_corners",))
def warp_bilinear(
    img: jnp.ndarray, flow: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Backward-warp ``img`` by ``flow`` with bilinear sampling, zeros outside.

    Args:
      img:  (B, H, W, C) source frame.
      flow: (B, H, W, 2) displacement field; channel 0 = dx, 1 = dy
            (matches the reference's (xx, yy) grid concat order).
      align_corners: grid_sample normalization variant (see module doc).

    Returns (B, H, W, C): img sampled at p + flow(p).
    """
    b, h, w, c = img.shape
    orig_dtype = img.dtype
    f32 = jnp.float32
    sy, sx = _sample_coords(flow.astype(f32), h, w, align_corners)

    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = sx - x0f
    wy = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    imgf = img.astype(f32)
    out = jnp.zeros((b, h, w, c), f32)
    for dy, dx, wgt in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        yi = y0 + dy
        xi = x0 + dx
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        tap = _gather_2d(imgf, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
        out = out + tap * (wgt * valid.astype(f32))[..., None]
    return out.astype(orig_dtype)


def warp_pair(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    flow_t0: jnp.ndarray,
    flow_t1: jnp.ndarray,
    align_corners: bool = False,
    use_pallas: bool = False,
    pairs: bool = False,
    planar_out: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp both source frames toward time t in one fused pass.

        g0 = warp(i0, flow_t0);  g1 = warp(i1, flow_t1)

    This is the irregular-memory hot spot of the cascade (SURVEY.md §3.1).
    ``use_pallas`` selects the Pallas gather-interpolate kernel that
    computes both warps in a single VMEM-resident pass (BASELINE.json
    north_star); the downstream adaptive blend is elementwise and XLA fuses
    it into the surrounding graph for free. ``planar_out`` returns
    (B, C, H, W) planes — the Pallas kernel computes in planes, so this
    skips its output transpose (models/rrin planar-blend glue).
    """
    if use_pallas:
        try:
            from rrin_tpu.ops.warp_pallas import warp_pair_pallas
        except ImportError:
            warp_pair_pallas = None
        if warp_pair_pallas is not None:
            return warp_pair_pallas(
                i0, i1, flow_t0, flow_t1, align_corners=align_corners,
                pairs=pairs, planar_out=planar_out,
            )
    g0 = warp_bilinear(i0, flow_t0, align_corners=align_corners)
    g1 = warp_bilinear(i1, flow_t1, align_corners=align_corners)
    if planar_out:
        g0 = jnp.moveaxis(g0, -1, 1)
        g1 = jnp.moveaxis(g1, -1, 1)
    return g0, g1


def warp_blend(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    flow_t0: jnp.ndarray,
    flow_t1: jnp.ndarray,
    w0: jnp.ndarray,
    w1: jnp.ndarray,
    eps: float = 1e-8,
    align_corners: bool = False,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Double-warp + adaptive weighted blend (SURVEY.md App-A.4-5).

        g0 = warp(i0, flow_t0); g1 = warp(i1, flow_t1)
        coarse = (w0*g0 + w1*g1) / (w0 + w1 + eps)

    Returns (coarse, g0, g1) — g0/g1 are also inputs to the weight-map U-Net
    in the full cascade, so they are returned rather than kept internal.
    """
    g0, g1 = warp_pair(
        i0, i1, flow_t0, flow_t1, align_corners=align_corners, use_pallas=use_pallas
    )
    coarse = (w0 * g0 + w1 * g1) / (w0 + w1 + eps)
    return coarse, g0, g1
