"""On-device synthetic triplet generator (training data feed).

The reference ships no training code or data loaders (SURVEY.md §2.1); the
paper trained on Vimeo-90K triplets. This environment is air-gapped, so we
generate Vimeo-style linear-motion triplets — smooth random textures
translated by a per-sample subpixel motion, the middle frame exactly
midway — the same recipe as :func:`rrin_tpu.eval.synthesize_triplets`, but
ENTIRELY on device inside one jit:

  * zero host<->device transfer per step (the tunneled link here moves
    ~30 MB/s; a host feed would bottleneck training ~10x),
  * deterministic from a single PRNG key (reproducible runs),
  * batch-generated at full VPU rate (resize + 3 constant-flow warps).

A model trained on this feed learns real flow estimation + blending for
linear motion, which is what the quality/int8-calibration evidence needs
(VERDICT r2 item 5): trained networks have non-random activation
statistics that per-tensor absmax calibration must survive.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rrin_tpu.ops.warp import warp_bilinear


@partial(jax.jit, static_argnames=("batch", "hw", "texture_cells"))
def synthetic_triplet_batch(
    key: jax.Array,
    batch: int,
    hw: Tuple[int, int] = (256, 448),
    max_shift: float = 6.0,
    texture_cells: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(i0, gt, i1) float32 NHWC in [0,1]: linear-motion triplets.

    A (2H, 2W) smooth texture per sample (bilinear-upsampled uniform
    noise, one cell per ``texture_cells`` pixels) is sampled at three
    window positions offset by j*(dx, dy), j = 0, 1, 2 — backward warps
    with constant flow, then a center crop, so gt is the exact midpoint
    of a linear motion (mirrors eval.synthesize_triplets's cv2.warpAffine
    recipe, reference eval.py:67-98).
    """
    h, w = hw
    kt, km = jax.random.split(key)
    # Smooth texture: low-res uniform noise, bilinear-resized to (2H, 2W).
    th, tw = 2 * h // texture_cells, 2 * w // texture_cells
    base = jax.random.uniform(kt, (batch, th, tw, 3), jnp.float32)
    tex = jax.image.resize(base, (batch, 2 * h, 2 * w, 3), "bilinear")
    # Per-sample subpixel motion.
    d = jax.random.uniform(km, (batch, 2), jnp.float32, -max_shift, max_shift)

    y0, x0 = h // 2, w // 2  # center-crop origin

    def frame(j):
        flow = jnp.broadcast_to(
            (d * j)[:, None, None, :], (batch, 2 * h, 2 * w, 2)
        )
        # align_corners=True semantics = plain absolute-pixel sampling
        # (no edge renormalization) — the intended "shift by j*d" motion.
        full = warp_bilinear(tex, flow, align_corners=True)
        return full[:, y0 : y0 + h, x0 : x0 + w, :]

    # j=0 is the identity: a plain crop (saves one full-texture gather).
    i0 = tex[:, y0 : y0 + h, x0 : x0 + w, :]
    return i0, frame(1.0), frame(2.0)
