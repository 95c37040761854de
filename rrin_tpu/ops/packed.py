"""Phase-packed activation layout: ops that keep the U-Net in lane-packed
form between conv kernels.

Round-1 profiling showed ~35% of 1080p frame time in XLA `copy`/`pad`/
`reshape` fusions converting between the channels-minor NHWC layout and
the phase-conv kernel's packed layout at EVERY kernel boundary
(docs/PERFORMANCE.md). This module removes those round-trips by carrying
activations packed through the whole low-channel segment of the U-Net.

Layout
------
A packed tensor has shape ``(B, H, M, L)`` with ``L = P*C`` lanes: P
consecutive *storage* pixels ride the lane dim next to the channels, lane
index ``= slot*C + c``. Real pixel ``x`` lives at storage position
``x + off`` (group ``(x+off)//P``, slot ``(x+off)%P``); storage positions
outside ``[off, off+W)`` are guard slots and are ALWAYS ZERO — the conv
kernel (ops/conv_packed.py) relies on that for its SAME zero padding, so
every op here preserves the invariant. H is never packed or padded; H
guards are handled inside the conv kernel.

P halves at every pooling level (4 -> 2 -> 1) so that **M (the sublane
dim) is constant across levels** and pool/upsample are pure LANE ops:
no 5D reshapes, no sublane regrouping, nothing XLA could turn into a
layout copy. (P=1 packed with off=0 is literally NHWC with a padded
width.) Offsets are static ints carried in :class:`PackedSpec`; the
U-Net offset plan (models/unet.py) chooses them so no realignment is
ever needed.

All ops here are pure jnp and run on any backend; tests compare them
against the NHWC reference ops in ops/resize.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PackedSpec:
    """Static description of a packed tensor (hashable -> jit-static)."""

    p: int      # storage pixels per lane group
    c: int      # real channels
    w: int      # real width (pixels)
    off: int    # storage position of real pixel 0
    m: int      # storage groups (the sublane dim); storage width = m*p

    def __post_init__(self):
        assert self.off >= 0 and self.off + self.w <= self.m * self.p, self

    @property
    def lanes(self) -> int:
        return self.p * self.c


def pack(
    x: jnp.ndarray, p: int, off: int, m: int, c_pad: Optional[int] = None
) -> Tuple[jnp.ndarray, PackedSpec]:
    """NHWC (B,H,W,C) -> packed (B,H,M,P*C'), C' = c_pad or C.

    ``c_pad`` zero-extends the channel dim BEFORE packing so the lane
    count comes out DMA-ready (e.g. 6ch * P4 -> pad to 32ch -> 128 lanes)
    in the same single pad+reshape, instead of a separate lane pad. The
    conv kernel's B2 carries matching zero rows, so c_pad is free
    numerically; spec.c records the PADDED channel count.
    """
    b, h, w, c = x.shape
    cp = c_pad if c_pad is not None else c
    spec = PackedSpec(p=p, c=cp, w=w, off=off, m=m)
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (off, m * p - off - w), (0, cp - c))
    )
    return xp.reshape(b, h, m, p * cp), spec


def unpack(x: jnp.ndarray, spec: PackedSpec, c: Optional[int] = None) -> jnp.ndarray:
    """Packed (B,H,M,L) -> NHWC (B,H,W,C). For P=1 this is a plain width
    slice (no reshape). ``c`` drops channel padding added at pack time."""
    b, h, m, lanes = x.shape
    assert lanes >= spec.lanes
    if lanes > spec.lanes:  # drop DMA lane padding
        x = x[..., : spec.lanes]
    if spec.p > 1:
        x = x.reshape(b, h, m * spec.p, spec.c)
    y = x[:, :, spec.off : spec.off + spec.w, :]
    return y[..., :c] if c is not None else y


def pad_lanes(x: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """Zero-pad the lane dim (DMA minor dims must be 128-multiples)."""
    if x.shape[-1] == lanes:
        return x
    assert x.shape[-1] < lanes
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, lanes - x.shape[-1]),))


def _roll_groups_next(x: jnp.ndarray) -> jnp.ndarray:
    """y[:, :, g] = x[:, :, g+1] (zero group shifted in at the end).
    A sublane shift — no lane movement, no layout change."""
    return jnp.concatenate(
        [x[:, :, 1:, :], jnp.zeros_like(x[:, :, :1, :])], axis=2
    )


def _roll_groups_prev(x: jnp.ndarray) -> jnp.ndarray:
    """y[:, :, g] = x[:, :, g-1] (zero group shifted in at the front)."""
    return jnp.concatenate(
        [jnp.zeros_like(x[:, :, :1, :]), x[:, :, :-1, :]], axis=2
    )


def avg_pool_2x_packed(
    x: jnp.ndarray, spec: PackedSpec
) -> Tuple[jnp.ndarray, PackedSpec]:
    """2x2 stride-2 average pool; P halves, M constant (pure lane op).

    Matches ops.resize.avg_pool_2x on the unpacked view. Requires P >= 2.
    Output offset o' and the in-storage shift d = off - 2*o' satisfy
    d in {0, 1}: even offsets pool in place (d=0); odd offsets read the
    slot pairs one step to the right (d=1), which only needs the
    next-group roll for the last slot pair. Guards stay zero.
    """
    b, h, m, lanes = x.shape
    assert lanes == spec.lanes and spec.p >= 2 and spec.p % 2 == 0
    assert h % 2 == 0 and spec.w % 2 == 0
    p, c = spec.p, spec.c
    d = spec.off % 2          # 0: in slots (2i, 2i+1); 1: (2i+1, 2i+2)
    o2 = spec.off // 2

    # H: average row pairs. Leading-dim reshape + static slices (free on
    # TPU) — the strided form x[:, 0::2] + x[:, 1::2] lowered to
    # iota+gather fusions worth ~2 ms/frame at 1080p.
    x = x.reshape(b, h // 2, 2, m, lanes)
    x = x[:, :, 0] + x[:, :, 1]

    # W: lane-block pairs. out slot i (P/2 slots) <- in slots 2i+d, 2i+1+d.
    nxt = _roll_groups_next(x) if d else None
    blocks = []
    for i in range(p // 2):
        s0, s1 = 2 * i + d, 2 * i + 1 + d
        a = x[..., s0 * c : (s0 + 1) * c]
        bblk = (
            x[..., s1 * c : (s1 + 1) * c]
            if s1 < p
            else nxt[..., (s1 - p) * c : (s1 - p + 1) * c]
        )
        blocks.append(a + bblk)
    y = jnp.concatenate(blocks, axis=-1) if len(blocks) > 1 else blocks[0]
    y = y * 0.25
    return y, PackedSpec(p=p // 2, c=c, w=spec.w // 2, off=o2, m=m)


def upsample_2x_packed(
    x: jnp.ndarray, spec: PackedSpec
) -> Tuple[jnp.ndarray, PackedSpec]:
    """2x bilinear upsample (torch align_corners=False); P doubles, M
    constant (pure lane op). Output offset = 2*off.

    even out storage 2j <- 0.25*in[j-1] + 0.75*in[j]
    odd  out storage 2j+1 <- 0.75*in[j] + 0.25*in[j+1]
    plus the two real-border clamp corrections and guard re-zeroing
    (in[j +- 1] at the borders are guard zeros; real semantics clamp).
    """
    b, h, m, lanes = x.shape
    assert lanes == spec.lanes
    p, c, off, w = spec.p, spec.c, spec.off, spec.w

    prv = _roll_groups_prev(x)
    nxt = _roll_groups_next(x)

    def slot(j):  # lane block of in-storage slot j (j in [-1, p])
        if j < 0:
            return prv[..., (j + p) * c : (j + p + 1) * c]
        if j >= p:
            return nxt[..., (j - p) * c : (j - p + 1) * c]
        return x[..., j * c : (j + 1) * c]

    # out slot 2j   (even storage) = 0.25*slot(j-1) + 0.75*slot(j)
    # out slot 2j+1 (odd storage)  = 0.75*slot(j)   + 0.25*slot(j+1)
    blocks = []
    for j in range(p):
        blocks.append(0.25 * slot(j - 1) + 0.75 * slot(j))
        blocks.append(0.75 * slot(j) + 0.25 * slot(j + 1))
    y = jnp.concatenate(blocks, axis=-1)
    ospec = PackedSpec(p=2 * p, c=c, w=2 * w, off=2 * off, m=m)

    # Border corrections + guard re-zero (static lane/group addressing).
    def lane_block(s):  # (group, lane slice) of out storage pixel s
        return s // (2 * p), slice((s % (2 * p)) * c, (s % (2 * p) + 1) * c)

    def in_block(s):
        return s // p, slice((s % p) * c, (s % p + 1) * c)

    gi, li = in_block(off)
    v_first = x[:, :, gi, li]
    gi, li = in_block(off + w - 1)
    v_last = x[:, :, gi, li]
    g, l = lane_block(2 * off)
    y = y.at[:, :, g, l].add(0.25 * v_first)
    g, l = lane_block(2 * off + 2 * w - 1)
    y = y.at[:, :, g, l].add(0.25 * v_last)
    if 2 * off >= 1:
        g, l = lane_block(2 * off - 1)
        y = y.at[:, :, g, l].set(0.0)
    if 2 * (off + w) < 2 * p * m:
        g, l = lane_block(2 * (off + w))
        y = y.at[:, :, g, l].set(0.0)

    # H direction: plain interleave (edge-clamp is exact here).
    hprev = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    hnext = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
    heven = 0.25 * hprev + 0.75 * y
    hodd = 0.75 * y + 0.25 * hnext
    y = jnp.stack([heven, hodd], axis=2).reshape(b, 2 * h, m, 2 * p * c)
    return y, ospec


def concat_packed(
    x: jnp.ndarray, sx: PackedSpec, y: jnp.ndarray, sy: PackedSpec
) -> Tuple[jnp.ndarray, PackedSpec]:
    """Channel concat in packed layout (lane interleave).

    NOTE: prefer the dual-input form of ops.conv_packed.conv_packed when
    the concat feeds a packed conv — it splits the contraction instead
    and skips this materialization entirely.
    """
    assert sx.p == sy.p and sx.m == sy.m and sx.off == sy.off and sx.w == sy.w, (
        f"concat_packed alignment mismatch: {sx} vs {sy}"
    )
    p = sx.p
    if p == 1:
        z = jnp.concatenate([x, y], axis=-1)
    else:
        blocks = []
        for i in range(p):
            blocks.append(x[..., i * sx.c : (i + 1) * sx.c])
            blocks.append(y[..., i * sy.c : (i + 1) * sy.c])
        z = jnp.concatenate(blocks, axis=-1)
    return z, PackedSpec(p=p, c=sx.c + sy.c, w=sx.w, off=sx.off, m=sx.m)
