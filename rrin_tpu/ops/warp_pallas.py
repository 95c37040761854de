"""Pallas TPU kernel: backward bilinear warp (the project's custom kernel).

Replaces the XLA gather path of ops/warp.py on TPU (BASELINE.json
north_star: grid_sample becomes "a Pallas gather-interpolate kernel").
Profiling showed XLA lowers the 4 bilinear taps to row-at-a-time gathers
that consume ~50% of the cascade's runtime; this kernel recovers most of
that with a VMEM-resident windowed gather design:

  * Images are processed planar (B, 3, H, Wp), W padded to the 128-lane
    width. The three channels share one index/mask computation per trip
    (gather ops, not arithmetic, are the binding cost on the VPU).
  * Grid = (batch, H/RB row-blocks). Each step DMAs a WIN-row full-width
    window per channel from HBM into VMEM, centered on the output block:
    vertical displacements up to (WIN-RB)/2 - 2 rows stay on the fast
    path; a cheap XLA-side max-reduce routes larger flows to the
    always-correct XLA gather fallback via lax.cond. Horizontal
    displacement is unbounded (whole rows are resident).
  * Mosaic's dynamic gather is per-tile (lane gather needs a 128-wide
    operand; dynamic sublane slices must be 8-aligned), so the kernel
    walks output in 128-column chunks and, per chunk, reduces the dynamic
    source-row/source-tile ranges with vector min/max before looping:
    smooth flow touches ~RB+spread rows and 1-3 column tiles instead of
    the whole window.
  * Per source row r: the row is broadcast to all sublanes with a one-hot
    (RB x 8) matmul on the MXU (cheaper than a sublane gather + concat);
    two lane gathers fetch the x0 / x0+1 taps; tile-match masks give
    zeros-padding horizontally for free (arithmetic >> keeps negative x
    off every tile); the two vertical taps share the same gathered row
    through the weight field (y0==r)*(1-wy) + (y0+1==r)*wy, so 4 bilinear
    taps cost 2 gathers per channel.

Sampling semantics match ops/warp.py (grid_sample, zeros padding, both
align_corners variants) to float32 accuracy; equivalence is asserted by
tests/test_warp_pallas.py in interpret mode and on real TPU by the
verify drives / benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops.warp import warp_bilinear

LANES = 128
RB = 16  # output rows per grid step
WIN_MAX = 64  # VMEM window rows (per channel, full width)

# Tests set this to exercise the kernel in interpret mode on CPU.
_FORCE_KERNEL = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sample_coords_nhw(
    flow: jnp.ndarray, height: int, width: int, align_corners: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute sample positions (sy, sx), each (B, H, W) float32."""
    f = flow.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, f.shape[:-1], 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, f.shape[:-1], 1)
    px = xs + f[..., 0]
    py = ys + f[..., 1]
    if align_corners:
        return py, px
    sx = px * (width / max(width - 1, 1)) - 0.5
    sy = py * (height / max(height - 1, 1)) - 0.5
    return sy, sx


def _warp_kernel_pairs(H: int, Wp: int, win_rows: int):
    """Channel-paired variant: the 3 bf16 channels ride TWO f32 planes
    (plane0 = bitcast(c0,c1) pairs, plane1 = bitcast(c2,0)), so each
    bilinear tap needs 2 lane gathers instead of 3 and the VMEM window
    shrinks by a third. Mosaic has no 16-bit gathers (verified: bf16
    take_along_axis fails to compile), so gathering the PAIR as one f32
    and splitting it with in-register integer shifts is the TPU-native
    way to halve gather bytes. Used by the bf16 compute path; quality
    cost is only the input's bf16 rounding (exact f32 accumulation).

    Round 3: the source-row loop runs per 8-row OUTPUT SUBBLOCK with a
    per-subblock [rmin, rmax] — a source row only matters to the ~2
    output rows whose y0 hits it, so per-subblock ranges skip roughly
    half of the (rows x vregs) gather/mask work the old whole-RB loop
    burned (each row iteration also now touches (8,128) vregs, not
    (16,128), and the row8->RB broadcast concat is gone).
    """
    n_oc = Wp // LANES

    def kernel(img_ref, sxy_ref, out_ref, w0, w1, sem):
        b = pl.program_id(0)
        rb = pl.program_id(1)
        r0 = rb * RB
        ws = jnp.clip(r0 + RB // 2 - win_rows // 2, 0, H - win_rows)
        ws = pl.multiple_of((ws >> 3) << 3, 8)

        wrefs = (w0, w1)
        copies = [
            pltpu.make_async_copy(
                img_ref.at[b, c, pl.ds(ws, win_rows), :], wrefs[c], sem.at[c]
            )
            for c in range(2)
        ]
        for cp in copies:
            cp.start()

        sx = sxy_ref[0, 0]
        sy = sxy_ref[0, 1]
        x0f = jnp.floor(sx)
        y0f = jnp.floor(sy)
        wx = sx - x0f
        wy = sy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        yl = y0 - ws

        for cp in copies:
            cp.wait()

        def lo(u):  # f32 holding (bf16 lo, bf16 hi) -> lo as f32
            return pltpu.bitcast(u << 16, jnp.float32)

        def hi(u):
            return pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)

        for oc in range(n_oc):
            sl = slice(oc * LANES, (oc + 1) * LANES)
            for sb in range(RB // 8):
                rs = slice(sb * 8, (sb + 1) * 8)
                x0c = x0[rs, sl]
                x1c = x0c + 1
                wxc = wx[rs, sl]
                cw0 = 1.0 - wxc
                cw1 = wxc
                xl0 = x0c & (LANES - 1)
                xl1 = x1c & (LANES - 1)
                xt0 = x0c >> 7
                xt1 = x1c >> 7
                ylc = yl[rs, sl]
                wyc = wy[rs, sl]

                rmin = jnp.clip(jnp.min(ylc), 0, win_rows - 1)
                rmax = jnp.clip(jnp.max(ylc) + 1, 0, win_rows - 1)

                def row_body(r, accs, ylc=ylc, wyc=wyc, xl0=xl0, xl1=xl1,
                             xt0=xt0, xt1=xt1, cw0=cw0, cw1=cw1):
                    wrow = jnp.where(ylc == r, 1.0 - wyc, 0.0) + jnp.where(
                        ylc == r - 1, wyc, 0.0
                    )
                    g8 = pl.multiple_of((r >> 3) * 8, 8)
                    ridx = jnp.full((8, LANES), r & 7, jnp.int32)

                    out = list(accs)
                    # STATIC tile visits {oc-1, oc, oc+1}: even zero flow
                    # straddles tile edges (x0 = x - 0.5), and a DYNAMIC
                    # tile fori_loop measured ~12x slower than static
                    # slices (Mosaic cannot pipeline a dynamic-trip inner
                    # loop). The fast-path guard bounds in-image |dx| so
                    # no tap can land outside these three tiles.
                    for xt in (oc - 1, oc, oc + 1):
                        if xt < 0 or xt >= n_oc:
                            continue
                        m0 = (xt0 == xt).astype(jnp.float32) * cw0
                        m1 = (xt1 == xt).astype(jnp.float32) * cw1
                        for c in range(2):
                            sub = wrefs[c][
                                pl.ds(g8, 8), xt * LANES:(xt + 1) * LANES]
                            row8 = jnp.take_along_axis(sub, ridx, axis=0)
                            gv0 = jnp.take_along_axis(row8, xl0, axis=1)
                            gv1 = jnp.take_along_axis(row8, xl1, axis=1)
                            u0 = pltpu.bitcast(gv0, jnp.uint32)
                            u1 = pltpu.bitcast(gv1, jnp.uint32)
                            if c == 0:
                                out[0] = out[0] + wrow * (
                                    m0 * lo(u0) + m1 * lo(u1))
                                out[1] = out[1] + wrow * (
                                    m0 * hi(u0) + m1 * hi(u1))
                            else:
                                out[2] = out[2] + wrow * (
                                    m0 * lo(u0) + m1 * lo(u1))
                    return tuple(out)

                zero = jnp.zeros((8, LANES), jnp.float32)
                acc = jax.lax.fori_loop(
                    rmin, rmax + 1, row_body, (zero, zero, zero)
                )
                for c in range(3):
                    out_ref[0, c, rs, sl] = acc[c]

    return kernel


@partial(jax.jit, static_argnames=("align_corners",))
def _warp_planar_pallas_pairs(
    img_p: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, align_corners: bool
) -> jnp.ndarray:
    """img_p: (B, 2, H, Wp) f32 of bitcast bf16 pairs; sx/sy: (B, H, Wp)."""
    b, c, h, wp = img_p.shape
    assert c == 2 and h % RB == 0 and wp % LANES == 0
    win_rows = min(WIN_MAX, h)
    sxy = jnp.stack([sx, sy], axis=1)

    kernel = _warp_kernel_pairs(h, wp, win_rows)
    return pl.pallas_call(
        kernel,
        grid=(b, h // RB),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (1, 2, RB, wp), lambda bi, ri: (bi, 0, ri, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, RB, wp), lambda bi, ri: (bi, 0, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp), jnp.float32),
            pltpu.VMEM((win_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(img_p, sxy)


def _warp_kernel_u8(H: int, Wp: int, win_rows: int):
    """Byte-packed variant: the 3 channels ride ONE f32 plane as packed
    uint8 bytes (c0 | c1<<8 | c2<<16, bitcast to f32 for the 32-bit lane
    gathers), so each bilinear tap needs 1 lane gather instead of the
    pairs variant's 2 (and the f32 variant's 3), the per-row sublane
    broadcast drops from 2-3 to 1, and the VMEM window / window DMA is a
    single plane — half the pairs variant's bytes.

    Exactness: the production warp sources are the INPUT FRAMES, which
    are uint8-decoded and normalized as u8 * (1/255) (pipeline.py) — the
    kernel's per-tap dequantization f32(byte) * (1/255) reproduces those
    f32 values exactly, so unlike the pairs variant there is NO input
    rounding loss in production (bf16 rounding of u8/255 values costs
    ~2^-9 relative; bytes are exact). The 1/255 scale is folded into the
    horizontal tap weights (one mul per chunk instead of six per tap).
    On arbitrary (non-u8-sourced) f32 images the variant quantizes the
    source to 8 bits — callers opt in via pairs="u8" only where sources
    are u8-exact.
    """
    n_oc = Wp // LANES
    inv255 = 1.0 / 255.0  # Python float: a jnp scalar would be a captured const

    def kernel(img_ref, sxy_ref, out_ref, w0, sem):
        b = pl.program_id(0)
        rb = pl.program_id(1)
        r0 = rb * RB
        ws = jnp.clip(r0 + RB // 2 - win_rows // 2, 0, H - win_rows)
        ws = pl.multiple_of((ws >> 3) << 3, 8)

        cp = pltpu.make_async_copy(
            img_ref.at[b, 0, pl.ds(ws, win_rows), :], w0, sem
        )
        cp.start()

        sx = sxy_ref[0, 0]
        sy = sxy_ref[0, 1]
        x0f = jnp.floor(sx)
        y0f = jnp.floor(sy)
        wx = sx - x0f
        wy = sy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        yl = y0 - ws

        cp.wait()

        def byte(v, sh):  # packed i32 -> one channel as f32 in [0, 255]
            return ((v >> sh) & 255).astype(jnp.float32)

        for oc in range(n_oc):
            sl = slice(oc * LANES, (oc + 1) * LANES)
            for sb in range(RB // 8):
                rs = slice(sb * 8, (sb + 1) * 8)
                x0c = x0[rs, sl]
                x1c = x0c + 1
                wxc = wx[rs, sl]
                # 1/255 dequant folded into the horizontal weights.
                cw0 = (1.0 - wxc) * inv255
                cw1 = wxc * inv255
                xl0 = x0c & (LANES - 1)
                xl1 = x1c & (LANES - 1)
                xt0 = x0c >> 7
                xt1 = x1c >> 7
                ylc = yl[rs, sl]
                wyc = wy[rs, sl]

                rmin = jnp.clip(jnp.min(ylc), 0, win_rows - 1)
                rmax = jnp.clip(jnp.max(ylc) + 1, 0, win_rows - 1)

                def row_body(r, accs, ylc=ylc, wyc=wyc, xl0=xl0, xl1=xl1,
                             xt0=xt0, xt1=xt1, cw0=cw0, cw1=cw1):
                    wrow = jnp.where(ylc == r, 1.0 - wyc, 0.0) + jnp.where(
                        ylc == r - 1, wyc, 0.0
                    )
                    g8 = pl.multiple_of((r >> 3) * 8, 8)
                    ridx = jnp.full((8, LANES), r & 7, jnp.int32)

                    out = list(accs)
                    # STATIC tile visits (see _warp_kernel_pairs).
                    for xt in (oc - 1, oc, oc + 1):
                        if xt < 0 or xt >= n_oc:
                            continue
                        m0 = (xt0 == xt).astype(jnp.float32) * cw0
                        m1 = (xt1 == xt).astype(jnp.float32) * cw1
                        sub = w0[pl.ds(g8, 8), xt * LANES:(xt + 1) * LANES]
                        row8 = jnp.take_along_axis(sub, ridx, axis=0)
                        gv0 = jnp.take_along_axis(row8, xl0, axis=1)
                        gv1 = jnp.take_along_axis(row8, xl1, axis=1)
                        v0 = pltpu.bitcast(gv0, jnp.int32)
                        v1 = pltpu.bitcast(gv1, jnp.int32)
                        for c, sh in enumerate((0, 8, 16)):
                            out[c] = out[c] + wrow * (
                                m0 * byte(v0, sh) + m1 * byte(v1, sh))
                    return tuple(out)

                zero = jnp.zeros((8, LANES), jnp.float32)
                acc = jax.lax.fori_loop(
                    rmin, rmax + 1, row_body, (zero, zero, zero)
                )
                for c in range(3):
                    out_ref[0, c, rs, sl] = acc[c]

    return kernel


@partial(jax.jit, static_argnames=("align_corners",))
def _warp_planar_pallas_u8(
    img_p: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, align_corners: bool
) -> jnp.ndarray:
    """img_p: (B, 1, H, Wp) f32 of bitcast packed u8x3; sx/sy: (B, H, Wp)."""
    b, c, h, wp = img_p.shape
    assert c == 1 and h % RB == 0 and wp % LANES == 0
    win_rows = min(WIN_MAX, h)
    sxy = jnp.stack([sx, sy], axis=1)

    kernel = _warp_kernel_u8(h, wp, win_rows)
    return pl.pallas_call(
        kernel,
        grid=(b, h // RB),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (1, 2, RB, wp), lambda bi, ri: (bi, 0, ri, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, RB, wp), lambda bi, ri: (bi, 0, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(img_p, sxy)


def _warp_kernel(H: int, Wp: int, win_rows: int):
    """Kernel body builder; all sizes static. Channels are planar; the
    image is zero-padded to Wp lanes so x >= W naturally samples zeros."""
    n_oc = Wp // LANES

    def kernel(img_ref, sxy_ref, out_ref, w0, w1, w2, sem):
        b = pl.program_id(0)
        rb = pl.program_id(1)
        r0 = rb * RB
        # 8-aligned window start (sublane-aligned DMA source offset).
        ws = jnp.clip(r0 + RB // 2 - win_rows // 2, 0, H - win_rows)
        ws = pl.multiple_of((ws >> 3) << 3, 8)

        wrefs = (w0, w1, w2)
        copies = [
            pltpu.make_async_copy(
                img_ref.at[b, c, pl.ds(ws, win_rows), :], wrefs[c], sem.at[c]
            )
            for c in range(3)
        ]
        for cp in copies:
            cp.start()

        sx = sxy_ref[0, 0]  # (RB, Wp)
        sy = sxy_ref[0, 1]
        x0f = jnp.floor(sx)
        y0f = jnp.floor(sy)
        wx = sx - x0f
        wy = sy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        yl = y0 - ws  # local window row of the y0 tap

        for cp in copies:
            cp.wait()

        for oc in range(n_oc):
            sl = slice(oc * LANES, (oc + 1) * LANES)
            # Per 8-row output subblock (see _warp_kernel_pairs): source
            # rows only matter to the subblock whose y0 hits them, so
            # per-subblock [rmin, rmax] halves the row-loop waste.
            for sb in range(RB // 8):
                rs = slice(sb * 8, (sb + 1) * 8)
                x0c = x0[rs, sl]
                x1c = x0c + 1
                wxc = wx[rs, sl]
                # x>=Wp -> tile-match fails; x in [W, Wp) samples the zero
                # pad; x<0 -> arithmetic >> keeps it off every tile. So
                # horizontal zeros padding needs no explicit masks at all.
                cw0 = 1.0 - wxc
                cw1 = wxc
                xl0 = x0c & (LANES - 1)
                xl1 = x1c & (LANES - 1)
                xt0 = x0c >> 7
                xt1 = x1c >> 7
                ylc = yl[rs, sl]
                wyc = wy[rs, sl]

                rmin = jnp.clip(jnp.min(ylc), 0, win_rows - 1)
                rmax = jnp.clip(jnp.max(ylc) + 1, 0, win_rows - 1)

                def row_body(r, accs, ylc=ylc, wyc=wyc, xl0=xl0, xl1=xl1,
                             xt0=xt0, xt1=xt1, cw0=cw0, cw1=cw1):
                    # Row r serves both vertical taps: y0==r and y0+1==r.
                    wrow = jnp.where(ylc == r, 1.0 - wyc, 0.0) + jnp.where(
                        ylc == r - 1, wyc, 0.0
                    )
                    g8 = pl.multiple_of((r >> 3) * 8, 8)
                    ridx = jnp.full((8, LANES), r & 7, jnp.int32)

                    out = list(accs)
                    # STATIC tile visits (see _warp_kernel_pairs).
                    for xt in (oc - 1, oc, oc + 1):
                        if xt < 0 or xt >= n_oc:
                            continue
                        m0 = (xt0 == xt).astype(jnp.float32) * cw0
                        m1 = (xt1 == xt).astype(jnp.float32) * cw1
                        for c in range(3):
                            sub = wrefs[c][
                                pl.ds(g8, 8), xt * LANES:(xt + 1) * LANES]
                            # Exact row broadcast: constant-index sublane
                            # gather to the 8 subblock rows.
                            row8 = jnp.take_along_axis(sub, ridx, axis=0)
                            gv0 = jnp.take_along_axis(row8, xl0, axis=1)
                            gv1 = jnp.take_along_axis(row8, xl1, axis=1)
                            out[c] = out[c] + wrow * (m0 * gv0 + m1 * gv1)
                    return tuple(out)

                zero = jnp.zeros((8, LANES), jnp.float32)
                acc = jax.lax.fori_loop(
                    rmin, rmax + 1, row_body, (zero, zero, zero)
                )
                for c in range(3):
                    out_ref[0, c, rs, sl] = acc[c]

    return kernel


@partial(jax.jit, static_argnames=("align_corners",))
def _warp_planar_pallas(
    img_p: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, align_corners: bool
) -> jnp.ndarray:
    """img_p: (B, 3, H, Wp) f32 zero-padded; sx/sy: (B, H, Wp) f32."""
    b, c, h, wp = img_p.shape
    assert c == 3 and h % RB == 0 and wp % LANES == 0
    win_rows = min(WIN_MAX, h)
    sxy = jnp.stack([sx, sy], axis=1)  # (B, 2, H, Wp)

    kernel = _warp_kernel(h, wp, win_rows)
    return pl.pallas_call(
        kernel,
        grid=(b, h // RB),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (1, 2, RB, wp), lambda bi, ri: (bi, 0, ri, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, RB, wp), lambda bi, ri: (bi, 0, ri, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp), jnp.float32),
            pltpu.VMEM((win_rows, wp), jnp.float32),
            pltpu.VMEM((win_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(img_p, sxy)


def _dy_fast_path_ok(sy: jnp.ndarray, height: int) -> jnp.ndarray:
    """True iff all vertical displacements fit the VMEM window."""
    win_rows = min(WIN_MAX, height)
    bound = win_rows // 2 - RB // 2 - 2
    rows = jax.lax.broadcasted_iota(jnp.float32, sy.shape, 1)
    return jnp.max(jnp.abs(sy - rows)) <= bound


def _fast_path_ok(sy: jnp.ndarray, sx: jnp.ndarray, height: int) -> jnp.ndarray:
    """Fast-path routability: vertical displacements fit the VMEM window
    AND horizontal displacements stay within one 128-lane tile of the
    output chunk (the kernel visits the three STATIC tiles {oc-1, oc,
    oc+1} — a dynamic-trip tile loop measured ~12x slower in Mosaic)."""
    cols = jax.lax.broadcasted_iota(jnp.float32, sx.shape, 2)
    dx_ok = jnp.max(jnp.abs(sx - cols)) <= 126.0
    return jnp.logical_and(_dy_fast_path_ok(sy, height), dx_ok)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def warp_one_pallas(
    img: jnp.ndarray, flow: jnp.ndarray, align_corners: bool = False,
    pairs=False, planar_out: bool = False,
) -> jnp.ndarray:
    """Warp (B,H,W,C=3) by (B,H,W,2): Pallas fast path + XLA fallback.

    Differentiable: the backward pass reuses the XLA gather formulation
    (jax.vjp of ops.warp.warp_bilinear), so training (rrin_tpu/train.py)
    can run the fast kernel forward with exact gradients.

    ``pairs=True`` selects the channel-paired bf16 variant (2 gathers per
    tap instead of 3, 1/3 less window VMEM/bandwidth) — quality cost is
    the input's bf16 rounding only; used on the bf16 compute path.
    ``pairs="u8"`` selects the byte-packed variant (1 gather per tap,
    half the pairs variant's window bytes) — EXACT when the source is
    u8-derived (frames normalized as u8 * (1/255)), 8-bit quantizing
    otherwise. See _warp_kernel_u8.

    ``planar_out=True`` returns (B, C, H, W) instead of NHWC — the fast
    branch then skips its planar->NHWC transpose entirely (the kernel
    computes in planes); downstream planar glue (models/rrin._cascade
    under RRIN_PLANAR_BLEND) consumes the planes directly.
    """
    b, h, w, c = img.shape
    if c != 3 or h % RB or h < 32:
        out = warp_bilinear(img, flow, align_corners=align_corners)
        return jnp.moveaxis(out, -1, 1) if planar_out else out
    if not _FORCE_KERNEL:  # interpret-mode tests on CPU force the kernel
        # The Mosaic kernel only lowers for TPU; select per PLATFORM at
        # lowering time (not by the process default backend).
        def _default(a, b_):
            out = warp_bilinear(a, b_, align_corners=align_corners)
            return jnp.moveaxis(out, -1, 1) if planar_out else out

        return jax.lax.platform_dependent(
            img, flow,
            tpu=lambda a, b_: _warp_one_tpu(
                a, b_, align_corners, pairs, planar_out),
            default=_default,
        )
    return _warp_one_tpu(img, flow, align_corners, pairs, planar_out)


def _warp_one_tpu(
    img: jnp.ndarray, flow: jnp.ndarray, align_corners: bool,
    pairs=False, planar_out: bool = False,
) -> jnp.ndarray:
    b, h, w, c = img.shape

    sy, sx = _sample_coords_nhw(flow, h, w, align_corners)
    wp = _round_up(w, LANES)
    pad = wp - w
    if pad:
        # Pad output columns sample nothing: x far out of range, y to row 0.
        sx = jnp.pad(sx, ((0, 0), (0, 0), (0, pad)), constant_values=-2.0)
        sy = jnp.pad(sy, ((0, 0), (0, 0), (0, pad)), constant_values=0.0)

    if pairs == "u8":
        # One f32 plane of bitcast packed bytes c0 | c1<<8 | c2<<16.
        # round(img*255) recovers the exact source bytes when img came
        # from u8 * (1/255); the kernel dequantizes f32(byte) * (1/255).
        u = jnp.round(jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0
                      ).astype(jnp.int32)
        packed = u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
        if pad:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
        img_planar = jax.lax.bitcast_convert_type(
            packed, jnp.float32)[:, None]  # (B,1,H,Wp)
    elif pairs:
        imgb = img.astype(jnp.bfloat16)
        if pad:
            imgb = jnp.pad(imgb, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # Two f32 planes of bitcast bf16 pairs: (c0,c1) and (c2,0).
        p01 = jax.lax.bitcast_convert_type(imgb[..., 0:2], jnp.float32)
        p2 = jax.lax.bitcast_convert_type(
            jnp.concatenate([imgb[..., 2:3], jnp.zeros_like(imgb[..., :1])],
                            axis=-1),
            jnp.float32,
        )
        img_planar = jnp.stack([p01, p2], axis=1)  # (B,2,H,Wp)
    else:
        imgf = img.astype(jnp.float32)
        if pad:
            imgf = jnp.pad(imgf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        img_planar = jnp.transpose(imgf, (0, 3, 1, 2))  # (B,3,H,Wp)

    def fast(_):
        if pairs == "u8":
            out_p = _warp_planar_pallas_u8(img_planar, sx, sy, align_corners)
        elif pairs:
            out_p = _warp_planar_pallas_pairs(img_planar, sx, sy, align_corners)
        else:
            out_p = _warp_planar_pallas(img_planar, sx, sy, align_corners)
        if planar_out:  # (B, C, H, W): no transpose at all
            return out_p[:, :, :, :w]
        out = jnp.transpose(out_p, (0, 2, 3, 1))
        return out[:, :, :w, :]

    def slow(_):
        if pairs == "u8":
            src = jnp.round(
                jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0
            ) * (1.0 / 255.0)
        elif pairs:
            src = img.astype(jnp.bfloat16).astype(jnp.float32)
        else:
            src = img
        out = warp_bilinear(src, flow, align_corners=align_corners)
        return jnp.moveaxis(out, -1, 1) if planar_out else out

    return jax.lax.cond(
        _fast_path_ok(sy[:, :, :w], sx[:, :, :w], h), fast, slow,
        operand=None,
    )


def _warp_one_fwd(img, flow, align_corners, pairs, planar_out):
    return (warp_one_pallas(img, flow, align_corners, pairs, planar_out),
            (img, flow))


def _warp_one_bwd(align_corners, pairs, planar_out, res, g):
    img, flow = res
    if planar_out:  # cotangent arrives planar; the primal math is NHWC
        g = jnp.moveaxis(g, 1, -1)
    _, vjp = jax.vjp(
        lambda im, fl: warp_bilinear(im, fl, align_corners=align_corners),
        img, flow,
    )
    return vjp(g)


warp_one_pallas.defvjp(_warp_one_fwd, _warp_one_bwd)


def warp_pair_pallas(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    flow_t0: jnp.ndarray,
    flow_t1: jnp.ndarray,
    align_corners: bool = False,
    pairs=False,
    planar_out: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both warps of the cascade through the Pallas kernel.

    ``pairs``: False (f32 planes), True (bf16 channel pairs), or "u8"
    (byte-packed single plane — exact for u8-derived sources).
    ``planar_out``: return (B, C, H, W) planes (see warp_one_pallas)."""
    g0 = warp_one_pallas(i0, flow_t0, align_corners, pairs, planar_out)
    g1 = warp_one_pallas(i1, flow_t1, align_corners, pairs, planar_out)
    return g0, g1
