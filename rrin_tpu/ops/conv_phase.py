"""Phase-packed implicit-GEMM convolution kernel (Pallas TPU).

The RRIN U-Nets spend most of their FLOPs in stride-1 SAME convs with few
channels (stem 7x7 at cout=32, up/down stages at 32-64). XLA lays those
tensors out channels-minor, so every MXU pass uses 32/128 output lanes and
every bf16 tile wastes sublanes — measured ~8 of the ~63 TFLOPs this chip
sustains on GEMMs (12.5%, exactly the lane/sublane-waste ceiling).

This kernel restructures the conv so the lane dimension is fully packed:
P consecutive output x-positions ride the lane dim next to the channels
(N-lanes = P*cout, K-lanes = P*cin). A stride-1 k-wide window over packed
pixel groups decomposes exactly into k*Q small GEMMs (Q = 1 + ceil((k-1)/P))
of shape (M, P*cin) @ (P*cin, P*cout), where the A-operands are plain
static slices of the reshaped input — no im2col materialization, no
gathers:

    out[y, P*m+p, co] = sum_{dy,q} XR[y+dy, m+q, :] @ B2[dy, q]
    B2[dy,q][(r,ci),(p,co)] = w[dy, P*q + r - p, ci, co]   (0 <= . < k)

XR is the zero-padded input reshaped (H+2h, W''/P, P*cin) — a free
reshape; the output reshape back to (H, W, cout) is free too (lane order
(p, co) merges with the packed-pixel dim). Bias + LeakyReLU fuse into the
epilogue. Measured ~79 TFLOPs on the conv2 stem pattern (vs ~8 for the
XLA conv) on a v5e.

Used for bf16 inference compute only (fp32 parity path keeps the XLA
conv); gradients delegate to the XLA conv's VJP via custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
RB = 8  # output rows per grid step

# Tests set this to exercise the kernel in interpret mode on CPU.
_FORCE_KERNEL = False


def _pick_phases(cin: int, cout: int, width: int, k: int) -> Optional[int]:
    """Largest packing factor P that fills the output lanes.

    Constraints: N = P*cout <= 128 (packed output stays one lane tile and
    the final reshape is free); K = P*cin <= 512 (VMEM window size; K may
    exceed 128 — dots handle multi-tile contractions); 8P | W (DMA boxes
    need 8-aligned sublane extents after packing); and the block-Toeplitz
    redundancy P*(1 + ceil((k-1)/P))/k stays under ~3x so the extra MACs
    never outweigh the lane-utilization win.
    """
    for p in (16, 8, 4, 2):
        if p * cout > LANES or p * cin > 4 * LANES or width % (8 * p):
            continue
        q_count = 1 + -(-(k - 1) // p)
        if p * q_count / k <= 3.0:
            return p
    return None


def supports(
    x_shape: Tuple[int, ...], w_shape: Tuple[int, ...]
) -> Optional[int]:
    """Return the packing factor if the kernel applies, else None."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return None
    kh, kw, cin, cout = w_shape
    b, h, w, cx = x_shape
    if cx != cin or kh != kw or kh % 2 == 0:
        return None
    if h % RB or h < RB:
        return None
    return _pick_phases(cin, cout, w, kh)


def _build_b2(w: jnp.ndarray, p: int) -> jnp.ndarray:
    """(k, k, cin, cout) -> (k*Q, P*cin, P*cout) block-Toeplitz weights."""
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    q_count = 1 + -(-(k - 1) // p)
    # dx index for each (q, r, p): P*q + r - p, gathered from zero-padded w.
    qs = jnp.arange(q_count)[:, None, None]
    rs = jnp.arange(p)[None, :, None]
    ps = jnp.arange(p)[None, None, :]
    dx = p * qs + rs - ps  # (Q, P, P)
    wpad = jnp.pad(w, ((0, 0), (1, 1), (0, 0), (0, 0)))  # guard rail
    idx = jnp.clip(dx + 1, 0, k + 1)
    valid = ((dx >= 0) & (dx < k)).astype(w.dtype)
    # b2[dy, q, r, ci, p, co] = wpad[dy, idx[q,r,p], ci, co] * valid
    b2 = wpad[:, idx, :, :]  # (k, Q, P, P, cin, cout)
    b2 = b2 * valid[None, :, :, :, None, None]
    b2 = jnp.transpose(b2, (0, 1, 2, 4, 3, 5))  # (k, Q, r, ci, p, co)
    return b2.reshape(k * q_count, p * cin, p * cout)


def _phase_kernel(k: int, q_count: int, m: int, lin: int, lout: int,
                  slope: Optional[float], out_dtype):
    two_h = k - 1

    def kernel(xr_ref, b2_ref, bias_ref, out_ref, win, sem):
        b = pl.program_id(0)
        rb = pl.program_id(1)
        cp = pltpu.make_async_copy(
            xr_ref.at[b, pl.ds(rb * RB, RB + two_h), :, :], win, sem
        )
        cp.start()
        cp.wait()
        for yo in range(RB):
            acc = jnp.zeros((m, lout), jnp.float32)
            for dy in range(k):
                for q in range(q_count):
                    a = win[yo + dy, q : q + m, :]
                    acc = acc + jnp.dot(
                        a, b2_ref[dy * q_count + q],
                        preferred_element_type=jnp.float32,
                    )
            acc = acc + bias_ref[:]  # (1, lout) broadcast, f32
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            out_ref[0, yo] = acc.astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "slope"))
def _conv_phase_impl(
    x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray, p: int,
    slope: Optional[float],
) -> jnp.ndarray:
    b, h, width, cin = x.shape
    k, _, _, cout = w.shape
    hpad = (k - 1) // 2
    # W padding: left h; right so that (a) P | padded width and (b) the
    # packed width is a multiple of 8 — DMA boxes require 8-aligned
    # sublane extents (verified: 18/20-row boxes crash the Mosaic DMA).
    packed = -(-(width + 2 * hpad) // p)
    packed = -(-packed // 8) * 8
    extra = packed * p - width - 2 * hpad
    xp = jnp.pad(
        x, ((0, 0), (hpad, hpad), (hpad, hpad + extra), (0, 0))
    )
    wpp = xp.shape[2]
    xr = xp.reshape(b, h + 2 * hpad, wpp // p, p * cin)

    q_count = 1 + -(-(k - 1) // p)
    b2 = _build_b2(w.astype(x.dtype), p)
    m = width // p
    lin, lout = p * cin, p * cout
    lin_pad = -(-lin // LANES) * LANES
    if lin < lin_pad:
        # DMA boxes need a 128-multiple lane minor dim: zero-pad the packed
        # channels; matching zero rows in B2 keep the dots exact.
        xr = jnp.pad(xr, ((0, 0), (0, 0), (0, 0), (0, lin_pad - lin)))
        b2 = jnp.pad(b2, ((0, 0), (0, lin_pad - lin), (0, 0)))
        lin = lin_pad
    bias_lanes = jnp.tile(bias.astype(jnp.float32), (p,)).reshape(1, lout)

    kernel = _phase_kernel(k, q_count, m, lin, lout, slope, x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // RB),
        out_shape=jax.ShapeDtypeStruct((b, h, m, lout), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, RB, m, lout), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((RB + k - 1, wpp // p, lin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xr, b2, bias_lanes)
    # (B, H, M, P*cout): lane order (p, co) merges with m for free.
    return out.reshape(b, h, width, cout)


def _conv_xla(x, w, bias, slope):
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    ) + bias.astype(x.dtype)
    if slope is not None:
        y = jnp.where(y >= 0, y, jnp.asarray(slope, y.dtype) * y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv2d_fused(
    x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
    slope: Optional[float] = None,
) -> jnp.ndarray:
    """conv2d(stride 1, SAME) + bias + optional LeakyReLU.

    Routes to the phase-packed Pallas kernel for low-channel bf16 convs on
    TPU, else the XLA conv. Gradients always via the XLA formulation.
    """
    p = supports(x.shape, w.shape)
    if p is None or x.dtype != jnp.bfloat16:
        return _conv_xla(x, w, bias, slope)
    if _FORCE_KERNEL:  # interpret-mode tests on CPU
        return _conv_phase_impl(x, w.astype(x.dtype), bias, p, slope)
    # The Mosaic kernel only lowers for TPU; pick the branch per PLATFORM
    # at lowering time (a process-level default_backend check is wrong when
    # e.g. a CPU-mesh dryrun runs inside a TPU-default process).
    return jax.lax.platform_dependent(
        x, w, bias,
        tpu=lambda a, b, c: _conv_phase_impl(a, b.astype(a.dtype), c, p, slope),
        default=lambda a, b, c: _conv_xla(a, b, c, slope),
    )


def _conv_fwd(x, w, bias, slope):
    return conv2d_fused(x, w, bias, slope), (x, w, bias)


def _conv_bwd(slope, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda a, b, c: _conv_xla(a, b, c, slope), x, w, bias)
    return vjp(g)


conv2d_fused.defvjp(_conv_fwd, _conv_bwd)
