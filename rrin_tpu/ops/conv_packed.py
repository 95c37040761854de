"""Pad-free phase-packed convolution kernel (Pallas TPU).

Second-generation version of ops/conv_phase.py. The round-1 kernel took
channels-minor NHWC input, so XLA inserted a pad+reshape (one full layout
copy) before EVERY kernel call and another after it — measured ~35% of
1080p frame time (docs/PERFORMANCE.md). This kernel instead consumes and
produces the *carried* packed layout of ops/packed.py directly:

    x_i: (B, H, M, Lin_i)  Lin_i = round_up(P*spec_i.c, 128)
    y:   (B, H, M, Lout)   Lout  = P*cout, lane = slot*cout + co

so conv chains need ZERO layout ops between layers. It generalizes the
round-1 design three ways:

  * MULTI-INPUT: a conv whose input is a channel-concat (the U-Net skip
    connections) takes the operands separately and splits the contraction
    (B2 row blocks per operand) — the concat is never materialized.
  * P=1: degenerates to a clean implicit-GEMM NHWC conv (K*k static-slice
    dots), used for the mid U-Net levels where C >= 128 fills the lanes
    natively but XLA's conv emitter still pads/copies.
  * Pad-free borders: W guards are zero by the packed-layout invariant
    (window halo columns memset once); H handled by a clamped 8-aligned
    window DMA plus a zero sentinel row that out-of-range row reads are
    redirected to. The epilogue re-zeroes OUTPUT guard slots so
    bias+LeakyReLU can't poison the next conv's zero padding.

Decomposition (same block-Toeplitz math as round 1, SURVEY.md §2.2):
out storage pixel P*m+p at real x = P*m+p-off_out needs input reals
x+dx-h, dx in [0,k): input storage = P*(m+s) + (p+dx) with the static
group shift s = (off_in - h - off_out)/P, which the U-Net offset plan
(models/unet.py) keeps integer per operand. Hence k*Q GEMMs per operand
of static window slices against
B2[dy,q][(r,ci),(p,co)] = w[dy, P*q+r-p, ci, co], Q = 1+ceil((k-1)/P).

Inference-only (no VJP); training keeps the round-1 conv2d_fused whose
custom_vjp delegates to the XLA conv.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops.conv_phase import _build_b2, _conv_xla
from rrin_tpu.ops.packed import PackedSpec, pack, pad_lanes, unpack

LANES = 128
RB = 8  # output rows per grid step
WIN_ROWS = RB + 16  # 8-multiple: the clamped 8-aligned DMA start stays
# in bounds (h % 8 == 0 makes the clamp bound h-WIN_ROWS 8-aligned) while
# still covering [r0-hh, r0+RB+hh) for every hh <= 8.

# Tests set this to exercise the kernel in interpret mode on CPU.
_FORCE_KERNEL = False

# Mosaic's default per-kernel scoped-VMEM budget (~16 MB) rejects the
# window scratch at 4K-class group counts (the windows scale with m0),
# even though v5e has 128 MB of physical VMEM. Round 3 first requested a
# blanket 100 MB from every packed kernel — and MEASURED a ~10% int8
# regression at 1080p (16.6 vs 18.4 fps): vmem_limit_bytes is NOT a pure
# budget check; raising it changes Mosaic's scheduling for kernels that
# never needed the headroom. The budget is therefore sized PER CALL:
# kernels whose scratch+blocks fit the default get compiler_params=None
# (bit-identical to pre-round-3 compilation), and only the 4K-class
# calls request a raised budget (2x their estimated VMEM footprint,
# capped at 100 MB). RRIN_KERNEL_VMEM_LIMIT forces a fixed budget for
# every call (A/B hook).
_VMEM_LIMIT_OVERRIDE = os.environ.get("RRIN_KERNEL_VMEM_LIMIT")
_MOSAIC_DEFAULT_VMEM = 16 * 2**20
_VMEM_LIMIT_CAP = 100 * 2**20


def _vmem_ref_bytes(refs) -> int:
    """Total bytes of the VMEM MemoryRefs in ``refs`` (semaphores skip)."""
    total = 0
    for r in refs:
        shape = getattr(r, "shape", None)
        dtype = getattr(r, "dtype", None)
        if shape is None or dtype is None:
            continue
        try:
            itemsize = np.dtype(dtype).itemsize
        except TypeError:  # semaphore pseudo-dtypes
            continue
        n = 1
        for d in shape:
            n *= int(d)
        total += n * itemsize
    return total


def _arr_bytes(arrs) -> int:
    """Total bytes of the given (possibly traced) arrays."""
    return sum(
        int(np.prod(a.shape)) * np.dtype(a.dtype).itemsize for a in arrs
    )


def _compiler_params(est_bytes: int) -> Optional[pltpu.CompilerParams]:
    """Raised-VMEM request sized to this call, or None for the default.

    ``est_bytes`` is the call's scratch + VMEM-block footprint; 2x covers
    Mosaic's own double-buffering/spill slack. Returning None keeps the
    default budget, which measured ~10% faster than an inflated request
    on kernels that fit it.
    """
    if _VMEM_LIMIT_OVERRIDE is not None:
        return pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_LIMIT_OVERRIDE)
        )
    need = 2 * est_bytes
    if need <= _MOSAIC_DEFAULT_VMEM:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(need, _VMEM_LIMIT_CAP)
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def q_count(k: int, p: int) -> int:
    return 1 + -(-(k - 1) // p)


def min_h(k: int) -> int:
    """Smallest H the kernel supports (window must fit the array)."""
    return WIN_ROWS


def supports(spec: PackedSpec, k: int, cout: int, h: int) -> bool:
    """Static routability check for one conv site (single operand)."""
    return (
        k % 2 == 1
        and h % RB == 0
        and h >= min_h(k)
        and spec.m % 8 == 0
        and spec.p * cout <= 4 * LANES
        and spec.p * spec.c <= 4 * LANES
    )


def _fuse_dy(k: int, lout: int) -> bool:
    """Thin-output (head) fast path: when all k dy-taps' B2 blocks fit one
    128-lane MXU tile side by side, ONE dot per (row, qi) against the
    dy-concatenated B2 computes every tap's partial product — k x fewer
    MXU passes than k separate N=lout dots (N<=128 always costs one
    N-tile), combined by shifted static lane slices."""
    return k > 1 and k * lout <= LANES


def _kernel_body(
    *, k: int, q: int, m: int, h: int, wls, s_shifts, lins, lout: int,
    cout: int, p: int, off_out: int, w_real: int, slope: Optional[float],
    out_dtype, quant: bool = False, quant_out: bool = False,
    rows: Optional[int] = None, m_double_out: bool = False,
):
    """``m`` is the operands' storage-group count (the window DMA width);
    ``rows`` (default m) is the OUTPUT group count in the contraction
    geometry — rows < m trims tail guard groups so a site can rejoin a
    narrower downstream plan. ``m_double_out`` stores each (rows, lout)
    result row as (2*rows, lout//2): the P-halving reinterpretation (out
    lane slot*cout+co with slot in [0,P) splits into two P/2-slot groups),
    a pure sublane interleave — the dense-entry stem (models/unet.py) uses
    it to emit the standard P=4 layout from a P=8 contraction."""
    hh = (k - 1) // 2
    n_in = len(wls)
    rows = m if rows is None else rows
    sentinel = WIN_ROWS  # memset-zero row index in every window
    acc_dt = jnp.int32 if quant else jnp.float32
    fuse_dy = _fuse_dy(k, lout)

    def kernel(*refs):
        x_refs = refs[:n_in]
        b2_refs = refs[n_in : 2 * n_in]
        bias_ref = refs[2 * n_in]
        nfix = 2 * n_in + 1
        scale_ref = refs[nfix] if quant else None
        nfix += 1 if quant else 0
        out_ref = refs[nfix]
        wins = refs[nfix + 1 : nfix + 1 + n_in]
        pbuf = refs[nfix + 1 + n_in] if fuse_dy else None
        sem = refs[-1]

        bi = pl.program_id(0)
        ri = pl.program_id(1)
        r0 = ri * RB
        ws = jnp.clip(((r0 - hh) >> 3) << 3, 0, h - WIN_ROWS)
        ws = pl.multiple_of(ws, 8)

        copies = [
            pltpu.make_async_copy(
                x_refs[i].at[bi, pl.ds(ws, WIN_ROWS), :, :],
                wins[i].at[pl.ds(0, WIN_ROWS), pl.ds(wls[i], m), :],
                sem.at[i],
            )
            for i in range(n_in)
        ]
        for cpy in copies:
            cpy.start()

        # One-time zeroing of halo columns and sentinel rows (the grid
        # runs sequentially; scratch persists across steps).
        @pl.when(jnp.logical_and(bi == 0, ri == 0))
        def _():
            for i in range(n_in):
                wins[i][sentinel] = jnp.zeros_like(wins[i][sentinel])
                if wls[i]:
                    wins[i][:, : wls[i], :] = jnp.zeros_like(
                        wins[i][:, : wls[i], :]
                    )
                mw = wins[i].shape[1]
                if mw > wls[i] + m:
                    wins[i][:, wls[i] + m :, :] = jnp.zeros_like(
                        wins[i][:, wls[i] + m :, :]
                    )

        # Output guard mask: storage pixels outside [off_out, off_out+W)
        # must stay zero for the next conv's SAME padding. (Built in the
        # contraction geometry — under m_double_out the P/2 view addresses
        # the same storage pixels, so the mask is correct either way.)
        mi = jax.lax.broadcasted_iota(jnp.int32, (rows, lout), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (rows, lout), 1)
        pix = p * mi + li // cout
        gmask = jnp.logical_and(pix >= off_out, pix < off_out + w_real)

        for cpy in copies:
            cpy.wait()

        if fuse_dy:
            # One dot per (extended row, operand, qi) against the
            # dy-concatenated B2 (b2_refs[i]: (q, lin, k*lout)); out row
            # yo then sums k shifted lane slices of the products.
            for j in range(RB + k - 1):
                a_abs = r0 + j - hh
                valid = jnp.logical_and(a_abs >= 0, a_abs < h)
                a_idx = jnp.where(valid, a_abs - ws, sentinel)
                pj = jnp.zeros((rows, k * lout), acc_dt)
                for i in range(n_in):
                    for qi in range(q):
                        cs = wls[i] + s_shifts[i] + qi
                        pj = pj + jnp.dot(
                            wins[i][a_idx, pl.ds(cs, rows), :],
                            b2_refs[i][qi],
                            preferred_element_type=acc_dt,
                        )
                pbuf[j] = pj

        for yo in range(RB):
            acc = jnp.zeros((rows, lout), acc_dt)
            if fuse_dy:
                for dy in range(k):
                    acc = acc + pbuf[yo + dy][
                        :, dy * lout : (dy + 1) * lout
                    ]
            else:
                for dy in range(k):
                    a_abs = r0 + yo + dy - hh
                    valid = jnp.logical_and(a_abs >= 0, a_abs < h)
                    a_idx = jnp.where(valid, a_abs - ws, sentinel)
                    for i in range(n_in):
                        for qi in range(q):
                            cs = wls[i] + s_shifts[i] + qi
                            acc = acc + jnp.dot(
                                wins[i][a_idx, pl.ds(cs, rows), :],
                                b2_refs[i][dy * q + qi],
                                preferred_element_type=acc_dt,
                            )
            if quant:
                acc = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
            else:
                acc = acc + bias_ref[:]
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            acc = jnp.where(gmask, acc, 0.0)
            if quant_out:
                # scale/bias were pre-folded by 127/ax_out (commutes with
                # LeakyReLU), so the epilogue only rounds to the int8 grid.
                acc = jnp.clip(jnp.round(acc), -127.0, 127.0)
            acc = acc.astype(out_dtype)
            if m_double_out:
                half = lout // 2
                acc = jnp.stack(
                    [acc[:, :half], acc[:, half:]], axis=1
                ).reshape(2 * rows, half)
            out_ref[0, yo] = acc

    return kernel


def _quantize_act(x: jnp.ndarray, ax: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor int8 quantization (zero-point 0 keeps the
    packed guard-zero invariant intact)."""
    inv = 127.0 / jnp.maximum(ax.astype(jnp.float32), 1e-12)
    q = jnp.round(x.astype(jnp.float32) * inv)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _quantize_weights(wis, absmax):
    """Joint per-output-channel int8 weight quantization for a multi-
    operand conv: operand i's rows are pre-scaled by ax_i/ax_0 so ONE
    per-lane output scale (ax_0 * sw / 127^2) dequantizes the shared
    int32 accumulator. Returns (int8 weight blocks, sw)."""
    a0 = jnp.maximum(absmax[0].astype(jnp.float32), 1e-12)
    w_effs = [
        wi.astype(jnp.float32)
        * (jnp.maximum(ax.astype(jnp.float32), 1e-12) / a0)
        for wi, ax in zip(wis, absmax)
    ]
    sw = functools.reduce(
        jnp.maximum,
        [jnp.max(jnp.abs(we), axis=(0, 1, 2)) for we in w_effs],
    )
    sw = jnp.maximum(sw, 1e-12)
    wqs = [
        jnp.clip(jnp.round(we * (127.0 / sw)), -127.0, 127.0).astype(jnp.int8)
        for we in w_effs
    ]
    return wqs, sw


def _conv_statics(specs, k, off_out):
    """(wls, s_shifts, lins) — the static per-operand window geometry."""
    p = specs[0].p
    hh = (k - 1) // 2
    wls, s_shifts, lins = [], [], []
    for spec in specs:
        assert spec.p == p and spec.m == specs[0].m
        assert (spec.off - hh - off_out) % p == 0, (spec, k, off_out)
        s = (spec.off - hh - off_out) // p
        wls.append(_round_up(max(0, -s), 8))  # 8-aligned DMA dst offset
        s_shifts.append(s)
        lins.append(_round_up(p * spec.c, LANES))
    return wls, s_shifts, lins


def prep_conv(
    w: jnp.ndarray,
    bias: jnp.ndarray,
    specs: Tuple[PackedSpec, ...],
    real_cs: Tuple[int, ...],
    k: int,
    cout: int,
    absmax=None,
    out_absmax=None,
    dtype=jnp.bfloat16,
) -> dict:
    """Weight-side constants of one conv site — B2 blocks, lane-tiled
    bias, and (int8) the folded output scale. Shape-independent: compute
    ONCE per model (see models/rrin.prepare_packed_params) instead of
    inside every jitted frame."""
    p = specs[0].p
    q = q_count(k, p)
    lout = p * cout
    quant = absmax is not None
    wis, row = [], 0
    for spec, rc in zip(specs, real_cs):
        wi = w[:, :, row : row + rc, :]
        row += rc
        if rc < spec.c:
            wi = jnp.pad(wi, ((0, 0), (0, 0), (0, spec.c - rc), (0, 0)))
        wis.append(wi)
    assert row == w.shape[2], (row, w.shape)

    if quant:
        wqs, sw = _quantize_weights(wis, absmax)
        a0 = jnp.maximum(absmax[0].astype(jnp.float32), 1e-12)
        scale_ch = a0 * sw / (127.0 * 127.0)
        bias_ch = bias.astype(jnp.float32)
        if out_absmax is not None:
            # Fold the output quantization step into scale+bias (it
            # commutes with LeakyReLU); the kernel epilogue then just
            # rounds and the output lands on the int8 grid directly.
            inv_out = 127.0 / jnp.maximum(
                out_absmax.astype(jnp.float32), 1e-12
            )
            scale_ch = scale_ch * inv_out
            bias_ch = bias_ch * inv_out
        scale_lanes = jnp.tile(scale_ch, (p,)).reshape(1, lout)
        bias_lanes = jnp.tile(bias_ch, (p,)).reshape(1, lout)
    else:
        wqs = [wi.astype(dtype) for wi in wis]
        scale_lanes = None
        bias_lanes = jnp.tile(bias.astype(jnp.float32), (p,)).reshape(1, lout)

    fuse_dy = _fuse_dy(k, lout)
    b2s = []
    for wq, spec in zip(wqs, specs):
        lin = _round_up(p * spec.c, LANES)
        b2 = _build_b2(wq, p)  # (k*q, p*spec.c, p*cout)
        if p * spec.c < lin:
            b2 = jnp.pad(b2, ((0, 0), (0, lin - p * spec.c), (0, 0)))
        if fuse_dy:
            # (q, lin, k*lout): dy blocks side by side per qi (see
            # _fuse_dy) — one MXU pass computes all k taps' products.
            b2 = jnp.stack(
                [
                    jnp.concatenate(
                        [b2[dy * q + qi] for dy in range(k)], axis=-1
                    )
                    for qi in range(q)
                ]
            )
        b2s.append(b2)
    prep = {"b2s": tuple(b2s), "bias": bias_lanes}
    if scale_lanes is not None:
        prep["scale"] = scale_lanes
    return prep


@functools.partial(
    jax.jit,
    static_argnames=(
        "specs", "real_cs", "k", "cout", "off_out", "slope", "out_dtype",
        "m_out", "m_double",
    ),
)
def _conv_packed_impl(
    xs: Tuple[jnp.ndarray, ...],
    prep: dict,
    specs: Tuple[PackedSpec, ...],
    real_cs: Tuple[int, ...],
    k: int,
    cout: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[Tuple[jnp.ndarray, ...]] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    m_out: Optional[int] = None,
    m_double: bool = False,
) -> jnp.ndarray:
    b, h, m, _ = xs[0].shape
    p = specs[0].p
    q = q_count(k, p)
    quant = absmax is not None
    assert out_absmax is None or quant
    assert quant or all(x.dtype != jnp.int8 for x in xs)
    in_f = [x for x in xs if x.dtype != jnp.int8]
    dtype = out_dtype or (in_f[0].dtype if in_f else jnp.bfloat16)
    if out_absmax is not None:
        dtype = jnp.int8
    for x, spec in zip(xs, specs):
        assert x.shape == (b, h, m, _round_up(p * spec.c, LANES)), (
            x.shape, spec)
    wls, s_shifts, lins = _conv_statics(specs, k, off_out)
    lout = p * cout
    b2s = list(prep["b2s"])
    bias_lanes = prep["bias"]
    scale_lanes = prep.get("scale")

    if quant:
        # Operands already on the int8 grid (carried from a quant-out
        # producer) skip the quantize pass.
        xs = tuple(
            x if x.dtype == jnp.int8 else _quantize_act(x, ax)
            for x, ax in zip(xs, absmax)
        )
        win_dt = jnp.int8
    else:
        # The window scratch is the DMA destination of the INPUT arrays;
        # out_dtype only affects the epilogue cast.
        win_dt = in_f[0].dtype if in_f else jnp.bfloat16

    rows = m if m_out is None else m_out
    assert rows <= m and rows % 8 == 0, (rows, m)
    assert not m_double or lout % (2 * LANES) == 0, lout
    fuse_dy = _fuse_dy(k, lout)
    kernel = _kernel_body(
        k=k, q=q, m=m, h=h, wls=tuple(wls), s_shifts=tuple(s_shifts),
        lins=tuple(lins), lout=lout, cout=cout, p=p, off_out=off_out,
        w_real=specs[0].w, slope=slope, out_dtype=dtype, quant=quant,
        quant_out=out_absmax is not None, rows=rows, m_double_out=m_double,
    )
    n_in = len(xs)
    scratch = [
        pltpu.VMEM(
            (WIN_ROWS + 1,
             wls[i] + max(m, rows + max(0, s_shifts[i] + q - 1)),
             lins[i]),
            win_dt,
        )
        for i in range(n_in)
    ]
    if fuse_dy:
        scratch.append(
            pltpu.VMEM(
                (RB + k - 1, rows, k * lout),
                jnp.int32 if quant else jnp.float32,
            )
        )
    operands = list(xs) + b2s + [bias_lanes]
    n_vmem = n_in + 1
    if quant:
        operands.append(scale_lanes)
        n_vmem += 1
    out_m, out_l = (2 * rows, lout // 2) if m_double else (rows, lout)
    return pl.pallas_call(
        kernel,
        grid=(b, h // RB),
        out_shape=jax.ShapeDtypeStruct((b, h, out_m, out_l), dtype),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * n_in
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        ),
        out_specs=pl.BlockSpec(
            (1, RB, out_m, out_l), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((n_in,))],
        compiler_params=_compiler_params(
            _vmem_ref_bytes(scratch)
            + _arr_bytes(operands[n_in:])
            + RB * out_m * out_l * np.dtype(dtype).itemsize
        ),
    )(*operands)


# ---------------------------------------------------------------------------
# Fused 2x-bilinear-upsample + conv kernel.
#
# Round-2 profiling: upsample_2x_packed's H-interleave (stack+reshape) and
# W lane shuffles were ~26 ms of the 148 ms 1080p frame — XLA materializes
# the doubled tensor with full-size copies at every up stage. This kernel
# never materializes it: it DMAs a WINDOW OF THE HALF-RES tensor (half the
# bytes) and constructs the upsampled rows it needs in VMEM:
#
#   * H: upsampled row u = w0*src[j] + w1*src[j+1] with j = (u-1)>>1 and
#     (w0, w1) = (0.25, 0.75) for even u, (0.75, 0.25) for odd — and since
#     the row-block base r0 is even, the parity (and so the weights and
#     the static row offsets) are compile-time constants per unrolled row.
#     H-edge clamp = clamping j into [0, Hh); conv H zero-guard = zeroing
#     rows with u outside [0, 2*Hh).
#   * W: P doubles in place (out group g covers src group g, M constant),
#     so out slots (2j, 2j+1) are 0.25/0.75 combos of src slots j-1,j,j+1
#     — pure lane-block arithmetic with one sublane roll for the group
#     boundary. The W-edge clamp corrections collapse to ONE static
#     multiplicative mask: at the first/last real pixel the out-of-range
#     tap hit a guard ZERO instead of the clamped edge value, so the
#     computed value is exactly 3/4 of the true one (x 4/3 fixes it), and
#     the two guard slots adjacent to real data catch a 0.25*real leak
#     (x 0 re-zeroes them). Everything further out is upsampled zeros.
#
# The contraction is then the standard block-Toeplitz loop (same B2) over
# the constructed rows — with STATIC row indices (no sentinel redirect),
# since uwin[i] holds exactly upsampled row r0-hh+i.
# ---------------------------------------------------------------------------

WIN_SRC = 16  # half-res window rows (covers RB/2 + hh + 2 for k <= 5)


def supports_up(spec: PackedSpec, k: int, cout: int, h_out: int) -> bool:
    """Static routability of a fused upsample+conv site (single operand).
    ``spec`` describes the HALF-res input; output is (2*spec.p)-packed."""
    p_out = 2 * spec.p
    return (
        k % 2 == 1
        and k <= 5
        and h_out % RB == 0
        and h_out == 2 * (h_out // 2)
        and h_out // 2 >= WIN_SRC
        and spec.m % 8 == 0
        and p_out * cout <= 4 * LANES
        and p_out * spec.c <= 4 * LANES
        # The W-expansion's lane-slot arithmetic assumes no lane padding.
        and (spec.p * spec.c) % LANES == 0
    )


def _kernel_body_up(
    *, k: int, q: int, m: int, h_src: int, wl: int, s_shift: int,
    lin_half: int, lin_up: int, lout: int, cout: int, p_in: int,
    off_in: int, w_half: int, off_out: int, slope: Optional[float],
    out_dtype, quant: bool = False, quant_out: bool = False,
):
    hh = (k - 1) // 2
    h_out = 2 * h_src
    p_out = 2 * p_in
    c = lin_half // p_in  # padded channels (lane layout), p_in*c == lin_half
    n_rows = RB + 2 * hh
    acc_dt = jnp.int32 if quant else jnp.float32

    def kernel(*refs):
        if quant:
            (x_ref, b2_ref, bias_ref, scale_ref, inva_ref, out_ref,
             swin, uwin, cmask, sem) = refs
        else:
            x_ref, b2_ref, bias_ref, out_ref, swin, uwin, cmask, sem = refs
            scale_ref = inva_ref = None
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        r0 = ri * RB
        base = r0 // 2  # first src row of interest (before offsets)
        ws = jnp.clip(((base - hh) >> 3) << 3, 0, h_src - WIN_SRC)
        ws = pl.multiple_of(ws, 8)

        cpy = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ws, WIN_SRC), :, :],
            swin.at[pl.ds(0, WIN_SRC), pl.ds(wl, m), :],
            sem,
        )
        cpy.start()

        mw = swin.shape[1]

        @pl.when(jnp.logical_and(bi == 0, ri == 0))
        def _():
            if wl:
                swin[:, :wl, :] = jnp.zeros_like(swin[:, :wl, :])
            if mw > wl + m:
                swin[:, wl + m:, :] = jnp.zeros_like(swin[:, wl + m:, :])
            # The W-correction mask (see module comment): 4/3 at the
            # first/last real out pixel, 0 at the two adjacent guard
            # slots, 1 elsewhere. Static in (group, lane) coords.
            gi = jax.lax.broadcasted_iota(jnp.int32, (mw, lin_up), 0)
            li = jax.lax.broadcasted_iota(jnp.int32, (mw, lin_up), 1)
            pix = p_out * (gi - wl) + li // c
            p_first = 2 * off_in
            p_last = 2 * off_in + 2 * w_half - 1
            mask = jnp.ones((mw, lin_up), jnp.float32)
            mask = jnp.where(
                (pix == p_first) | (pix == p_last), 4.0 / 3.0, mask
            )
            mask = jnp.where(
                (pix == p_first - 1) | (pix == p_last + 1), 0.0, mask
            )
            if quant:
                # Fold the quantization step into the correction mask so
                # the constructed rows come out in int8 grid units.
                mask = mask * inva_ref[0, 0]
            cmask[...] = mask.astype(cmask.dtype)

        # Output guard mask (same as the plain kernel).
        mi = jax.lax.broadcasted_iota(jnp.int32, (m, lout), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (m, lout), 1)
        pixo = p_out * mi + li // cout
        gmask = jnp.logical_and(pixo >= off_out, pixo < off_out + 2 * w_half)

        cpy.wait()

        # Construct the n_rows upsampled rows this block needs.
        for i in range(n_rows):
            du = i - hh  # upsampled row u = r0 + du (parity of du static)
            o0 = (du - 1) >> 1  # floor((du-1)/2): static
            w0, w1 = (0.75, 0.25) if (du & 1) else (0.25, 0.75)
            j0 = jnp.clip(base + o0, 0, h_src - 1)
            j1 = jnp.clip(base + o0 + 1, 0, h_src - 1)
            row0 = swin[j0 - ws]
            row1 = swin[j1 - ws]
            hrow = (w0 * row0.astype(jnp.float32)
                    + w1 * row1.astype(jnp.float32))
            # W expansion: out slots (2j, 2j+1) from src slots j-1, j, j+1.
            prv = jnp.concatenate(
                [jnp.zeros_like(hrow[:1]), hrow[:-1]], axis=0
            )
            nxt = jnp.concatenate(
                [hrow[1:], jnp.zeros_like(hrow[:1])], axis=0
            )

            def slot(j):
                if j < 0:
                    return prv[:, (j + p_in) * c:(j + p_in + 1) * c]
                if j >= p_in:
                    return nxt[:, (j - p_in) * c:(j - p_in + 1) * c]
                return hrow[:, j * c:(j + 1) * c]

            blocks = []
            for j in range(p_in):
                blocks.append(0.25 * slot(j - 1) + 0.75 * slot(j))
                blocks.append(0.75 * slot(j) + 0.25 * slot(j + 1))
            urow = jnp.concatenate(blocks, axis=-1) * cmask[...]
            u = r0 + du
            valid = jnp.logical_and(u >= 0, u < h_out)
            urow = jnp.where(valid, urow, 0.0)
            if quant:
                urow = jnp.clip(jnp.round(urow), -127.0, 127.0)
            uwin[i] = urow.astype(uwin.dtype)

        for yo in range(RB):
            acc = jnp.zeros((m, lout), acc_dt)
            for dy in range(k):
                for qi in range(q):
                    cs = wl + s_shift + qi
                    acc = acc + jnp.dot(
                        uwin[yo + dy, pl.ds(cs, m), :],
                        b2_ref[dy * q + qi],
                        preferred_element_type=acc_dt,
                    )
            if quant:
                acc = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
            else:
                acc = acc + bias_ref[:]
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            acc = jnp.where(gmask, acc, 0.0)
            if quant_out:
                acc = jnp.clip(jnp.round(acc), -127.0, 127.0)
            out_ref[0, yo] = acc.astype(out_dtype)

    return kernel


def prep_conv_up(
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    absmax=None,
    out_absmax=None,
    dtype=jnp.bfloat16,
    int8_input: bool = False,
) -> dict:
    """Weight-side constants of one fused-upsample conv site (see
    :func:`prep_conv`). ``int8_input``: the runtime input arrives already
    on the int8 grid, so the in-register quantize fold is 1."""
    p_out = 2 * spec.p
    lout = p_out * cout
    quant = absmax is not None
    wi = w
    if real_c < spec.c:
        wi = jnp.pad(wi, ((0, 0), (0, 0), (0, spec.c - real_c), (0, 0)))
    bias_ch = bias.astype(jnp.float32)
    prep = {}
    if quant:
        # The upsample is a convex combination, so |up(x)| <= |x| and the
        # input's absmax calibrates the constructed rows too. Rows are
        # quantized in-register (the 127/ax step rides the correction
        # mask — already-int8 input is already on that grid, so the fold
        # factor is 1); B2 is per-output-channel int8.
        (wq,), sw = _quantize_weights([wi], (absmax,))
        b2 = _build_b2(wq, p_out)
        ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
        scale_ch = ax * sw / (127.0 * 127.0)
        if out_absmax is not None:
            inv_out = 127.0 / jnp.maximum(
                out_absmax.astype(jnp.float32), 1e-12
            )
            scale_ch = scale_ch * inv_out
            bias_ch = bias_ch * inv_out
        prep["scale"] = jnp.tile(scale_ch, (p_out,)).reshape(1, lout)
        if int8_input:
            prep["inva"] = jnp.ones((1, 1), jnp.float32)
        else:
            prep["inva"] = (127.0 / ax).reshape(1, 1)
    else:
        b2 = _build_b2(wi.astype(dtype), p_out)
    lin_up = 2 * _round_up(spec.p * spec.c, LANES)
    if p_out * spec.c < lin_up:
        b2 = jnp.pad(b2, ((0, 0), (0, lin_up - p_out * spec.c), (0, 0)))
    prep["b2"] = b2
    prep["bias"] = jnp.tile(bias_ch, (p_out,)).reshape(1, lout)
    return prep


@functools.partial(
    jax.jit, static_argnames=("spec", "real_c", "k", "cout", "off_out",
                              "slope", "out_dtype"),
)
def _conv_up_packed_impl(
    x: jnp.ndarray,
    prep: dict,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    b, h_src, m, lin_half = x.shape
    p_in = spec.p
    p_out = 2 * p_in
    hh = (k - 1) // 2
    q = q_count(k, p_out)
    quant = absmax is not None
    assert out_absmax is None or quant
    assert quant or x.dtype != jnp.int8
    dtype = out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
    if out_absmax is not None:
        dtype = jnp.int8
    h_out = 2 * h_src

    assert x.shape == (b, h_src, m, _round_up(p_in * spec.c, LANES)), (
        x.shape, spec)
    assert p_in * spec.c == lin_half, (spec, lin_half)  # lane-exact packing
    assert h_out % RB == 0 and h_src >= WIN_SRC, (h_out, h_src)
    up_off = 2 * spec.off
    assert (up_off - hh - off_out) % p_out == 0, (spec, k, off_out)
    s = (up_off - hh - off_out) // p_out

    lout = p_out * cout
    b2 = prep["b2"]
    bias_lanes = prep["bias"]
    scale_lanes = prep.get("scale")
    inva = prep.get("inva")
    win_dt = jnp.int8 if quant else dtype
    lin_up = 2 * lin_half
    wl = _round_up(max(0, -s), 8)

    mw = wl + m + max(0, s + q - 1)
    kernel = _kernel_body_up(
        k=k, q=q, m=m, h_src=h_src, wl=wl, s_shift=s, lin_half=lin_half,
        lin_up=lin_up, lout=lout, cout=cout, p_in=p_in, off_in=spec.off,
        w_half=spec.w, off_out=off_out, slope=slope, out_dtype=dtype,
        quant=quant, quant_out=out_absmax is not None,
    )
    operands = [x, b2, bias_lanes]
    n_vmem = 2
    if quant:
        operands += [scale_lanes, inva]
        n_vmem = 4
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // RB),
        out_shape=jax.ShapeDtypeStruct((b, h_out, m, lout), dtype),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        ),
        out_specs=pl.BlockSpec(
            (1, RB, m, lout), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(scratch := [
            pltpu.VMEM((WIN_SRC, mw, lin_half), x.dtype),
            pltpu.VMEM((RB + 2 * hh, mw, lin_up), win_dt),
            pltpu.VMEM((mw, lin_up), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]),
        compiler_params=_compiler_params(
            _vmem_ref_bytes(scratch)
            + _arr_bytes(operands[1:])
            + RB * m * lout * np.dtype(dtype).itemsize
        ),
    )(*operands)


# ---------------------------------------------------------------------------
# Fused 2x-avg-pool + conv kernel (the encoder mirror of the up kernel).
#
# Carried-int8 profiling: the packed pool between a quant-out stem conv and
# the next down conv forces the int8 tensor through an XLA
# int8 -> f32 -> pool -> round chain whose reshape boundaries block fusion,
# materializing full-resolution f32 intermediates. This kernel reads the
# FULL-RES tensor's window directly (int8: half the DMA bytes of the
# pooled-bf16 alternative) and constructs the pooled rows in VMEM:
#
#   * H: pooled row j = 0.5*(src[2j] + src[2j+1]) — two window reads with
#     a dynamic base (2*r0 - ws) plus static offsets per unrolled row.
#   * W: out slot i (P/2 slots, M constant — avg_pool_2x_packed's layout)
#     is 0.25*(sum of src slots 2i+d, 2i+1+d), d = off%2; the d=1 group
#     boundary reads the next group via one sublane shift. No edge
#     corrections: w and the pairing are even-aligned, and guard zeros
#     pool to zero.
#   * int8: constructed rows are convex combos of the producer's grid, so
#     one round puts them back on it (float input folds 127/ax into the
#     0.25 factor); the contraction is int8 x int8 -> int32.
#
# Contraction: standard B2 loop at p_out = P/2 over the constructed rows
# (static row indices — uwin[i] holds exactly pooled row r0 - hh + i).
# ---------------------------------------------------------------------------

WIN_PSRC = 32  # full-res window rows: covers 2*(RB + 2*hh) for k <= 5
# plus the <= 7-row slack of the 8-aligned clamped DMA start.


def supports_pool(spec: PackedSpec, k: int, cout: int, h_src: int) -> bool:
    """Static routability of a fused pool+conv site. ``spec`` describes the
    FULL-res input; the conv runs on its 2x average pool (P halves, M
    constant) and h_out = h_src/2."""
    if spec.p < 2 or spec.p % 2 or h_src % 2 or spec.w % 2:
        return False
    p_out = spec.p // 2
    h_out = h_src // 2
    return (
        k % 2 == 1
        and k <= 5
        and h_out % RB == 0
        and h_src >= WIN_PSRC
        and spec.m % 8 == 0
        and p_out * cout <= 4 * LANES
        and spec.p * spec.c <= 4 * LANES
        # The W-pairing lane arithmetic assumes no lane padding.
        and (spec.p * spec.c) % LANES == 0
    )


def _kernel_body_pool(
    *, k: int, q: int, m: int, h_src: int, wl: int, s_shift: int,
    lin_src: int, lout: int, cout: int, p_in: int, d: int, off_out: int,
    w_out: int, slope: Optional[float], out_dtype, quant: bool = False,
    quant_out: bool = False,
):
    hh = (k - 1) // 2
    h_out = h_src // 2
    p_out = p_in // 2
    c = lin_src // p_in
    lin_pool = p_out * c
    n_rows = RB + 2 * hh

    def kernel(*refs):
        if quant:
            (x_ref, b2_ref, bias_ref, scale_ref, fs_ref, out_ref,
             swin, uwin, sem) = refs
        else:
            (x_ref, b2_ref, bias_ref, fs_ref, out_ref,
             swin, uwin, sem) = refs
            scale_ref = None
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        r0 = ri * RB
        base = 2 * (r0 - hh)  # first src row of interest
        ws = jnp.clip((base >> 3) << 3, 0, h_src - WIN_PSRC)
        ws = pl.multiple_of(ws, 8)

        cpy = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ws, WIN_PSRC), :, :],
            swin.at[pl.ds(0, WIN_PSRC), pl.ds(wl, m), :],
            sem,
        )
        cpy.start()

        mw = swin.shape[1]

        @pl.when(jnp.logical_and(bi == 0, ri == 0))
        def _():
            if wl:
                swin[:, :wl, :] = jnp.zeros_like(swin[:, :wl, :])
            if mw > wl + m:
                swin[:, wl + m:, :] = jnp.zeros_like(swin[:, wl + m:, :])

        # Output guard mask (pooled guards are exact zeros, but bias +
        # LReLU would poison them).
        mi = jax.lax.broadcasted_iota(jnp.int32, (m, lout), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (m, lout), 1)
        pixo = p_out * mi + li // cout
        gmask = jnp.logical_and(pixo >= off_out, pixo < off_out + w_out)

        cpy.wait()

        # Construct the pooled rows this block needs. fs folds 0.25 with
        # the int8 grid step (127/ax for float input, 1 for int8 input).
        base_w = 2 * r0 - ws  # window-relative src row of pooled row r0
        for i in range(n_rows):
            j_off = 2 * (i - hh)  # static src offset of pooled row r0+i-hh
            ia = jnp.clip(base_w + j_off, 0, WIN_PSRC - 1)
            ib = jnp.clip(base_w + j_off + 1, 0, WIN_PSRC - 1)
            hsum = (swin[ia].astype(jnp.float32)
                    + swin[ib].astype(jnp.float32))
            if d:
                nxt = jnp.concatenate(
                    [hsum[1:], jnp.zeros_like(hsum[:1])], axis=0
                )

            def slot(j, hsum=hsum):
                if j < p_in:
                    return hsum[:, j * c:(j + 1) * c]
                return nxt[:, (j - p_in) * c:(j - p_in + 1) * c]

            blocks = [
                slot(2 * t + d) + slot(2 * t + 1 + d)
                for t in range(p_out)
            ]
            urow = jnp.concatenate(blocks, axis=-1) * fs_ref[0, 0]
            jr = r0 + i - hh
            valid = jnp.logical_and(jr >= 0, jr < h_out)
            urow = jnp.where(valid, urow, 0.0)
            if quant:
                urow = jnp.clip(jnp.round(urow), -127.0, 127.0)
            uwin[i] = urow.astype(uwin.dtype)

        for yo in range(RB):
            acc = jnp.zeros((m, lout), jnp.int32 if quant else jnp.float32)
            for dy in range(k):
                for qi in range(q):
                    cs = wl + s_shift + qi
                    acc = acc + jnp.dot(
                        uwin[yo + dy, pl.ds(cs, m), :],
                        b2_ref[dy * q + qi],
                        preferred_element_type=(
                            jnp.int32 if quant else jnp.float32
                        ),
                    )
            if quant:
                acc = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
            else:
                acc = acc + bias_ref[:]
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            acc = jnp.where(gmask, acc, 0.0)
            if quant_out:
                acc = jnp.clip(jnp.round(acc), -127.0, 127.0)
            out_ref[0, yo] = acc.astype(out_dtype)

    return kernel


def prep_conv_pool(
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    absmax=None,
    out_absmax=None,
    dtype=jnp.bfloat16,
    int8_input: bool = False,
) -> dict:
    """Weight-side constants of one fused-pool conv site (see
    :func:`prep_conv`). ``fs`` folds 0.25 with the int8 grid step."""
    p_out = spec.p // 2
    lout = p_out * cout
    quant = absmax is not None
    wi = w
    if real_c < spec.c:
        wi = jnp.pad(wi, ((0, 0), (0, 0), (0, spec.c - real_c), (0, 0)))
    bias_ch = bias.astype(jnp.float32)
    prep = {}
    if quant:
        (wq,), sw = _quantize_weights([wi], (absmax,))
        b2 = _build_b2(wq, p_out)
        ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
        scale_ch = ax * sw / (127.0 * 127.0)
        if out_absmax is not None:
            inv_out = 127.0 / jnp.maximum(
                out_absmax.astype(jnp.float32), 1e-12
            )
            scale_ch = scale_ch * inv_out
            bias_ch = bias_ch * inv_out
        prep["scale"] = jnp.tile(scale_ch, (p_out,)).reshape(1, lout)
        if int8_input:
            prep["fs"] = jnp.full((1, 1), 0.25, jnp.float32)
        else:
            prep["fs"] = (0.25 * 127.0 / ax).reshape(1, 1)
    else:
        b2 = _build_b2(wi.astype(dtype), p_out)
        prep["fs"] = jnp.full((1, 1), 0.25, jnp.float32)
    prep["b2"] = b2
    prep["bias"] = jnp.tile(bias_ch, (p_out,)).reshape(1, lout)
    return prep


@functools.partial(
    jax.jit, static_argnames=("spec", "real_c", "k", "cout", "off_out",
                              "slope", "out_dtype"),
)
def _conv_pool_packed_impl(
    x: jnp.ndarray,
    prep: dict,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    b, h_src, m, lin_src = x.shape
    p_in = spec.p
    p_out = p_in // 2
    hh = (k - 1) // 2
    q = q_count(k, p_out)
    quant = absmax is not None
    assert out_absmax is None or quant
    assert quant or x.dtype != jnp.int8
    dtype = out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
    if out_absmax is not None:
        dtype = jnp.int8
    h_out = h_src // 2
    d = spec.off % 2
    off_pool = spec.off // 2

    assert x.shape == (b, h_src, m, _round_up(p_in * spec.c, LANES)), (
        x.shape, spec)
    assert p_in * spec.c == lin_src, (spec, lin_src)  # lane-exact packing
    assert h_out % RB == 0 and h_src >= WIN_PSRC, (h_out, h_src)
    assert (off_pool - hh - off_out) % p_out == 0, (spec, k, off_out)
    s = (off_pool - hh - off_out) // p_out

    lout = p_out * cout
    b2 = prep["b2"]
    bias_lanes = prep["bias"]
    scale_lanes = prep.get("scale")
    fs = prep["fs"]
    win_dt = jnp.int8 if quant else dtype
    wl = _round_up(max(0, -s), 8)

    mw = wl + m + max(0, s + q - 1) + d  # +d: the boundary pair's shift
    kernel = _kernel_body_pool(
        k=k, q=q, m=m, h_src=h_src, wl=wl, s_shift=s, lin_src=lin_src,
        lout=lout, cout=cout, p_in=p_in, d=d, off_out=off_out,
        w_out=spec.w // 2, slope=slope, out_dtype=dtype, quant=quant,
        quant_out=out_absmax is not None,
    )
    operands = [x, b2, bias_lanes]
    if quant:
        operands.append(scale_lanes)
    operands.append(fs)
    n_vmem = len(operands) - 1
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // RB),
        out_shape=jax.ShapeDtypeStruct((b, h_out, m, lout), dtype),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        ),
        out_specs=pl.BlockSpec(
            (1, RB, m, lout), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(scratch := [
            pltpu.VMEM((WIN_PSRC, mw, lin_src), x.dtype),
            pltpu.VMEM((RB + 2 * hh, mw, p_out * (lin_src // p_in)), win_dt),
            pltpu.SemaphoreType.DMA(()),
        ]),
        compiler_params=_compiler_params(
            _vmem_ref_bytes(scratch)
            + _arr_bytes(operands[1:])
            + RB * m * lout * np.dtype(dtype).itemsize
        ),
    )(*operands)


def _conv_pool_packed_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Reference/fallback: packed pool -> packed conv (both XLA).

    An int8 input pools ON the int8 grid (sum-of-4 * 0.25, rounded) —
    exactly the kernel's math. Dequantize->pool->requantize is NOT
    equivalent in f32: a 4-tap integer sum lands on an exact .5 grid tie
    25% of the time, and the *(ax/127) ... *(127/ax) roundtrip perturbs
    those ties either way, flipping ~1 in 8 pooled elements by one grid
    step (this was the old fallback, and the reason the on-device
    conv_pool int8 selfcheck scored 49.7 dB while its siblings scored
    104+ — the KERNEL was the exact side)."""
    from rrin_tpu.ops.packed import avg_pool_2x_packed

    if absmax is None:
        xp_, ps = avg_pool_2x_packed(x[..., : spec.lanes], spec)
        if out_dtype is not None:
            xp_ = xp_.astype(out_dtype)
        return _conv_packed_xla(
            [pad_lanes(xp_, _round_up(ps.lanes, LANES))], w, bias, (ps,),
            (real_c,), off_out, slope, out_dtype=out_dtype,
        )
    if x.dtype == jnp.int8:
        xp_, ps = avg_pool_2x_packed(
            x[..., : spec.lanes].astype(jnp.float32), spec
        )
        xq = jnp.clip(jnp.round(xp_), -127.0, 127.0).astype(jnp.int8)
        return _conv_packed_xla(
            [pad_lanes(xq, _round_up(ps.lanes, LANES))], w, bias, (ps,),
            (real_c,), off_out, slope, (absmax,), out_absmax, out_dtype,
        )
    xf = x[..., : spec.lanes].astype(jnp.float32)
    xp_, ps = avg_pool_2x_packed(xf, spec)
    return _conv_packed_xla(
        [pad_lanes(xp_, _round_up(ps.lanes, LANES))], w, bias, (ps,),
        (real_c,), off_out, slope, (absmax,), out_absmax, out_dtype,
    )


def conv_pool_packed(
    x: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    off_out: int,
    slope: Optional[float] = None,
    in_absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    prepared: Optional[dict] = None,
    collect=None,
) -> Tuple[jnp.ndarray, PackedSpec]:
    """Fused 2x-avg-pool + conv2d(stride 1, SAME) + bias + LReLU.

    ``x``/``spec`` describe the FULL-resolution packed input; the result is
    the conv applied to its 2x average pool (identical to
    avg_pool_2x_packed + conv_packed), packed at ``off_out`` with P halved
    and M unchanged. The pooled tensor is never materialized in HBM.
    Inference-only (no VJP); Mosaic on TPU, XLA elsewhere.

    ``in_absmax``/``out_absmax``/``out_dtype``: as in :func:`conv_packed`
    (an int8-dtyped ``x`` is already on the 127/in_absmax grid — the
    carried-int8 path, with half the window DMA bytes).
    """
    k = w.shape[0]
    cout = w.shape[3]
    assert real_c == w.shape[2], (real_c, w.shape)
    assert out_absmax is None or in_absmax is not None
    xp = pad_lanes(x, _round_up(spec.p * spec.c, LANES))
    out_spec = PackedSpec(
        p=spec.p // 2, c=cout, w=spec.w // 2, off=off_out, m=spec.m
    )
    if prepared is None:
        prepared = prep_conv_pool(
            w, bias, spec, real_c, k, cout, in_absmax, out_absmax,
            dtype=out_dtype or (jnp.bfloat16 if xp.dtype == jnp.int8
                                else xp.dtype),
            int8_input=xp.dtype == jnp.int8,
        )
    if collect is not None:
        collect[0][collect[1]] = prepared
    if _FORCE_KERNEL:  # interpret-mode tests on CPU
        y = _conv_pool_packed_impl(
            xp, prepared, spec, real_c, k, cout, off_out, slope,
            in_absmax, out_absmax, out_dtype,
        )
        return y, out_spec
    if in_absmax is None:
        y = jax.lax.platform_dependent(
            xp, prepared, w, bias,
            tpu=lambda a, pr, ww, bb: _conv_pool_packed_impl(
                a, pr, spec, real_c, k, cout, off_out,
                slope, out_dtype=out_dtype,
            ),
            default=lambda a, pr, ww, bb: _conv_pool_packed_xla(
                a, ww, bb, spec, real_c, off_out, slope, out_dtype=out_dtype
            ),
        )
    else:
        oam = (out_absmax,) if out_absmax is not None else ()
        y = jax.lax.platform_dependent(
            xp, prepared, w, bias, in_absmax, *oam,
            tpu=lambda a, pr, ww, bb, am, *oa: _conv_pool_packed_impl(
                a, pr, spec, real_c, k, cout, off_out,
                slope, am, oa[0] if oa else None, out_dtype,
            ),
            default=lambda a, pr, ww, bb, am, *oa: _conv_pool_packed_xla(
                a, ww, bb, spec, real_c, off_out, slope, am,
                oa[0] if oa else None, out_dtype,
            ),
        )
    return y, out_spec


def _conv_up_packed_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Reference/fallback: packed upsample -> unpack -> XLA conv -> repack.
    With ``absmax``, fake-quantizes through the kernel's int8 grid. An
    int8 input dequantizes first — exactly the kernel's math, since the
    upsample is linear: round(up(q)) == quantize(up(q * ax/127))."""
    from rrin_tpu.ops.packed import upsample_2x_packed

    if absmax is None:
        xu, su = upsample_2x_packed(x[..., : spec.lanes], spec)
        xn = unpack(xu, su, c=real_c)
        y = _conv_xla(xn, w.astype(xn.dtype), bias, slope)
        if out_dtype is not None:
            y = y.astype(out_dtype)
        yp, _ = pack(y, su.p, off_out, su.m)
        return yp

    ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
    xf = x[..., : spec.lanes].astype(jnp.float32)
    if x.dtype == jnp.int8:
        xf = xf * (ax / 127.0)
    xu, su = upsample_2x_packed(xf, spec)
    xn = unpack(xu, su, c=real_c)
    wi = w
    if real_c < spec.c:
        wi = jnp.pad(wi, ((0, 0), (0, 0), (0, spec.c - real_c), (0, 0)))
    (wq,), sw = _quantize_weights([wi], (absmax,))
    xdq = _quantize_act(xn, ax).astype(jnp.float32) * (ax / 127.0)
    wd = wq.astype(jnp.float32) * (sw / 127.0)
    y = _conv_xla(xdq, wd[:, :, :real_c, :], bias, slope)
    if out_absmax is not None:
        y = _quantize_act(y, out_absmax)
    else:
        y = y.astype(
            out_dtype
            or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
        )
    yp, _ = pack(y, su.p, off_out, su.m)
    return yp


def conv_up_packed(
    x: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    off_out: int,
    slope: Optional[float] = None,
    in_absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    prepared: Optional[dict] = None,
    collect=None,
) -> Tuple[jnp.ndarray, PackedSpec]:
    """Fused 2x-bilinear-upsample + conv2d(stride 1, SAME) + bias + LReLU.

    ``x``/``spec`` describe the HALF-resolution packed input; the result is
    the conv applied to its 2x bilinear upsample (torch align_corners=False
    semantics, identical to upsample_2x_packed + conv_packed), packed at
    ``off_out`` with P doubled and M unchanged. The doubled tensor is never
    materialized in HBM. Inference-only (no VJP); Mosaic on TPU, XLA
    elsewhere.

    ``in_absmax``: optional calibrated |x| max (traced f32 scalar) — the
    int8 path: constructed rows quantize in-register and the contraction
    runs int8 x int8 -> int32 on the MXU. An int8-dtyped ``x`` is taken as
    already on the 127/in_absmax grid (half the window DMA bytes).
    ``out_absmax``/``out_dtype``: as in :func:`conv_packed`.
    """
    k = w.shape[0]
    cout = w.shape[3]
    assert real_c == w.shape[2], (real_c, w.shape)
    assert out_absmax is None or in_absmax is not None
    xp = pad_lanes(x, _round_up(spec.p * spec.c, LANES))
    out_spec = PackedSpec(
        p=2 * spec.p, c=cout, w=2 * spec.w, off=off_out, m=spec.m
    )
    if prepared is None:
        prepared = prep_conv_up(
            w, bias, spec, real_c, k, cout, in_absmax, out_absmax,
            dtype=out_dtype or (jnp.bfloat16 if xp.dtype == jnp.int8
                                else xp.dtype),
            int8_input=xp.dtype == jnp.int8,
        )
    if collect is not None:
        collect[0][collect[1]] = prepared
    if _FORCE_KERNEL:  # interpret-mode tests on CPU
        y = _conv_up_packed_impl(
            xp, prepared, spec, real_c, k, cout, off_out, slope,
            in_absmax, out_absmax, out_dtype,
        )
        return y, out_spec
    if in_absmax is None:
        y = jax.lax.platform_dependent(
            xp, prepared, w, bias,
            tpu=lambda a, pr, ww, bb: _conv_up_packed_impl(
                a, pr, spec, real_c, k, cout, off_out,
                slope, out_dtype=out_dtype,
            ),
            default=lambda a, pr, ww, bb: _conv_up_packed_xla(
                a, ww, bb, spec, real_c, off_out, slope, out_dtype=out_dtype
            ),
        )
    else:
        oam = (out_absmax,) if out_absmax is not None else ()
        y = jax.lax.platform_dependent(
            xp, prepared, w, bias, in_absmax, *oam,
            tpu=lambda a, pr, ww, bb, am, *oa: _conv_up_packed_impl(
                a, pr, spec, real_c, k, cout, off_out,
                slope, am, oa[0] if oa else None, out_dtype,
            ),
            default=lambda a, pr, ww, bb, am, *oa: _conv_up_packed_xla(
                a, ww, bb, spec, real_c, off_out, slope, am,
                oa[0] if oa else None, out_dtype,
            ),
        )
    return y, out_spec


def _conv_packed_xla(
    xs: Sequence[jnp.ndarray],
    w: jnp.ndarray,
    bias: jnp.ndarray,
    specs: Sequence[PackedSpec],
    real_cs: Sequence[int],
    off_out: int,
    slope: Optional[float],
    absmax: Optional[Tuple[jnp.ndarray, ...]] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    m_out: Optional[int] = None,
    m_double: bool = False,
) -> jnp.ndarray:
    """Reference/fallback: unpack -> concat -> XLA conv -> repack.
    Semantically identical to the kernel (including output guard zeros);
    with ``absmax`` it fake-quantizes activations and weights through the
    SAME int8 grid the Mosaic kernel uses, so CPU tests gate the exact
    int8 math. int8-dtyped operands are taken as already on their grid;
    ``out_absmax`` quantizes the result to int8 like the kernel epilogue.
    ``m_out``/``m_double`` mirror :func:`conv_packed`'s output geometry."""
    rows = specs[0].m if m_out is None else m_out
    p_out, m_fin = (
        (specs[0].p // 2, 2 * rows) if m_double else (specs[0].p, rows)
    )
    if absmax is None:
        xn = jnp.concatenate(
            [unpack(x, s, c=rc) for x, s, rc in zip(xs, specs, real_cs)],
            axis=-1,
        )
        y = _conv_xla(xn, w.astype(xn.dtype), bias, slope)
        if out_dtype is not None:
            y = y.astype(out_dtype)
        yp, _ = pack(y, p_out, off_out, m_fin)
        return yp

    row, wis = 0, []
    for spec, rc in zip(specs, real_cs):
        wi = w[:, :, row : row + rc, :]
        row += rc
        if rc < spec.c:
            wi = jnp.pad(wi, ((0, 0), (0, 0), (0, spec.c - rc), (0, 0)))
        wis.append(wi)
    wqs, sw = _quantize_weights(wis, absmax)
    a0 = jnp.maximum(absmax[0].astype(jnp.float32), 1e-12)
    xns, wds = [], []
    for x, spec, rc, ax, wq in zip(xs, specs, real_cs, absmax, wqs):
        axc = jnp.maximum(ax.astype(jnp.float32), 1e-12)
        if x.dtype == jnp.int8:
            qx = unpack(x, spec, c=rc)
        else:
            xn = unpack(x, spec, c=rc).astype(jnp.float32)
            qx = _quantize_act(xn, ax)
        xns.append(qx.astype(jnp.float32) * (axc / 127.0))
        wd = wq.astype(jnp.float32) * (sw / 127.0) * (a0 / axc)
        wds.append(wd[:, :, :rc, :])
    y = _conv_xla(
        jnp.concatenate(xns, axis=-1),
        jnp.concatenate(wds, axis=2),
        bias,
        slope,
    )
    if out_absmax is not None:
        y = _quantize_act(y, out_absmax)
    else:
        fdt = [x.dtype for x in xs if x.dtype != jnp.int8]
        y = y.astype(out_dtype or (fdt[0] if fdt else jnp.bfloat16))
    yp, _ = pack(y, p_out, off_out, m_fin)
    return yp


def conv_packed(
    parts,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    off_out: int,
    slope: Optional[float] = None,
    in_absmax: Optional[Tuple[jnp.ndarray, ...]] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    prepared: Optional[dict] = None,
    collect=None,
    m_out: Optional[int] = None,
    m_double: bool = False,
) -> Tuple[jnp.ndarray, PackedSpec]:
    """Packed-in/packed-out conv2d(stride 1, SAME) + bias + LeakyReLU.

    parts: list of (x, spec, real_c) operands — their channel concat (in
    order, first real_c channels of each) is the conv input; w has
    cin = sum(real_c). spec.c >= real_c allows channel-padded operands
    (the pad rows of B2 are zero, so padding is free numerically).
    Returns (y, out_spec) packed at ``off_out``. Inference-only (no VJP);
    Mosaic on TPU, XLA elsewhere.

    ``in_absmax``: optional per-operand calibrated |x| maxima (traced f32
    scalars) — selects the int8 path: activations and weights quantize to
    a symmetric int8 grid and the contraction runs int8 x int8 -> int32 on
    the MXU (~2x the bf16 rate on v5e, half the window DMA bytes).
    int8-dtyped operands are taken as ALREADY on the grid 127/ax_i (a
    carried quant-out producer) and skip the quantize pass.

    ``out_absmax``: emit int8 on the grid 127/out_absmax straight from the
    kernel epilogue — the carried-int8 fast path that avoids a separate
    full-tensor quantize (and halves the tensor's HBM bytes) when every
    consumer quantizes by this producer's calibrated range.

    ``out_dtype``: output dtype when inputs are int8 but the output is not
    quantized (e.g. the last carried conv before an unquantized head).

    ``prepared``: weight-side constants from :func:`prep_conv` for this
    exact site — skips rebuilding B2/bias/scales inside the jitted frame.
    ``collect``: a ``(store, key)`` pair; the site's prep is computed and
    recorded in ``store[key]`` (the prepare-once collection pass).

    ``m_out``: trim the output to the first m_out storage groups (tail
    guard groups dropped) so a wider-M operand chain can rejoin a
    narrower plan. ``m_double``: emit the output reinterpreted at
    P/2 — (B, H, 2*m_out, P*cout/2), lane = slot*cout + co with slot in
    [0, P/2) — via an in-kernel sublane interleave; the dense-entry stem
    (a P=8, C<=16 entry pack at HALF the pad+copy bytes of the P=4, C=32
    one) uses it to hand the standard P=4 layout to the rest of the net.
    """
    k = w.shape[0]
    xs, specs, real_cs = zip(*[
        (pad_lanes(x, _round_up(s.p * s.c, LANES)), s, rc)
        for x, s, rc in parts
    ])
    cout = w.shape[3]
    assert sum(real_cs) == w.shape[2], (real_cs, w.shape)
    assert in_absmax is None or len(in_absmax) == len(parts)
    assert out_absmax is None or in_absmax is not None
    rows = specs[0].m if m_out is None else m_out
    if m_double:
        assert specs[0].p % 2 == 0 and (specs[0].p * cout) % 256 == 0
        out_spec = PackedSpec(
            p=specs[0].p // 2, c=cout, w=specs[0].w, off=off_out, m=2 * rows
        )
    else:
        out_spec = PackedSpec(
            p=specs[0].p, c=cout, w=specs[0].w, off=off_out, m=rows
        )
    amax = tuple(in_absmax) if in_absmax is not None else None
    if prepared is None:
        fdt = [x.dtype for x in xs if x.dtype != jnp.int8]
        # B2 dtype matches the contraction (= input) dtype; out_dtype is
        # an epilogue cast only.
        prepared = prep_conv(
            w, bias, specs, real_cs, k, cout, amax, out_absmax,
            dtype=fdt[0] if fdt else jnp.bfloat16,
        )
    if collect is not None:
        collect[0][collect[1]] = prepared
    if _FORCE_KERNEL:  # interpret-mode tests on CPU
        y = _conv_packed_impl(
            xs, prepared, specs, real_cs, k, cout, off_out, slope, amax,
            out_absmax, out_dtype, m_out=m_out, m_double=m_double,
        )
        return y, out_spec
    if amax is None:
        y = jax.lax.platform_dependent(
            xs, prepared, w, bias,
            tpu=lambda a, pr, ww, bb: _conv_packed_impl(
                a, pr, specs, real_cs, k, cout,
                off_out, slope, out_dtype=out_dtype,
                m_out=m_out, m_double=m_double,
            ),
            default=lambda a, pr, ww, bb: _conv_packed_xla(
                a, ww, bb, specs, real_cs, off_out, slope,
                out_dtype=out_dtype, m_out=m_out, m_double=m_double,
            ),
        )
    else:
        oam = (out_absmax,) if out_absmax is not None else ()
        y = jax.lax.platform_dependent(
            xs, prepared, w, bias, amax, *oam,
            tpu=lambda a, pr, ww, bb, am, *oa: _conv_packed_impl(
                a, pr, specs, real_cs, k, cout,
                off_out, slope, tuple(am), oa[0] if oa else None, out_dtype,
                m_out=m_out, m_double=m_double,
            ),
            default=lambda a, pr, ww, bb, am, *oa: _conv_packed_xla(
                a, ww, bb, specs, real_cs, off_out, slope, tuple(am),
                oa[0] if oa else None, out_dtype,
                m_out=m_out, m_double=m_double,
            ),
        )
    return y, out_spec


# ---------------------------------------------------------------------------
# Fused 2x-bilinear-upsample + conv at the l3->l2 re-entry (M-doubling).
#
# The u3/u4 fused-up kernel doubles P with M constant; at the level-3->2
# boundary P is already 1, so the width doubling must double M instead
# (m3 -> m0 storage groups). Round 2 left this boundary MATERIALIZED
# (plain upsample + pack + quantize, the "u2-boundary" lever of
# docs/PERFORMANCE.md): the only remaining full-size XLA resample in the
# int8 frame. This kernel constructs the upsampled rows in VMEM from a
# HALF-res window (the same H recipe as _kernel_body_up) and expands W by
# sublane arithmetic:
#
#   * W: out pixel 2s = 0.25*src[s-1] + 0.75*src[s] and out pixel
#     2s+1 = 0.75*src[s] + 0.25*src[s+1] (torch align_corners=False).
#     E/O sequences cost one sublane roll each; the interleave is a
#     (m,2,L)->(2m,L) sublane reshape (Mosaic-lowerable, probed). The
#     W-edge clamp collapses to the same multiplicative mask as the
#     P-doubling kernel: x 4/3 at the first/last real pixel (the
#     out-of-range tap hit a guard zero instead of the clamped edge
#     value), x 0 beyond the last real pixel (kills the 0.25 leak into
#     the guard), x 1 elsewhere; int8 folds 127/ax into the same mask.
#   * Contraction: the constructed rows are placed in the OUTPUT storage
#     geometry (m_out groups at off_out), so B2/bias/scale are exactly
#     :func:`prep_conv`'s for a pseudo input spec describing the
#     upsampled tensor, and the dots are the plain P=1 kernel's.
#
# Routability is narrower than the P-doubling kernel: the true (unpadded)
# source height must give h_out % RB == 0 (the H-padded-l2 shapes keep
# the materialized path), and the doubled source groups must fit the
# output window (off_out + 2*m_src <= m_out + hh).
# ---------------------------------------------------------------------------


def supports_up_m(
    spec: PackedSpec, k: int, cout: int, h_src: int, m_out: int,
    off_out: int,
) -> bool:
    """Static routability of the M-doubling fused upsample+conv site.
    ``spec`` describes the HALF-res P=1 input; ``h_src`` its TRUE height
    (the array may carry extra H-pad rows, never read)."""
    hh = (k - 1) // 2
    return (
        spec.p == 1
        and spec.off == 0
        and k % 2 == 1
        and 3 <= k <= 5
        and k * cout > LANES  # no fuse_dy B2 layout in this kernel
        and (2 * h_src) % RB == 0
        and h_src >= WIN_SRC
        and spec.m % 8 == 0
        and m_out % 8 == 0
        and cout <= 4 * LANES
        and spec.c <= 4 * LANES
        and off_out + 2 * spec.w <= m_out
        and off_out + 2 * spec.m <= m_out + hh
    )


def prep_conv_up_m(
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    m_out: int,
    off_out: int,
    absmax=None,
    out_absmax=None,
    dtype=jnp.bfloat16,
    int8_input: bool = False,
) -> dict:
    """Weight-side constants of one M-doubling fused-upsample conv site.
    B2/bias/scale come from :func:`prep_conv` against the pseudo spec of
    the (never materialized) upsampled tensor; ``inva`` quantizes the
    constructed rows in-register (1 for an already-int8 input — the
    upsample is convex, so the input's absmax calibrates the rows)."""
    spec_up = PackedSpec(p=1, c=spec.c, w=2 * spec.w, off=off_out, m=m_out)
    prep = dict(
        prep_conv(
            w, bias, (spec_up,), (real_c,), k, cout,
            absmax=None if absmax is None else (absmax,),
            out_absmax=out_absmax, dtype=dtype,
        )
    )
    if absmax is not None:
        ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
        if int8_input:
            prep["inva"] = jnp.ones((1, 1), jnp.float32)
        else:
            prep["inva"] = (127.0 / ax).reshape(1, 1)
    return prep


def _kernel_body_up_m(
    *, k: int, q: int, m_src: int, m_out: int, h_src: int, wl: int,
    s_shift: int, lin: int, lout: int, cout: int, w_half: int,
    off_out: int, slope: Optional[float], out_dtype, quant: bool = False,
    quant_out: bool = False,
):
    hh = (k - 1) // 2
    h_out = 2 * h_src
    n_rows = RB + 2 * hh
    acc_dt = jnp.int32 if quant else jnp.float32
    seg = wl + off_out  # first window column of the upsampled segment

    def kernel(*refs):
        if quant:
            (x_ref, b2_ref, bias_ref, scale_ref, inva_ref, out_ref,
             swin, uwin, cmask, sem) = refs
        else:
            x_ref, b2_ref, bias_ref, out_ref, swin, uwin, cmask, sem = refs
            scale_ref = inva_ref = None
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        r0 = ri * RB
        base = r0 // 2
        ws = jnp.clip(((base - hh) >> 3) << 3, 0, h_src - WIN_SRC)
        ws = pl.multiple_of(ws, 8)

        cpy = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ws, WIN_SRC), :, :], swin, sem
        )
        cpy.start()

        mw = uwin.shape[1]

        @pl.when(jnp.logical_and(bi == 0, ri == 0))
        def _():
            # Static guard columns of the row buffer (zero once).
            uwin[:, :seg, :] = jnp.zeros_like(uwin[:, :seg, :])
            if mw > seg + 2 * m_src:
                uwin[:, seg + 2 * m_src:, :] = jnp.zeros_like(
                    uwin[:, seg + 2 * m_src:, :]
                )
            # Edge-correction mask over the upsampled pixel sequence.
            po = jax.lax.broadcasted_iota(jnp.int32, (2 * m_src, lin), 0)
            mask = jnp.ones((2 * m_src, lin), jnp.float32)
            mask = jnp.where(
                (po == 0) | (po == 2 * w_half - 1), 4.0 / 3.0, mask
            )
            mask = jnp.where(po >= 2 * w_half, 0.0, mask)
            if quant:
                mask = mask * inva_ref[0, 0]
            cmask[...] = mask

        # Output guard mask (P=1).
        mi = jax.lax.broadcasted_iota(jnp.int32, (m_out, lout), 0)
        pixo = mi - off_out
        gmask = jnp.logical_and(pixo >= 0, pixo < 2 * w_half)

        cpy.wait()

        # Construct the n_rows upsampled rows this block needs.
        for i in range(n_rows):
            du = i - hh
            o0 = (du - 1) >> 1
            w0, w1 = (0.75, 0.25) if (du & 1) else (0.25, 0.75)
            j0 = jnp.clip(base + o0, 0, h_src - 1)
            j1 = jnp.clip(base + o0 + 1, 0, h_src - 1)
            hrow = (w0 * swin[j0 - ws].astype(jnp.float32)
                    + w1 * swin[j1 - ws].astype(jnp.float32))
            prv = jnp.concatenate(
                [jnp.zeros_like(hrow[:1]), hrow[:-1]], axis=0
            )
            nxt = jnp.concatenate(
                [hrow[1:], jnp.zeros_like(hrow[:1])], axis=0
            )
            even = 0.25 * prv + 0.75 * hrow
            odd = 0.75 * hrow + 0.25 * nxt
            urow = jnp.stack([even, odd], axis=1).reshape(2 * m_src, lin)
            urow = urow * cmask[...]
            u = r0 + du
            valid = jnp.logical_and(u >= 0, u < h_out)
            urow = jnp.where(valid, urow, 0.0)
            if quant:
                urow = jnp.clip(jnp.round(urow), -127.0, 127.0)
            uwin[i, pl.ds(seg, 2 * m_src), :] = urow.astype(uwin.dtype)

        for yo in range(RB):
            acc = jnp.zeros((m_out, lout), acc_dt)
            for dy in range(k):
                for qi in range(q):
                    cs = wl + s_shift + qi
                    acc = acc + jnp.dot(
                        uwin[yo + dy, pl.ds(cs, m_out), :],
                        b2_ref[dy * q + qi],
                        preferred_element_type=acc_dt,
                    )
            if quant:
                acc = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
            else:
                acc = acc + bias_ref[:]
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            acc = jnp.where(gmask, acc, 0.0)
            if quant_out:
                acc = jnp.clip(jnp.round(acc), -127.0, 127.0)
            out_ref[0, yo] = acc.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spec", "real_c", "k", "cout", "m_out", "off_out",
                     "h_src", "slope", "out_dtype"),
)
def _conv_up_m_impl(
    x: jnp.ndarray,
    prep: dict,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    m_out: int,
    off_out: int,
    h_src: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    b, h_arr, m_src, lin = x.shape
    assert m_src == spec.m and lin == _round_up(spec.c, LANES), (
        x.shape, spec)
    assert h_arr >= h_src, (h_arr, h_src)
    hh = (k - 1) // 2
    q = q_count(k, 1)
    h_out = 2 * h_src
    quant = absmax is not None
    assert out_absmax is None or quant
    assert quant or x.dtype != jnp.int8
    dtype = out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
    if out_absmax is not None:
        dtype = jnp.int8
    assert h_out % RB == 0 and h_src >= WIN_SRC, (h_out, h_src)

    spec_up = PackedSpec(p=1, c=spec.c, w=2 * spec.w, off=off_out, m=m_out)
    (wl,), (s,), (lin_up,) = _conv_statics((spec_up,), k, off_out)
    assert lin_up == lin, (lin_up, lin)
    lout = cout
    mw = wl + m_out + max(0, s + q - 1)
    assert wl + off_out + 2 * m_src <= mw, (wl, off_out, m_src, mw)

    b2 = prep["b2s"][0]
    bias_lanes = prep["bias"]
    scale_lanes = prep.get("scale")
    inva = prep.get("inva")
    win_dt = jnp.int8 if quant else dtype
    kernel = _kernel_body_up_m(
        k=k, q=q, m_src=m_src, m_out=m_out, h_src=h_src, wl=wl,
        s_shift=s, lin=lin, lout=lout, cout=cout, w_half=spec.w,
        off_out=off_out, slope=slope, out_dtype=dtype, quant=quant,
        quant_out=out_absmax is not None,
    )
    operands = [x, b2, bias_lanes]
    n_vmem = 2
    if quant:
        operands += [scale_lanes, inva]
        n_vmem = 4
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // RB),
        out_shape=jax.ShapeDtypeStruct((b, h_out, m_out, lout), dtype),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        ),
        out_specs=pl.BlockSpec(
            (1, RB, m_out, lout), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(scratch := [
            pltpu.VMEM((WIN_SRC, m_src, lin), x.dtype),
            pltpu.VMEM((RB + 2 * hh, mw, lin), win_dt),
            pltpu.VMEM((2 * m_src, lin), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]),
        compiler_params=_compiler_params(
            _vmem_ref_bytes(scratch)
            + _arr_bytes(operands[1:])
            + RB * m_out * lout * np.dtype(dtype).itemsize
        ),
    )(*operands)


def _conv_up_m_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    m_out: int,
    off_out: int,
    h_src: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Reference/fallback: unpack -> upsample -> XLA conv -> repack at
    (P=1, m_out).

    An int8 input upsamples ON the int8 grid (f32 interp of the integer
    codes, rounded) — exactly the kernel's row construction. The
    dequant->upsample->requant order is NOT equivalent: bilinear taps of
    integer codes land on exact .25/.5/.75 grid ties, and the
    *(ax/127) ... *(127/ax) f32 roundtrip perturbs those ties either
    way (the same effect fixed in :func:`_conv_pool_packed_xla`; before
    this fix the on-device conv_up_m int8 selfcheck scored 53 dB with
    the KERNEL as the exact side)."""
    from rrin_tpu.ops.resize import upsample_2x_bilinear

    if absmax is None:
        xn = unpack(x, spec, c=real_c)[:, :h_src]
        xu = upsample_2x_bilinear(xn)
        y = _conv_xla(xu, w.astype(xu.dtype), bias, slope)
        if out_dtype is not None:
            y = y.astype(out_dtype)
        yp, _ = pack(y, 1, off_out, m_out)
        return yp

    ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
    xn = unpack(x, spec, c=real_c)[:, :h_src].astype(jnp.float32)
    wi = w
    if real_c < spec.c:
        wi = jnp.pad(wi, ((0, 0), (0, 0), (0, spec.c - real_c), (0, 0)))
    (wq,), sw = _quantize_weights([wi], (absmax,))
    if x.dtype == jnp.int8:
        # Interpolate the integer codes, re-round to the same grid.
        xq = jnp.clip(jnp.round(upsample_2x_bilinear(xn)), -127.0, 127.0)
    else:
        xq = _quantize_act(upsample_2x_bilinear(xn), ax).astype(jnp.float32)
    xdq = xq * (ax / 127.0)
    wd = wq.astype(jnp.float32) * (sw / 127.0)
    y = _conv_xla(xdq, wd[:, :, :real_c, :], bias, slope)
    if out_absmax is not None:
        y = _quantize_act(y, out_absmax)
    else:
        y = y.astype(
            out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
        )
    yp, _ = pack(y, 1, off_out, m_out)
    return yp


def conv_up_m_packed(
    x: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    m_out: int,
    off_out: int,
    h_src: int,
    slope: Optional[float] = None,
    in_absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    prepared: Optional[dict] = None,
    collect=None,
) -> Tuple[jnp.ndarray, PackedSpec]:
    """Fused 2x-bilinear-upsample + conv2d(stride 1, SAME) + bias + LReLU
    across the M-doubling (P=1 -> P=1) level boundary.

    ``x``/``spec`` describe the HALF-resolution P=1 packed input with
    ``h_src`` TRUE rows (extra H-pad rows in the array are never read);
    the result is packed at (P=1, ``m_out``, ``off_out``) with 2*h_src
    rows. The doubled tensor is never materialized in HBM.
    Inference-only (no VJP); Mosaic on TPU, XLA elsewhere. Quantization
    options as in :func:`conv_up_packed`.
    """
    k = w.shape[0]
    cout = w.shape[3]
    assert real_c == w.shape[2], (real_c, w.shape)
    assert out_absmax is None or in_absmax is not None
    assert supports_up_m(spec, k, cout, h_src, m_out, off_out), (
        spec, k, cout, h_src, m_out, off_out)
    xp = pad_lanes(x, _round_up(spec.c, LANES))
    out_spec = PackedSpec(p=1, c=cout, w=2 * spec.w, off=off_out, m=m_out)
    if prepared is None:
        prepared = prep_conv_up_m(
            w, bias, spec, real_c, k, cout, m_out, off_out,
            in_absmax, out_absmax,
            dtype=out_dtype or (jnp.bfloat16 if xp.dtype == jnp.int8
                                else xp.dtype),
            int8_input=xp.dtype == jnp.int8,
        )
    if collect is not None:
        collect[0][collect[1]] = prepared
    if _FORCE_KERNEL:  # interpret-mode tests on CPU
        y = _conv_up_m_impl(
            xp, prepared, spec, real_c, k, cout, m_out, off_out, h_src,
            slope, in_absmax, out_absmax, out_dtype,
        )
        return y, out_spec
    if in_absmax is None:
        y = jax.lax.platform_dependent(
            xp, prepared, w, bias,
            tpu=lambda a, pr, ww, bb: _conv_up_m_impl(
                a, pr, spec, real_c, k, cout, m_out, off_out, h_src,
                slope, out_dtype=out_dtype,
            ),
            default=lambda a, pr, ww, bb: _conv_up_m_xla(
                a, ww, bb, spec, real_c, m_out, off_out, h_src, slope,
                out_dtype=out_dtype,
            ),
        )
    else:
        oam = (out_absmax,) if out_absmax is not None else ()
        y = jax.lax.platform_dependent(
            xp, prepared, w, bias, in_absmax, *oam,
            tpu=lambda a, pr, ww, bb, am, *oa: _conv_up_m_impl(
                a, pr, spec, real_c, k, cout, m_out, off_out, h_src,
                slope, am, oa[0] if oa else None, out_dtype,
            ),
            default=lambda a, pr, ww, bb, am, *oa: _conv_up_m_xla(
                a, ww, bb, spec, real_c, m_out, off_out, h_src, slope,
                am, oa[0] if oa else None, out_dtype,
            ),
        )
    return y, out_spec


# ---------------------------------------------------------------------------
# Phase-folded fused 2x-bilinear-upsample + conv (the up3/up4 fast path,
# generation 2).
#
# The first-generation fused-up kernel (_kernel_body_up) CONSTRUCTS the
# upsampled rows in VMEM — H-interp, then a W-expansion that doubles the
# lane count with slot shuffles and an edge mask — and contracts them at
# out-resolution. At 1080p the trace shows its u4c1-class calls ~2.5x over
# the MXU roofline: the construction VPU work serializes against the dots.
#
# This kernel removes the W half of that work by folding the W-dimension
# upsample INTO the contraction. conv(up(x)) along W is itself a k=3
# stencil on the HALF-res grid with phase-dependent weights
# (align_corners=False, torch grid):
#
#   out[2j+r], r = (x_slot - off_out) & 1 relative to the OUT slot parity:
#     r=0: s[j-1]: .75*W0+.25*W1   s[j]: .25*W0+.75*W1+.75*W2   s[j+1]: .25*W2
#     r=1: s[j-1]: .25*W0          s[j]: .75*W0+.75*W1+.25*W2   s[j+1]: .25*W1+.75*W2
#
# so the dots consume the H-interp rows DIRECTLY (half the lanes, no
# expansion), with a block-Toeplitz B2F whose column blocks enumerate the
# 2*P out slots: out slot pos reads src pixel j_rel(pos) + dx, all static
# per (pos, dx) — including ODD off_out, which the slot-parity fold
# handles without any offset-plan congruence (unlike _conv_statics).
#
# The W-edge clamp cannot ride a multiplicative mask here (there is no
# constructed edge value to scale); instead the exact residual is added
# by two tiny edge dots: the clamped taps differ from the guard-zero
# generic stencil by
#     out[0]     += .25*(W1-W0) . s[0]      out[2w-2] += .25*W2      . s[w-1]
#     out[1]     += .25* W0     . s[0]      out[2w-1] += .25*(W1-W2) . s[w-1]
# (per H-tap dy, same row stencil as the main dots), i.e. per block two
# (RB, lin) x (lin, lout) dot chains on the edge-pixel window columns,
# masked into the edge (group, lane-block) positions of the accumulator.
# H-edge clamping stays free via clipped source-row indices, so corners
# are exact too. Validated against upsample_2x_bilinear + XLA conv to
# ~1e-6 across P in {1, 2} and odd/even offsets.
# ---------------------------------------------------------------------------

# [rho, dx+1, kx] W-upsample fold coefficients (torch bilinear, k=3).
_UPF_A = np.array(
    [
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.75], [0.0, 0.0, 0.25]],
        [[0.25, 0.0, 0.0], [0.75, 0.75, 0.25], [0.0, 0.25, 0.75]],
    ],
    dtype=np.float32,
)


def _upf_statics(p: int, off_in: int, off_out: int):
    """Static (rho, delta, r) maps of the folded stencil plus (dmin, Q)."""
    pos = np.arange(2 * p)
    rho = (pos - off_out) & 1
    jr = (pos - off_out - rho) // 2  # exact (numerator even), floor-safe
    deltas = np.empty((3, 2 * p), np.int64)
    rs = np.empty((3, 2 * p), np.int64)
    for dxi, dx in enumerate((-1, 0, 1)):
        tsl = jr + dx + off_in
        deltas[dxi] = tsl // p
        rs[dxi] = tsl % p
    dmin = int(deltas.min())
    q = int(deltas.max()) - dmin + 1
    return rho, jr, deltas, rs, dmin, q


def supports_up_f(
    spec: PackedSpec, k: int, cout: int, h_src: int, off_out: int
) -> bool:
    """Static routability of the phase-folded fused upsample+conv site.
    ``spec`` describes the HALF-res input; output is (2*spec.p)-packed at
    ``off_out`` (no offset-parity constraint)."""
    p_out = 2 * spec.p
    return (
        k == 3  # _UPF_A is solved for the model's k=3 up convs
        and (2 * h_src) % RB == 0
        and h_src >= WIN_SRC
        and spec.m % 8 == 0
        and spec.w >= 2
        and p_out * cout <= 4 * LANES
        and spec.p * spec.c <= 4 * LANES
        and (spec.p * spec.c) % LANES == 0
        and off_out + 2 * spec.w <= p_out * spec.m
        and spec.m <= 800  # scoped-VMEM bound (see supports_pool)
    )


def _upf_fold(wi: jnp.ndarray):
    """(k,k,cin,cout) f32 -> (weff (2,3,k,cin,cout), cl0, cl1, cr0, cr1)."""
    a = jnp.asarray(_UPF_A)
    weff = jnp.einsum("rdk,ykio->rdyio", a, wi)
    cl0 = 0.25 * (wi[:, 1] - wi[:, 0])
    cl1 = 0.25 * wi[:, 0]
    cr0 = 0.25 * wi[:, 2]
    cr1 = 0.25 * (wi[:, 1] - wi[:, 2])
    return weff, (cl0, cl1, cr0, cr1)


def prep_conv_up_f(
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    off_out: int,
    absmax=None,
    out_absmax=None,
    dtype=jnp.bfloat16,
    int8_input: bool = False,
) -> dict:
    """Weight-side constants of one phase-folded fused-up conv site:
    ``b2`` (k*Q, p*c, 2p*cout) folded block-Toeplitz, ``cl``/``cr``
    (k, p*c, 2p*cout) edge-correction dots, bias/scale lane tiles. int8
    quantizes the FOLDED weights per out-channel, with the edge tensors
    on the SAME per-channel grid so their int32 partials share the
    epilogue scale."""
    p = spec.p
    c = spec.c
    assert k == 3
    rho, _, deltas, rs, dmin, q = _upf_statics(p, spec.off, off_out)
    lin = p * c
    lout = 2 * p * cout
    wi = w.astype(jnp.float32)
    if real_c < c:
        wi = jnp.pad(wi, ((0, 0), (0, 0), (0, c - real_c), (0, 0)))
    weff, (cl0, cl1, cr0, cr1) = _upf_fold(wi)
    bias_ch = bias.astype(jnp.float32)
    quant = absmax is not None
    prep = {}
    if quant:
        ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
        sw = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(weff), axis=(0, 1, 2, 3)),
                jnp.max(
                    jnp.abs(jnp.stack([cl0, cl1, cr0, cr1])), axis=(0, 1, 2)
                ),
            ),
            1e-12,
        )
        qz = lambda t: jnp.clip(
            jnp.round(t * (127.0 / sw)), -127, 127
        ).astype(jnp.int8)
        weff_s, cls = qz(weff), [qz(t) for t in (cl0, cl1, cr0, cr1)]
        scale_ch = ax * sw / (127.0 * 127.0)
        if out_absmax is not None:
            inv_out = 127.0 / jnp.maximum(
                out_absmax.astype(jnp.float32), 1e-12
            )
            scale_ch = scale_ch * inv_out
            bias_ch = bias_ch * inv_out
        prep["scale"] = jnp.tile(scale_ch, (2 * p,)).reshape(1, lout)
        prep["inva"] = (
            jnp.ones((1, 1), jnp.float32) if int8_input
            else (127.0 / ax).reshape(1, 1)
        )
        bdt = jnp.int8
    else:
        weff_s = weff.astype(dtype)
        cls = [t.astype(dtype) for t in (cl0, cl1, cr0, cr1)]
        bdt = dtype
    b2 = jnp.zeros((k, q, lin, lout), bdt)
    for dxi in range(3):
        for po in range(2 * p):
            d = int(deltas[dxi, po]) - dmin
            r = int(rs[dxi, po])
            b2 = b2.at[
                :, d, r * c : (r + 1) * c, po * cout : (po + 1) * cout
            ].add(weff_s[int(rho[po]), dxi])
    prep["b2"] = b2.reshape(k * q, lin, lout)

    def place(pairs, src_slot):
        blk = (src_slot % p) * c
        ce = jnp.zeros((k, lin, lout), bdt)
        for po, t in pairs:
            ce = ce.at[:, blk : blk + c, po * cout : (po + 1) * cout].set(t)
        return ce

    po_of = lambda x: (x + off_out) % (2 * p)
    prep["cl"] = place(
        [(po_of(0), cls[0]), (po_of(1), cls[1])], spec.off
    )
    prep["cr"] = place(
        [(po_of(2 * spec.w - 2), cls[2]), (po_of(2 * spec.w - 1), cls[3])],
        spec.off + spec.w - 1,
    )
    prep["bias"] = jnp.tile(bias_ch, (2 * p,)).reshape(1, lout)
    return prep


def _kernel_body_up_f(
    *, k: int, q: int, m: int, h_src: int, wl: int, dmin: int, lin: int,
    lout: int, cout: int, p_in: int, off_in: int, off_out: int,
    w_half: int, gl: int, gr: int, slope: Optional[float], out_dtype,
    quant: bool = False, quant_out: bool = False,
):
    hh = (k - 1) // 2
    h_out = 2 * h_src
    p_out = 2 * p_in
    n_rows = RB + 2 * hh
    acc_dt = jnp.int32 if quant else jnp.float32
    # Edge out positions: (group, slot-in-group) of out pixels 0, 1 and
    # 2w-2, 2w-1 — the masked add targets.
    lpos = [((x + off_out) // p_out, (x + off_out) % p_out) for x in (0, 1)]
    rpos = [
        ((x + off_out) // p_out, (x + off_out) % p_out)
        for x in (2 * w_half - 2, 2 * w_half - 1)
    ]

    def kernel(*refs):
        if quant:
            (x_ref, b2_ref, cl_ref, cr_ref, bias_ref, scale_ref, inva_ref,
             out_ref, swin, uwin, sem) = refs
        else:
            (x_ref, b2_ref, cl_ref, cr_ref, bias_ref, out_ref,
             swin, uwin, sem) = refs
            scale_ref = inva_ref = None
        bi = pl.program_id(0)
        ri = pl.program_id(1)
        r0 = ri * RB
        base = r0 // 2
        ws = jnp.clip(((base - hh) >> 3) << 3, 0, h_src - WIN_SRC)
        ws = pl.multiple_of(ws, 8)

        cpy = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ws, WIN_SRC), :, :],
            swin.at[pl.ds(0, WIN_SRC), pl.ds(wl, m), :],
            sem,
        )
        cpy.start()

        mw = swin.shape[1]

        @pl.when(jnp.logical_and(bi == 0, ri == 0))
        def _():
            if wl:
                swin[:, :wl, :] = jnp.zeros_like(swin[:, :wl, :])
            if mw > wl + m:
                swin[:, wl + m:, :] = jnp.zeros_like(swin[:, wl + m:, :])

        # Output guard mask.
        mi = jax.lax.broadcasted_iota(jnp.int32, (m, lout), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (m, lout), 1)
        pixo = p_out * mi + li // cout - off_out
        gmask = jnp.logical_and(pixo >= 0, pixo < 2 * w_half)
        po = li // cout
        lmask = jnp.zeros((m, lout), jnp.bool_)
        for gmi, gpo in lpos:
            lmask = lmask | ((mi == gmi) & (po == gpo))
        rmask = jnp.zeros((m, lout), jnp.bool_)
        for gmi, gpo in rpos:
            rmask = rmask | ((mi == gmi) & (po == gpo))

        cpy.wait()

        # H-interp rows (clamped source indices make the H-edge exact).
        for i in range(n_rows):
            du = i - hh
            o0 = (du - 1) >> 1
            w0, w1 = (0.75, 0.25) if (du & 1) else (0.25, 0.75)
            j0 = jnp.clip(base + o0, 0, h_src - 1)
            j1 = jnp.clip(base + o0 + 1, 0, h_src - 1)
            hrow = (w0 * swin[j0 - ws].astype(jnp.float32)
                    + w1 * swin[j1 - ws].astype(jnp.float32))
            if quant:
                hrow = hrow * inva_ref[0, 0]
            u = r0 + du
            valid = jnp.logical_and(u >= 0, u < h_out)
            hrow = jnp.where(valid, hrow, 0.0)
            if quant:
                hrow = jnp.clip(jnp.round(hrow), -127.0, 127.0)
            uwin[i] = hrow.astype(uwin.dtype)

        # Edge-correction dot chains on the edge-pixel window columns.
        el = uwin[:, gl, :]  # (n_rows, lin)
        er = uwin[:, gr, :]
        corr_l = jnp.zeros((RB, lout), acc_dt)
        corr_r = jnp.zeros((RB, lout), acc_dt)
        for dy in range(k):
            corr_l = corr_l + jnp.dot(
                el[dy : dy + RB], cl_ref[dy], preferred_element_type=acc_dt
            )
            corr_r = corr_r + jnp.dot(
                er[dy : dy + RB], cr_ref[dy], preferred_element_type=acc_dt
            )

        for yo in range(RB):
            acc = jnp.zeros((m, lout), acc_dt)
            for dy in range(k):
                for qq in range(q):
                    cs = wl + dmin + qq
                    acc = acc + jnp.dot(
                        uwin[yo + dy, pl.ds(cs, m), :],
                        b2_ref[dy * q + qq],
                        preferred_element_type=acc_dt,
                    )
            zero = jnp.zeros((), acc_dt)
            acc = acc + jnp.where(lmask, corr_l[yo][None, :], zero)
            acc = acc + jnp.where(rmask, corr_r[yo][None, :], zero)
            if quant:
                acc = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
            else:
                acc = acc + bias_ref[:]
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            acc = jnp.where(gmask, acc, 0.0)
            if quant_out:
                acc = jnp.clip(jnp.round(acc), -127.0, 127.0)
            out_ref[0, yo] = acc.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("spec", "real_c", "k", "cout", "off_out",
                              "slope", "out_dtype"),
)
def _conv_up_f_impl(
    x: jnp.ndarray,
    prep: dict,
    spec: PackedSpec,
    real_c: int,
    k: int,
    cout: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    b, h_src, m, lin = x.shape
    p_in = spec.p
    p_out = 2 * p_in
    hh = (k - 1) // 2
    quant = absmax is not None
    assert out_absmax is None or quant
    assert quant or x.dtype != jnp.int8
    dtype = out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
    if out_absmax is not None:
        dtype = jnp.int8
    h_out = 2 * h_src

    assert x.shape == (b, h_src, m, _round_up(p_in * spec.c, LANES)), (
        x.shape, spec)
    assert p_in * spec.c == lin, (spec, lin)
    assert h_out % RB == 0 and h_src >= WIN_SRC, (h_out, h_src)
    _, _, _, _, dmin, q = _upf_statics(p_in, spec.off, off_out)
    wl = _round_up(max(0, -dmin), 8)
    mw = wl + m + max(0, dmin + q - 1)
    gl = wl + spec.off // p_in
    gr = wl + (spec.off + spec.w - 1) // p_in

    lout = p_out * cout
    win_dt = jnp.int8 if quant else dtype
    kernel = _kernel_body_up_f(
        k=k, q=q, m=m, h_src=h_src, wl=wl, dmin=dmin, lin=lin, lout=lout,
        cout=cout, p_in=p_in, off_in=spec.off, off_out=off_out,
        w_half=spec.w, gl=gl, gr=gr, slope=slope, out_dtype=dtype,
        quant=quant, quant_out=out_absmax is not None,
    )
    operands = [x, prep["b2"], prep["cl"], prep["cr"], prep["bias"]]
    if quant:
        operands += [prep["scale"], prep["inva"]]
    n_vmem = len(operands) - 1
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // RB),
        out_shape=jax.ShapeDtypeStruct((b, h_out, m, lout), dtype),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        ),
        out_specs=pl.BlockSpec(
            (1, RB, m, lout), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(scratch := [
            pltpu.VMEM((WIN_SRC, mw, lin), x.dtype),
            pltpu.VMEM((RB + 2 * hh, mw, lin), win_dt),
            pltpu.SemaphoreType.DMA(()),
        ]),
        compiler_params=_compiler_params(
            _vmem_ref_bytes(scratch)
            + _arr_bytes(operands[1:])
            + RB * m * lout * np.dtype(dtype).itemsize
        ),
    )(*operands)


def _conv_up_f_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    off_out: int,
    slope: Optional[float],
    absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Reference/fallback mirroring the folded kernel's semantics.

    float: unpack -> upsample -> conv -> repack (the fold is exact, so
    this equals the kernel up to f32-vs-bf16 accumulation noise). int8:
    H-interp rows ON the int8 grid (rounded), then the folded fake-quant
    stencil + edge corrections — the kernel's exact math with f32 dots.
    """
    from rrin_tpu.ops.resize import upsample_2x_bilinear

    p = spec.p
    h_src = x.shape[1]
    if absmax is None:
        xn = unpack(x, spec, c=real_c)
        xu = upsample_2x_bilinear(xn)
        y = _conv_xla(xu, w.astype(xu.dtype), bias, slope)
        if out_dtype is not None:
            y = y.astype(out_dtype)
        yp, _ = pack(y, 2 * p, off_out, spec.m)
        return yp

    ax = jnp.maximum(absmax.astype(jnp.float32), 1e-12)
    xn = unpack(x, spec, c=real_c).astype(jnp.float32)
    if x.dtype != jnp.int8:
        xn = xn * (127.0 / ax)  # to the grid (codes)
    # H-interp of the codes, re-rounded (the kernel's row construction).
    hh_w = 2 * h_src
    u = jnp.arange(hh_w)
    ry = u % 2
    ii = u // 2
    j0 = jnp.clip(jnp.where(ry == 0, ii - 1, ii), 0, h_src - 1)
    j1 = jnp.clip(jnp.where(ry == 0, ii, ii + 1), 0, h_src - 1)
    w0 = jnp.where(ry == 0, 0.25, 0.75)[None, :, None, None]
    w1 = jnp.where(ry == 0, 0.75, 0.25)[None, :, None, None]
    hq = jnp.clip(jnp.round(w0 * xn[:, j0] + w1 * xn[:, j1]), -127.0, 127.0)
    # Folded fake-quant stencil (per-channel grid shared with the edge
    # tensors, exactly as prep_conv_up_f builds them).
    wi = w.astype(jnp.float32)
    weff, (cl0, cl1, cr0, cr1) = _upf_fold(wi)
    sw = jnp.maximum(
        jnp.maximum(
            jnp.max(jnp.abs(weff), axis=(0, 1, 2, 3)),
            jnp.max(jnp.abs(jnp.stack([cl0, cl1, cr0, cr1])), axis=(0, 1, 2)),
        ),
        1e-12,
    )
    dq = lambda t: jnp.clip(jnp.round(t * (127.0 / sw)), -127, 127) * (
        sw / 127.0
    )
    # (k, 3, cin, 2, cout) -> HWIO (k, 3, cin, 2*cout), rho-major out.
    k = w.shape[0]
    cout = w.shape[3]
    weff_hwio = jnp.transpose(dq(weff), (2, 1, 3, 0, 4)).reshape(
        k, 3, real_c, 2 * cout
    )
    y2 = jax.lax.conv_general_dilated(
        hq, weff_hwio, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (b, 2h, w_half, 2*cout): lanes (rho, cout)
    y = y2.reshape(y2.shape[0], y2.shape[1], 2 * spec.w, cout)

    def ecorr(col, coeffs):
        e = jnp.pad(hq[:, :, col, :], ((0, 0), (1, 1), (0, 0)))
        return sum(
            jnp.einsum(
                "bhc,co->bho", e[:, ky : ky + hh_w], dq(coeffs)[ky],
                precision=jax.lax.Precision.HIGHEST,
            )
            for ky in range(k)
        )

    y = y.at[:, :, 0].add(ecorr(0, cl0))
    y = y.at[:, :, 1].add(ecorr(0, cl1))
    y = y.at[:, :, 2 * spec.w - 2].add(ecorr(spec.w - 1, cr0))
    y = y.at[:, :, 2 * spec.w - 1].add(ecorr(spec.w - 1, cr1))
    # dq() already folded sw/127 back in, so only the activation grid
    # step remains.
    y = y * (ax / 127.0) + bias.astype(jnp.float32)
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    if out_absmax is not None:
        y = _quantize_act(y, out_absmax)
    else:
        y = y.astype(
            out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype)
        )
    yp, _ = pack(y, 2 * p, off_out, spec.m)
    return yp


def conv_up_f_packed(
    x: jnp.ndarray,
    spec: PackedSpec,
    real_c: int,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    off_out: int,
    slope: Optional[float] = None,
    in_absmax: Optional[jnp.ndarray] = None,
    out_absmax: Optional[jnp.ndarray] = None,
    out_dtype=None,
    prepared: Optional[dict] = None,
    collect=None,
) -> Tuple[jnp.ndarray, PackedSpec]:
    """Phase-folded fused 2x-bilinear-upsample + conv2d(SAME) + bias +
    LReLU (generation-2 up3/up4 fast path; see the module comment above
    :func:`supports_up_f`). Consumes the HALF-res (P, spec) input and
    produces the (2P, off_out)-packed result; the upsampled tensor never
    exists, in HBM or in VMEM. Inference-only; Mosaic on TPU, XLA
    elsewhere."""
    k = w.shape[0]
    cout = w.shape[3]
    assert real_c == spec.c == w.shape[2], (real_c, spec, w.shape)
    assert out_absmax is None or in_absmax is not None
    assert supports_up_f(spec, k, cout, x.shape[1], off_out), (
        spec, k, cout, x.shape[1], off_out)
    out_spec = PackedSpec(
        p=2 * spec.p, c=cout, w=2 * spec.w, off=off_out, m=spec.m
    )
    if prepared is None:
        prepared = prep_conv_up_f(
            w, bias, spec, real_c, k, cout, off_out, in_absmax, out_absmax,
            dtype=out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8
                                else x.dtype),
            int8_input=x.dtype == jnp.int8,
        )
    if collect is not None:
        collect[0][collect[1]] = prepared
    if _FORCE_KERNEL:  # interpret-mode tests on CPU
        y = _conv_up_f_impl(
            x, prepared, spec, real_c, k, cout, off_out, slope,
            in_absmax, out_absmax, out_dtype,
        )
        return y, out_spec
    if in_absmax is None:
        y = jax.lax.platform_dependent(
            x, prepared, w, bias,
            tpu=lambda a, pr, ww, bb: _conv_up_f_impl(
                a, pr, spec, real_c, k, cout, off_out, slope,
                out_dtype=out_dtype,
            ),
            default=lambda a, pr, ww, bb: _conv_up_f_xla(
                a, ww, bb, spec, real_c, off_out, slope,
                out_dtype=out_dtype,
            ),
        )
    else:
        oam = (out_absmax,) if out_absmax is not None else ()
        y = jax.lax.platform_dependent(
            x, prepared, w, bias, in_absmax, *oam,
            tpu=lambda a, pr, ww, bb, am, *oa: _conv_up_f_impl(
                a, pr, spec, real_c, k, cout, off_out, slope,
                am, oa[0] if oa else None, out_dtype,
            ),
            default=lambda a, pr, ww, bb, am, *oa: _conv_up_f_xla(
                a, ww, bb, spec, real_c, off_out, slope,
                am, oa[0] if oa else None, out_dtype,
            ),
        )
    return y, out_spec
