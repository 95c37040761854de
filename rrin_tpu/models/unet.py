"""The shared U-Net encoder-decoder (SURVEY.md §2.1 row 2, App-B).

One generic ``UNet(in_ch, out_ch)`` instantiated four times by the cascade
with different channel signatures (flow 6->4, refine 10->4, mask 16->2,
residue 9->3). Architecture per SURVEY.md App-B:

  stem:    conv7x7(in->32)  + LReLU(0.1), conv7x7(32->32) + LReLU
  down_i:  avgpool2x2 -> convKxK + LReLU -> convKxK + LReLU
           widths 32->64 (K=5), 64->128 (3), 128->256 (3), 256->512 (3)
  up_i:    bilinear 2x up -> conv3x3 + LReLU -> concat(skip) -> conv3x3 + LReLU
           widths 512->256->128->64->32
  head:    conv3x3(32->out), no activation (flows/residues are signed; the
           weight-map instance applies sigmoid outside, SURVEY.md App-A.5).

TPU-first design notes:
  * Pure functional: params are a nested dict pytree; ``unet_apply`` is a
    jit-traceable pure function. NHWC activations, HWIO weights so convs
    map straight onto the MXU without layout transposes.
  * ``compute_dtype=bfloat16`` runs every conv in bf16 (MXU native) while
    params stay float32; the caller keeps warp/blend math in fp32.
  * All shapes static; the whole cascade compiles to one fused XLA graph.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rrin_tpu.config import ModelConfig
from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear

Params = Dict[str, Any]


def _conv_init(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> Params:
    """PyTorch Conv2d-style default init (kaiming_uniform a=sqrt(5)).

    Matching the reference's init distribution keeps random-weight parity
    tests meaningful and makes from-scratch training behave like the paper's
    setup (SURVEY.md §3.4).
    """
    wkey, bkey = jax.random.split(key)
    fan_in = kh * kw * cin
    # kaiming_uniform(a=sqrt(5)): bound = gain*sqrt(3/fan_in) with
    # gain = sqrt(2/(1+a^2)) = sqrt(1/3)  =>  bound = 1/sqrt(fan_in).
    bound_w = float(1.0 / (fan_in**0.5))
    w = jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32, -bound_w, bound_w)
    bound_b = bound_w
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound_b, bound_b)
    return {"w": w, "b": b}


def _conv(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """conv + bias, no activation (head convs)."""
    from rrin_tpu.ops.conv_phase import conv2d_fused

    return conv2d_fused(x, p["w"], p["b"], None)


def _conv_act(x: jnp.ndarray, p: Params, slope: float) -> jnp.ndarray:
    """conv + bias + LeakyReLU, fused. Low-channel bf16 convs route to the
    phase-packed Pallas kernel (ops/conv_phase.py); everything else is the
    XLA conv (fp32 parity path uses HIGHEST-precision MXU passes)."""
    from rrin_tpu.ops.conv_phase import conv2d_fused

    return conv2d_fused(x, p["w"], p["b"], slope)


def unet_init(key: jax.Array, in_ch: int, out_ch: int, cfg: ModelConfig) -> Params:
    """Initialize one U-Net's parameter pytree."""
    w1, w2, w3, w4, w5 = cfg.widths
    keys = iter(jax.random.split(key, 19))
    k = cfg.down_kernels
    p: Params = {
        "conv1": _conv_init(next(keys), cfg.stem_kernel, cfg.stem_kernel, in_ch, w1),
        "conv2": _conv_init(next(keys), cfg.stem_kernel, cfg.stem_kernel, w1, w1),
        "down1": {
            "conv1": _conv_init(next(keys), k[0], k[0], w1, w2),
            "conv2": _conv_init(next(keys), k[0], k[0], w2, w2),
        },
        "down2": {
            "conv1": _conv_init(next(keys), k[1], k[1], w2, w3),
            "conv2": _conv_init(next(keys), k[1], k[1], w3, w3),
        },
        "down3": {
            "conv1": _conv_init(next(keys), k[2], k[2], w3, w4),
            "conv2": _conv_init(next(keys), k[2], k[2], w4, w4),
        },
        "down4": {
            "conv1": _conv_init(next(keys), k[3], k[3], w4, w5),
            "conv2": _conv_init(next(keys), k[3], k[3], w5, w5),
        },
        "up1": {
            "conv1": _conv_init(next(keys), 3, 3, w5, w4),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w4, w4),
        },
        "up2": {
            "conv1": _conv_init(next(keys), 3, 3, w4, w3),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w3, w3),
        },
        "up3": {
            "conv1": _conv_init(next(keys), 3, 3, w3, w2),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w2, w2),
        },
        "up4": {
            "conv1": _conv_init(next(keys), 3, 3, w2, w1),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w1, w1),
        },
        "conv3": _conv_init(next(keys), 3, 3, w1, out_ch),
    }
    return p


def _down(x: jnp.ndarray, p: Params, slope: float) -> jnp.ndarray:
    x = avg_pool_2x(x)
    x = _conv_act(x, p["conv1"], slope)
    x = _conv_act(x, p["conv2"], slope)
    return x


def _up(x: jnp.ndarray, skip: jnp.ndarray, p: Params, slope: float) -> jnp.ndarray:
    x = upsample_2x_bilinear(x)
    x = _conv_act(x, p["conv1"], slope)
    x = _conv_act(jnp.concatenate([x, skip], axis=-1), p["conv2"], slope)
    return x


def unet_apply(p: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Apply one U-Net. x: (B, H, W, in_ch), H and W divisible by 16."""
    s = cfg.leaky_slope
    x = _conv_act(x, p["conv1"], s)
    s1 = _conv_act(x, p["conv2"], s)
    s2 = _down(s1, p["down1"], s)
    s3 = _down(s2, p["down2"], s)
    s4 = _down(s3, p["down3"], s)
    x = _down(s4, p["down4"], s)
    x = _up(x, s4, p["up1"], s)
    x = _up(x, s3, p["up2"], s)
    x = _up(x, s2, p["up3"], s)
    x = _up(x, s1, p["up4"], s)
    return _conv(x, p["conv3"])


# Conv input(s) per site in the int8 packed path: which producer tensor's
# calibrated |x| max quantizes each conv operand ("in" = the U-Net input).
# Heads stay bf16 (flows/weights/residues need the precision; lout is tiny).
QUANT_SITES = {
    "c1": ("in",), "c2": ("c1",),
    "d1c1": ("c2",), "d1c2": ("d1c1",),
    "d2c1": ("d1c2",), "d2c2": ("d2c1",),
    "d3c1": ("d2c2",), "d3c2": ("d3c1",),
    "d4c1": ("d3c2",), "d4c2": ("d4c1",),
    "u1c1": ("d4c2",), "u1c2": ("u1c1", "d3c2"),
    "u2c1": ("u1c2",), "u2c2": ("u2c1", "d2c2"),
    "u3c1": ("u2c2",), "u3c2": ("u3c1", "d1c2"),
    "u4c1": ("u3c2",), "u4c2": ("u4c1", "c2"),
}


def unet_apply_stats(
    p: Params, x: jnp.ndarray, cfg: ModelConfig,
    quantile=None, ranges=None,
) -> tuple:
    """unet_apply + per-tensor |x| statistics for int8 calibration.

    Returns (out, stats): stats maps each conv-output name (plus "in") to
    an f32 scalar per tensor. Three recording modes:

    - default: |x| absmax — the calibrated quantization ranges the packed
      int8 path consumes (pool/upsample between sites are convex
      combinations, so a producer's absmax bounds every consumer);
    - ``quantile`` (scalar in (0, 1]): the q-quantile of |x| instead of
      the max — percentile clipping for trained weights whose outlier
      activations would otherwise stretch the grid (the clipped tail
      saturates; trade measured by the saturation mode below);
    - ``ranges`` (a stats tree from a previous pass, margin applied):
      record the SATURATION RATE instead — the fraction of |x| values
      strictly above each range, i.e. how much of this input the int8
      grid clips. Telemetry for validating a calibration against live
      traffic. Mutually exclusive with ``quantile``.
    """
    if quantile is not None and ranges is not None:
        raise ValueError("quantile and ranges are mutually exclusive")
    s = cfg.leaky_slope
    stats = {}

    def rec(name, t):
        a = jnp.abs(t)
        if ranges is not None:
            stats[name] = jnp.mean(
                (a > jnp.asarray(ranges[name], jnp.float32)).astype(
                    jnp.float32
                )
            )
        elif quantile is not None:
            stats[name] = jnp.quantile(
                a.astype(jnp.float32).ravel(), quantile
            ).astype(jnp.float32)
        else:
            stats[name] = jnp.max(a).astype(jnp.float32)
        return t

    rec("in", x)
    t = rec("c1", _conv_act(x, p["conv1"], s))
    s1 = rec("c2", _conv_act(t, p["conv2"], s))

    def down(name, t, prm):
        t = avg_pool_2x(t)
        t = rec(f"{name}c1", _conv_act(t, prm["conv1"], s))
        return rec(f"{name}c2", _conv_act(t, prm["conv2"], s))

    def up(name, t, skip, prm):
        t = upsample_2x_bilinear(t)
        t = rec(f"{name}c1", _conv_act(t, prm["conv1"], s))
        return rec(
            f"{name}c2",
            _conv_act(jnp.concatenate([t, skip], axis=-1), prm["conv2"], s),
        )

    s2 = down("d1", s1, p["down1"])
    s3 = down("d2", s2, p["down2"])
    s4 = down("d3", s3, p["down3"])
    t = down("d4", s4, p["down4"])
    t = up("u1", t, s4, p["up1"])
    t = up("u2", t, s3, p["up2"])
    t = up("u3", t, s2, p["up3"])
    t = up("u4", t, s1, p["up4"])
    return _conv(t, p["conv3"]), stats


# ---------------------------------------------------------------------------
# Packed-layout fast path (inference).
#
# Levels 0-2 of the U-Net run in the carried packed layout of
# ops/packed.py with the pad-free multi-input conv kernel of
# ops/conv_packed.py: P halves per level (4 -> 2 -> 1) so M (the sublane
# dim) is CONSTANT and pool/upsample are pure lane ops; skip concats are
# fused into the conv's contraction (dual-operand kernel) and never
# materialize. Levels 3-4 (C >= 256 at tiny widths) keep plain NHWC XLA
# convs. The only layout copies left per U-Net: the entry pack, the
# level-2<->3 boundary (slice + plain pool / plain upsample + pad), and
# the head unpack.
#
# Static offset plan (chosen so every conv's group shift
# s_i = (off_i - hh - off_out)/P is integer per operand; dual-operand
# convs need off_1 === off_2 (mod P)):
#
#   entry pack @1 -> conv1 ->2 -> conv2 ->3 (=s1) -> pool(d=1) -> @1
#   -> d1c1 ->1 -> d1c2 ->1 (=s2) -> pool(d=1) -> @0 (P=1, level 2)
#   -> d2c1 ->0 -> d2c2 ->0 (=s3)
#   [plain levels 3-4: down3, down4, up1]
#   up2: plain upsample -> pad-pack @0 -> c1 ->0 -> c2(+s3) ->0
#   up3: packed upsample -> @0 (P=2) -> c1 ->1 -> c2(+s2) ->0
#   up4: packed upsample -> @0 (P=4) -> c1 ->3 -> c2(+s1) ->2
#   head conv3 ->1 -> unpack
# ---------------------------------------------------------------------------

_PK = {
    "entry": 1, "c1": 2, "c2": 3, "d1c1": 1, "d1c2": 1,
    "l2": 0, "d2c1": 0, "d2c2": 0, "u2c1": 0, "u2c2": 0,
    "u3c1": 1, "u3c2": 0, "u4c1": 3, "u4c2": 2, "head": 1,
}

# Dense-entry toggle (A/B-able; env RRIN_DENSE_ENTRY=0 disables): pack
# the U-Net input at P=8/C=16 (offset 5) instead of P=4/C=32 — half the
# entry pad+copy+quantize bytes; conv1 runs at P=8 and re-emits the
# standard P=4 layout in-kernel. Requires cin <= 16 (all four RRIN
# U-Nets: 6/10/16/9); falls back per-call otherwise. Same math as the
# classic entry through conv2's output. Round-4 TPU A/B
# (benchmarks/AB_R4.json): ON wins 18.34 vs 17.95 fps 1080p int8
# (+2.2%) and 11.97 vs 11.48 bf16 (+4.3%) — default stays ON, measured.
# NOTE: read at trace time — flip it between jitted calls only with
# jax.clear_caches(), or via the env var in a fresh process (the A/B
# path).
DENSE_ENTRY = os.environ.get("RRIN_DENSE_ENTRY", "1") != "0"


def packed_supported(h: int, w: int, cfg: ModelConfig) -> bool:
    """Whether the packed fast path applies to these shapes + config."""
    from rrin_tpu.ops.conv_packed import min_h

    if (cfg.stem_kernel, cfg.down_kernels[0], cfg.base_width) != (7, 5, 32):
        return False  # the offset plan is solved for the App-B architecture
    return h % 16 == 0 and w % 16 == 0 and h // 2 >= min_h(cfg.stem_kernel)


def _packed_m0(w: int) -> int:
    # Storage must cover offset 3 + W at level 0 (P=4); the level-2
    # tensors reuse the same M as their (padded) width.
    return -(-(w + 6) // 4 // 8) * 8


# Scoped-VMEM bound for the BF16 packed kernels: their per-block windows
# scale with the group count m0, and above m0 ~ 800 (4K-class widths,
# w > ~3200) several sites exceed Mosaic's DEFAULT ~16 MB budget — which
# is exactly what the per-call budget request below exists to cover.
# int8 windows are half the bytes and fit at 4K under the default. One
# predicate shared by models/rrin.forward and pipeline.Interpolator so
# the prep decision and the forward gate can never disagree.
#
# The packed kernels request a PER-CALL-sized budget when their scratch
# exceeds the default (ops/conv_packed._compiler_params) — a blanket
# 100 MB request measured ~10% SLOWER at 1080p int8, so only 4K-class
# calls ask for more. Round-4 TPU A/B (benchmarks/AB_R4.json): with the
# per-call budgets, 4K bf16 packed compiles and runs 2.687 fps vs 1.173
# on the plain-path fallback (2.3x), so the default admits 4K widths
# (m0=968 at w=3840). The bound still exists as a safety valve for
# wider-than-4K frames nobody has measured; RRIN_BF16_M0_MAX overrides.
_BF16_PACKED_M0_MAX = int(os.environ.get("RRIN_BF16_M0_MAX", 1000))


def packed_bf16_supported(w: int) -> bool:
    """Whether the BF16 (non-int8) packed kernels fit scoped VMEM at
    this width (int8 is not bound by this — see _BF16_PACKED_M0_MAX)."""
    return _packed_m0(w) <= _BF16_PACKED_M0_MAX


def packed_branch_flags(h: int, w: int, cfg: ModelConfig):
    """The static branch configuration of unet_apply_packed at this shape:
    (l2_kernel, l3_kernel, fuse_d1, fuse_d2, fuse_u3, fuse_u4, l4_kernel,
    fuse_u2). Weight-side prep (models/rrin.prepare_packed_params) is only
    valid across shapes with IDENTICAL flags — they decide which sites
    exist, which carry int8, and which prep FORMAT (conv vs fused
    up/pool/up-m) a site's constants use."""
    from rrin_tpu.ops.conv_packed import (
        min_h,
        supports_pool,
        supports_up,
        supports_up_f,
        supports_up_m,
    )
    from rrin_tpu.ops.packed import PackedSpec

    m0 = _packed_m0(w)
    # Levels 2 and 3 pad their H to a multiple of 8 in-path (SAME zero-pad
    # semantics make the pad exact with re-zeroing between convs), so the
    # gate is only that the PADDED height fits the kernel window — this is
    # what keeps 720p/360p-class heights (h % 64 != 0) on the packed path.
    l2_kernel = -(-(h // 4) // 8) * 8 >= min_h(3)
    l3_kernel = -(-(h // 8) // 8) * 8 >= min_h(3)
    k_d = cfg.down_kernels
    w1c, w2c, w3c, w4c, w5c = cfg.widths
    fuse_d1 = supports_pool(
        PackedSpec(p=4, c=w1c, w=w, off=_PK["c2"], m=m0), k_d[0], w2c, h
    )
    fuse_d2 = supports_pool(
        PackedSpec(p=2, c=w2c, w=w // 2, off=_PK["d1c2"], m=m0),
        k_d[1], w3c, h // 2,
    )
    # Fused-upsample routing at u3c1/u4c1 (their input specs are fixed by
    # the offset plan). TRI-STATE: 0 = materialized, 1 = row-construction
    # kernel (conv_up_packed), 2 = phase-folded kernel (conv_up_f_packed,
    # preferred — no W-expansion VPU work). The value is part of the
    # flags tuple because each routes a DIFFERENT prep format.
    u3_spec = PackedSpec(p=1, c=w3c, w=w // 4, off=_PK["u2c2"], m=m0)
    u4_spec = PackedSpec(p=2, c=w2c, w=w // 2, off=_PK["u3c2"], m=m0)
    fuse_u3 = (
        2 if supports_up_f(u3_spec, 3, w2c, h // 4, _PK["u3c1"])
        else 1 if supports_up(u3_spec, 3, w2c, 2 * (h // 4)) else 0
    )
    fuse_u4 = (
        2 if supports_up_f(u4_spec, 3, w1c, h // 2, _PK["u4c1"])
        else 1 if supports_up(u4_spec, 3, w1c, 2 * (h // 2)) else 0
    )
    # Level-4 packed-kernel branch (inside l3): H/16 padded to /8 must fit
    # the conv window (models/unet.unet_apply_packed level-4 block).
    k4 = k_d[3]
    hp4 = -(-(h // 16) // 8) * 8
    l4_kernel = (
        l3_kernel and hp4 >= min_h(k4) and k4 % 2 == 1
        and max(w4c, w5c) <= 4 * 128
    )
    # M-doubling fused upsample at the l3->l2 re-entry (u2c1): input is
    # the u1c2 output in (P=1, m3) geometry; output (P=1, m0). Routable
    # only when the TRUE heights line up (h2 % 8 == 0 keeps hp2 == h2).
    m3 = -(-(w // 8) // 8) * 8
    fuse_u2 = (
        l2_kernel
        and l3_kernel
        and supports_up_m(
            PackedSpec(p=1, c=w4c, w=w // 8, off=0, m=m3),
            3, w3c, h // 8, m0, _PK["u2c1"],
        )
    )
    return (l2_kernel, l3_kernel, fuse_d1, fuse_d2, fuse_u3, fuse_u4,
            l4_kernel, fuse_u2)


def unet_apply_packed(
    p: Params,
    x: jnp.ndarray,
    cfg: ModelConfig,
    absmax: Optional[Dict[str, jnp.ndarray]] = None,
    prep: Optional[Dict[str, dict]] = None,
    collect: Optional[Dict[str, dict]] = None,
) -> jnp.ndarray:
    """unet_apply in the carried packed layout (inference fast path).

    Numerically equivalent to :func:`unet_apply` up to conv accumulation
    order (tests/test_unet_packed.py). Inference-only: the packed conv has
    no VJP — training uses the plain path.

    ``prep``: per-site weight-side constants from a prior ``collect``
    run (see models/rrin.prepare_packed_params) — every conv then skips
    rebuilding its B2/bias/scale tensors inside the jitted frame.
    ``collect``: a dict to RECORD those constants into (site -> prep).

    ``absmax``: optional calibration stats from :func:`unet_apply_stats`
    (producer-tensor name -> |x| max). When given, every conv that runs a
    packed kernel quantizes its operands to symmetric int8 per
    ``QUANT_SITES`` and contracts int8 x int8 -> int32 on the MXU; the
    head conv and any plain-XLA fallback level stay in ``x.dtype``.
    """
    from rrin_tpu.ops.conv_packed import (
        conv_packed,
        conv_pool_packed,
        conv_up_f_packed,
        conv_up_m_packed,
        conv_up_packed,
        min_h,
        supports_pool,
        supports_up,
        supports_up_f,
    )
    from rrin_tpu.ops.packed import (
        PackedSpec,
        avg_pool_2x_packed,
        pack,
        unpack,
        upsample_2x_packed,
    )
    from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear

    s = cfg.leaky_slope
    b, h, w, cin = x.shape
    assert packed_supported(h, w, cfg)
    m0 = _packed_m0(w)
    # Levels 2 and 3 run the P=1 kernel only when their H is still
    # kernel-shaped; otherwise those convs stay plain XLA (same math).
    (l2_kernel, l3_kernel, fuse_d1, fuse_d2, _fu3, _fu4,
     _l4, fuse_u2) = packed_branch_flags(h, w, cfg)
    m3 = -(-(w // 8) // 8) * 8

    dt = x.dtype

    def amax_for(site):
        if absmax is None or site not in QUANT_SITES:
            return None
        return tuple(absmax[n] for n in QUANT_SITES[site])

    def _pc(site):
        """(prepared, collect) plumbing for one conv site."""
        pr = prep.get(site) if prep is not None else None
        co = (collect, site) if collect is not None else None
        return pr, co

    # int8 carry plan: a conv's output stays ON its own int8 grid (the
    # kernel epilogue emits int8 directly — no separate quantize pass, half
    # the HBM bytes) when every consumer reads it straight into a packed
    # kernel: direct conv1->conv2 chains, fused-upsample conv inputs, and
    # fused-pool conv inputs (whose window DMA then moves half the bytes).
    # Sites feeding a MATERIALIZED pool/upsample stay float: XLA cannot
    # fuse the int8->f32->round pipeline through those reshape/slice
    # chains, and the full-resolution f32 intermediates cost more than the
    # saved quantize pass (measured on TPU: +12 ms/frame at 1080p).
    _CARRY = {
        "c1", "d1c1", "d2c1", "d3c1", "d4c1", "u1c1",
        "u2c1", "u2c2", "u3c1", "u3c2", "u4c1",
    }
    if fuse_d1:
        _CARRY.add("c2")
    if fuse_d2 and l2_kernel:
        _CARRY.add("d1c2")
    if fuse_u2:
        # u1c2's only consumer is the M-doubling fused up kernel, which
        # reads the half-res window directly — int8 halves its DMA bytes.
        _CARRY.add("u1c2")

    def out_q(site):
        if absmax is None or site not in _CARRY:
            return None
        return absmax[site]

    def _rq(t):
        """Re-round a carried-int8 tensor after a convex f32 combo."""
        return jnp.clip(jnp.round(t), -127.0, 127.0).astype(jnp.int8)

    def conv(parts, prm, off_out, slope=s, site=None, **kw):
        am = amax_for(site)
        pr, co = _pc(site)
        return conv_packed(parts, prm["w"], prm["b"], off_out, slope,
                           in_absmax=am, out_absmax=out_q(site),
                           out_dtype=dt, prepared=pr, collect=co, **kw)

    def conv_up(t, ts, real_c, prm, off_out, site):
        """2x upsample + conv1 of an up stage: phase-folded kernel when
        the site qualifies, else the row-construction fused kernel (both
        never materialize the doubled tensor — see ops/conv_packed.py),
        else packed upsample + packed conv."""
        am = amax_for(site)
        pr, co = _pc(site)
        if supports_up_f(ts, prm["w"].shape[0], prm["w"].shape[3],
                         t.shape[1], off_out) and ts.c == real_c:
            return conv_up_f_packed(t, ts, real_c, prm["w"], prm["b"],
                                    off_out, s,
                                    in_absmax=None if am is None else am[0],
                                    out_absmax=out_q(site), out_dtype=dt,
                                    prepared=pr, collect=co)
        if supports_up(ts, prm["w"].shape[0], prm["w"].shape[3],
                       2 * t.shape[1]) and ts.c == real_c:
            return conv_up_packed(t, ts, real_c, prm["w"], prm["b"],
                                  off_out, s,
                                  in_absmax=None if am is None else am[0],
                                  out_absmax=out_q(site), out_dtype=dt,
                                  prepared=pr, collect=co)
        if t.dtype == jnp.int8:
            tu, tus = upsample_2x_packed(t.astype(jnp.float32), ts)
            tu = _rq(tu)
        else:
            tu, tus = upsample_2x_packed(t, ts)
        return conv_packed([(tu, tus, real_c)], prm["w"], prm["b"],
                           off_out, s, in_absmax=am,
                           out_absmax=out_q(site), out_dtype=dt,
                           prepared=pr, collect=co)

    def conv_pool(t, ts, real_c, prm, off_out, site):
        """2x avg-pool + conv1 of a down stage, fused in-kernel."""
        am = amax_for(site)
        pr, co = _pc(site)
        return conv_pool_packed(t, ts, real_c, prm["w"], prm["b"], off_out,
                                s, in_absmax=None if am is None else am[0],
                                out_absmax=out_q(site), out_dtype=dt,
                                prepared=pr, collect=co)

    def pool_p(t, ts):
        """Packed 2x avg-pool, staying on a carried int8 grid if given one."""
        if t.dtype == jnp.int8:
            y, ys = avg_pool_2x_packed(t.astype(jnp.float32), ts)
            return _rq(y), ys
        return avg_pool_2x_packed(t, ts)

    def pool_n(t):
        # Both pool_n's and up_n's int8 branches are DEFENSIVE: no carried
        # -int8 tensor currently reaches a MATERIALIZED resample (d4c2 is
        # never in _CARRY, and u1c2 only joins it under fuse_u2, where its
        # sole consumer is the M-doubling kernel's direct window read —
        # routing int8 through materialized pools/upsamples measured
        # +12 ms/frame, see the _CARRY note). Kept so a future carry-plan
        # change degrades gracefully.
        if t.dtype == jnp.int8:
            return _rq(avg_pool_2x(t.astype(jnp.float32)))
        return avg_pool_2x(t)

    def up_n(t):
        if t.dtype == jnp.int8:
            return _rq(upsample_2x_bilinear(t.astype(jnp.float32)))
        return upsample_2x_bilinear(t)

    # Stem + down1: P=4 (P=8 dense entry) then P=2, packed end-to-end.
    # (Measured dead end: quantizing x BEFORE this pack — so the pack
    # writes int8 once — dropped 1080p int8 16.0 -> 14.1 fps on TPU. The
    # int8 NHWC intermediate takes XLA's (32,128)-tiled layout with a
    # tiny channel minor dim, costing more than the saved bf16 pass.
    # Keep quantize on the packed tensor, kernel-side.)
    if DENSE_ENTRY and cin <= 16:
        # Dense entry: pack at P=8/C=16 — HALF the entry pad+copy (and
        # int8 quantize) bytes of the P=4/C=32 pack, and a denser stem B2
        # (fewer, deeper dots: 2x128x256 vs 3x128x128 blocks per dy). The
        # conv1 contraction runs in the P=8 geometry and re-emits the
        # standard P=4/C=32 layout via the in-kernel sublane interleave
        # (m_double); conv2 trims M back to the plan's m0, so everything
        # from s1 on is byte-identical to the classic entry. Offset 5
        # keeps conv1's group shift integral: (5 - 3 - _PK[c1]) % 8 == 0.
        m_e = -(-m0 // 16) * 8
        xp, sp = pack(x, 8, 5, m_e, c_pad=16)
        xp, sp = conv([(xp, sp, cin)], p["conv1"], _PK["c1"], site="c1",
                      m_double=True)
        s1, s1s = conv([(xp, sp, 32)], p["conv2"], _PK["c2"], site="c2",
                       m_out=None if sp.m == m0 else m0)
    else:
        xp, sp = pack(x, 4, _PK["entry"], m0, c_pad=32)
        xp, sp = conv([(xp, sp, cin)], p["conv1"], _PK["c1"], site="c1")
        s1, s1s = conv([(xp, sp, 32)], p["conv2"], _PK["c2"], site="c2")
    if fuse_d1:
        t, ts = conv_pool(s1, s1s, 32, p["down1"]["conv1"], _PK["d1c1"],
                          "d1c1")
    else:
        t, ts = pool_p(s1, s1s)
        t, ts = conv([(t, ts, 32)], p["down1"]["conv1"], _PK["d1c1"],
                     site="d1c1")
    s2, s2s = conv([(t, ts, 64)], p["down1"]["conv2"], _PK["d1c2"],
                   site="d1c2")

    h2 = h // 4
    hp2 = -(-h2 // 8) * 8

    def _rz2(t):
        """Re-zero the level-2 H-pad rows a conv's bias+LReLU polluted."""
        if hp2 > h2:
            return jnp.concatenate(
                [t[:, :h2], jnp.zeros_like(t[:, h2:])], axis=1
            )
        return t

    if l2_kernel:
        if fuse_d2:  # aligned-only (the fused pool emits unpadded H)
            t, ts = conv_pool(s2, s2s, 64, p["down2"]["conv1"],
                              _PK["d2c1"], "d2c1")
        else:
            t, ts = pool_p(s2, s2s)
            if hp2 > h2:
                t = jnp.pad(t, ((0, 0), (0, hp2 - h2), (0, 0), (0, 0)))
            t, ts = conv([(t, ts, 64)], p["down2"]["conv1"], _PK["d2c1"],
                         site="d2c1")
            t = _rz2(t)
        s3, s3s = conv([(t, ts, 128)], p["down2"]["conv2"], _PK["d2c2"],
                       site="d2c2")
        s3 = _rz2(s3)
        s3n = unpack(s3, s3s)[:, :h2]
    else:
        t, ts = pool_p(s2, s2s)  # level 2, P=1, off 0
        xn = unpack(t, ts)
        xn = _conv_act(xn, p["down2"]["conv1"], s)
        s3n = _conv_act(xn, p["down2"]["conv2"], s)
        s3, s3s = pack(s3n, 1, _PK["l2"], m0)

    # Level 3 (C=256): P=1 kernel with H padded to a multiple of 8
    # (exact SAME semantics: pad rows are re-zeroed after each conv so the
    # true bottom edge always sees zero padding), else plain.
    h3 = h // 8
    hp3 = -(-h3 // 8) * 8

    def _rz3(t):
        """Re-zero the H-pad rows a conv's bias+LReLU polluted."""
        if hp3 > h3:
            return jnp.concatenate(
                [t[:, :h3], jnp.zeros_like(t[:, h3:])], axis=1
            )
        return t

    if l3_kernel:
        x3 = pool_n(s3n)
        if hp3 > h3:
            x3 = jnp.pad(x3, ((0, 0), (0, hp3 - h3), (0, 0), (0, 0)))
        t3, t3s = pack(x3, 1, 0, m3)
        t3, t3s = conv([(t3, t3s, 128)], p["down3"]["conv1"], 0,
                       site="d3c1")
        t3 = _rz3(t3)
        s4p, s4s = conv([(t3, t3s, 256)], p["down3"]["conv2"], 0,
                        site="d3c2")
        s4p = _rz3(s4p)
        s4n = unpack(s4p, s4s)[:, :h3]
        # Level 4 (C=512, H/16): P=1 packed kernel with H padded to a
        # multiple of 8 (SAME zero-pad semantics make the pad exact) —
        # XLA ran these convs in a T(2,128) layout with an unfused
        # bias+LeakyReLU pass worth several ms/frame at 1080p.
        x4 = pool_n(s4n)
        h4, w4 = x4.shape[1], x4.shape[2]
        hp4 = -(-h4 // 8) * 8
        m4 = -(-w4 // 8) * 8
        k4 = cfg.down_kernels[3]
        w4c, w5c = cfg.widths[3], cfg.widths[4]
        if (hp4 >= min_h(k4) and k4 % 2 == 1
                and max(w4c, w5c) <= 4 * 128):
            if hp4 > h4:
                x4 = jnp.pad(x4, ((0, 0), (0, hp4 - h4), (0, 0), (0, 0)))
            t4, t4s = pack(x4, 1, 0, m4)
            t4, t4s = conv([(t4, t4s, w4c)], p["down4"]["conv1"], 0,
                           site="d4c1")
            if hp4 > h4:
                # conv1's bias+LReLU left nonzeros in the H-pad rows;
                # re-zero so conv2's bottom edge sees SAME zero padding.
                t4 = jnp.concatenate(
                    [t4[:, :h4], jnp.zeros_like(t4[:, h4:])], axis=1
                )
            t4, t4s = conv([(t4, t4s, w5c)], p["down4"]["conv2"], 0,
                           site="d4c2")
            xn = unpack(t4, t4s)[:, :h4]
        else:
            xn = _conv_act(x4, p["down4"]["conv1"], s)
            xn = _conv_act(xn, p["down4"]["conv2"], s)
        xu3 = up_n(xn)
        if hp3 > h3:
            xu3 = jnp.pad(xu3, ((0, 0), (0, hp3 - h3), (0, 0), (0, 0)))
        t3, t3s = pack(xu3, 1, 0, m3)
        t3, t3s = conv([(t3, t3s, 512)], p["up1"]["conv1"], 0,
                       site="u1c1")
        t3 = _rz3(t3)
        t3, t3s = conv(
            [(t3, t3s, 256), (s4p, s4s, 256)], p["up1"]["conv2"], 0,
            site="u1c2",
        )
        xn = None if fuse_u2 else unpack(t3, t3s)[:, :h3]
    else:
        s4 = _down(s3n, p["down3"], s)
        xn = _down(s4, p["down4"], s)
        xn = _up(xn, s4, p["up1"], s)

    # up2 (level 2): the l3->l2 re-entry. With fuse_u2 the M-doubling
    # fused upsample+conv consumes the u1c2 output PACKED (m3 geometry,
    # carried int8) and the doubled tensor never materializes; otherwise
    # plain upsample, then packed convs with fused concat.
    if fuse_u2:
        am = amax_for("u2c1")
        pr, co = _pc("u2c1")
        t, ts = conv_up_m_packed(
            t3, t3s, 256, p["up2"]["conv1"]["w"], p["up2"]["conv1"]["b"],
            m0, _PK["u2c1"], h3, s,
            in_absmax=None if am is None else am[0],
            out_absmax=out_q("u2c1"), out_dtype=dt, prepared=pr,
            collect=co,
        )
        # fuse_u2 gates h2 % 8 == 0, so hp2 == h2: no re-zero needed.
        t, ts = conv(
            [(t, ts, 128), (s3, s3s, 128)], p["up2"]["conv2"],
            _PK["u2c2"], site="u2c2",
        )
    elif l2_kernel:
        xu = up_n(xn)
        if hp2 > h2:
            xu = jnp.pad(xu, ((0, 0), (0, hp2 - h2), (0, 0), (0, 0)))
        t, ts = pack(xu, 1, _PK["l2"], m0)
        t, ts = conv([(t, ts, 256)], p["up2"]["conv1"], _PK["u2c1"],
                     site="u2c1")
        t = _rz2(t)
        t, ts = conv(
            [(t, ts, 128), (s3, s3s, 128)], p["up2"]["conv2"],
            _PK["u2c2"], site="u2c2",
        )
        t = t[:, :h2]  # back to the true level-2 height for u3c1
    else:
        xu = up_n(xn)
        xn = _conv_act(xu, p["up2"]["conv1"], s)
        xn = _conv_act(
            jnp.concatenate([xn, s3n], axis=-1), p["up2"]["conv2"], s
        )
        t, ts = pack(xn, 1, _PK["l2"], m0)

    # up3 (level 1, P=2): fused upsample+conv, M constant.
    t, ts = conv_up(t, ts, 128, p["up3"]["conv1"], _PK["u3c1"], "u3c1")
    t, ts = conv(
        [(t, ts, 64), (s2, s2s, 64)], p["up3"]["conv2"], _PK["u3c2"],
        site="u3c2",
    )

    # up4 (level 0, P=4).
    t, ts = conv_up(t, ts, 64, p["up4"]["conv1"], _PK["u4c1"], "u4c1")
    t, ts = conv(
        [(t, ts, 32), (s1, s1s, 32)], p["up4"]["conv2"], _PK["u4c2"],
        site="u4c2",
    )

    t, ts = conv([(t, ts, 32)], p["conv3"], _PK["head"], slope=None,
                 site="head")
    return unpack(t, ts)
