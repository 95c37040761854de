"""The RRIN cascade: Net.forward(I0, I1, t) -> It (SURVEY.md §3.1, App-A).

Four U-Nets in a fixed dataflow, compiled by XLA as ONE fused graph:

  1. flow:   (F01, F10)      = UNet1(I0 ∥ I1)                       6 -> 4
  2. time projection (linear-motion, quadratic in t):
         Ft0 = -(1-t)·t·F01 + t²·F10
         Ft1 =  (1-t)²·F01 − t·(1-t)·F10
  3. refine: (ΔFt0, ΔFt1)    = UNet2(Ft0 ∥ Ft1 ∥ I0 ∥ I1)          10 -> 4
  4. warp:   g0 = warp(I0, Ft0); g1 = warp(I1, Ft1)   [backward bilinear]
  5. mask:   M = σ(UNet3(Ft0 ∥ Ft1 ∥ I0 ∥ I1 ∥ g0 ∥ g1))           16 -> 2
         w0 = (1-t)·M0, w1 = t·M1
         Î  = (w0·g0 + w1·g1) / (w0 + w1 + ε)
  6. final:  It = clamp(Î + UNet4(I0 ∥ I1 ∥ Î), 0, 1)               9 -> 3

TPU-first: NHWC, bf16 conv compute / fp32 warp+blend, static shapes, ``t``
is a traced scalar (one compiled graph serves every t, enabling the 2^k
recursive cascade to reuse a single executable, BASELINE.json config 4).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.unet import unet_apply, unet_init
from rrin_tpu.ops.warp import warp_pair

Params = Dict[str, Any]

# (in_ch, out_ch) signatures of the four cascade stages (SURVEY.md §2.1 row 2).
# Warp gather variant on the bf16/int8 compute paths: the byte-packed
# single-plane kernel (pairs="u8") halves the pairs variant's gathers and
# window DMA and is EXACT for u8-decoded frames (ops/warp_pallas.py,
# _warp_kernel_u8). Default ON per the round-4 TPU A/B
# (benchmarks/AB_R4.json: 1080p int8 18.34 -> 18.60 fps, 1080p bf16
# 11.97 -> 12.16, 720p int8 42.79 -> 43.61; vimeo-b8 neutral within
# jitter). RRIN_WARP_U8=0 reverts to the channel-paired bf16 variant
# (read at import — flipping it mid-process does not retrace
# already-compiled forwards).
_WARP_U8 = os.environ.get("RRIN_WARP_U8", "1") == "1"

# Planar-blend glue experiment (default OFF until its TPU A/B lands): the
# Pallas warps return (B, C, H, W) planes — skipping their output
# transposes — and the blend runs planar; `coarse` transposes back once.
# Exact same math (pure layout); only active on the use_pallas path.
_PLANAR_BLEND = os.environ.get("RRIN_PLANAR_BLEND", "0") == "1"

# Entry-operand grouping (models/rrin._cascade step 3): carry I0 ∥ I1 and
# the refined Ft0 ∥ Ft1 as single tensors so no U-Net entry concatenates
# more than 4 operands — XLA fuses those into the entry's clamp_convert
# pass, where the mask entry's 6-operand concat materialized (~0.5 ms/
# frame at 1080p int8). Bit-identical math (pure regrouping of the same
# values). RRIN_ENTRY_GROUPS=0 reverts (A/B valve, read at import).
_ENTRY_GROUPS = os.environ.get("RRIN_ENTRY_GROUPS", "1") == "1"


def _warp_pairs_mode(cd):
    if cd != jnp.bfloat16:
        return False
    return "u8" if _WARP_U8 else True


UNET_SIGNATURES = {
    "flow": (6, 4),
    "refine": (10, 4),
    "mask": (16, 2),
    "final": (9, 3),
}


def init_params(key: jax.Array, cfg: ModelConfig = ModelConfig()) -> Params:
    """Random-init the full cascade parameter pytree (32.0M params /
    ~128 MB fp32 — four ~8M-param U-Nets)."""
    keys = jax.random.split(key, 4)
    return {
        name: unet_init(k, cin, cout, cfg)
        for (name, (cin, cout)), k in zip(UNET_SIGNATURES.items(), keys)
    }


def _as_t(t: Union[float, jnp.ndarray], batch: int) -> jnp.ndarray:
    """Broadcast t (scalar or per-example (B,)) to (B, 1, 1, 1) fp32."""
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (batch,))
    return t.reshape(-1, 1, 1, 1)


def _cascade(
    run_unet,
    i0f: jnp.ndarray,
    i1f: jnp.ndarray,
    tb: jnp.ndarray,
    cfg: ModelConfig,
    use_pallas: bool,
    pairs: bool,
    flows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The shared 4-UNet dataflow (SURVEY.md App-A); ``run_unet(name,
    *feats)`` applies one U-Net to the channel-concat of ``feats``."""
    # 1. coarse bidirectional flow. This U-Net is the only t-INDEPENDENT
    # stage of the cascade: for m output times of one frame pair its
    # output is identical, so multi-frame callers (pipeline._step_body
    # direct/times modes with m > 1) compute it once per pair via
    # ``flows_only`` and pass the repeated result in here — ~1/4 of the
    # U-Net compute and one entry pack per extra time step saved. Same
    # math: bit-identical outputs in f32/int8; in bf16 XLA may re-block
    # the batch-B flow U-Net differently from batch-B*m, an ulp-level
    # reassociation (<=1 u8 step on isolated rounding-boundary pixels —
    # tests/test_flow_shared.py).
    if flows is None:
        flows = run_unet("flow", i0f, i1f)
    f01, f10 = flows[..., :2], flows[..., 2:]

    # 2. flow-to-time projection (fp32)
    ft0 = -(1.0 - tb) * tb * f01 + tb * tb * f10
    ft1 = (1.0 - tb) * (1.0 - tb) * f01 - tb * (1.0 - tb) * f10

    # 3. residual flow refinement. Entry-operand grouping (glue-level,
    # bit-identical): XLA fuses a <=4-operand entry's concat+pad+quantize
    # into one clamp_convert pass but MATERIALIZES the mask entry's
    # 6-operand concat (~0.5 ms/frame at 1080p int8 — docs/PERFORMANCE.md
    # budget table). Carrying I0 ∥ I1 and the refined Ft0 ∥ Ft1 as single
    # tensors keeps every entry at <=4 operands; the values are the exact
    # same elementwise adds and the warp consumes bitwise-equal slices.
    # RRIN_ENTRY_GROUPS=0 reverts to per-tensor operands (A/B valve).
    if _ENTRY_GROUPS:
        i01 = jnp.concatenate([i0f, i1f], axis=-1)
        res = run_unet("refine", ft0, ft1, i01)
        ftc = jnp.concatenate([ft0, ft1], axis=-1) + res
        ft0, ft1 = ftc[..., :2], ftc[..., 2:]
    else:
        res = run_unet("refine", ft0, ft1, i0f, i1f)
        ft0 = ft0 + res[..., :2]
        ft1 = ft1 + res[..., 2:]

    # 4. backward bilinear warp of both frames (fp32 accumulation; the
    # bf16 compute path uses the channel-paired gather variant — 2/3 the
    # gathers and window bytes at bf16-input-rounding quality cost)
    planar = use_pallas and _PLANAR_BLEND
    g0, g1 = warp_pair(
        i0f, i1f, ft0, ft1, align_corners=cfg.align_corners,
        use_pallas=use_pallas, pairs=pairs, planar_out=planar,
    )

    # 5. adaptive weight map + normalized blend (fp32). Under
    # RRIN_PLANAR_BLEND the Pallas warps return (B, C, H, W) planes (no
    # output transpose — the kernel computes in planes) and the blend
    # runs planar; only `coarse` transposes back to NHWC for the final
    # entry/residual. Same math either way (pure data layout).
    if planar:
        g0n, g1n = jnp.moveaxis(g0, 1, -1), jnp.moveaxis(g1, 1, -1)
    else:
        g0n, g1n = g0, g1
    if _ENTRY_GROUPS:
        m = jax.nn.sigmoid(run_unet("mask", ftc, i01, g0n, g1n))
    else:
        m = jax.nn.sigmoid(run_unet("mask", ft0, ft1, i0f, i1f, g0n, g1n))
    if planar:
        w0 = jnp.moveaxis((1.0 - tb) * m[..., 0:1], -1, 1)  # (B,1,H,W)
        w1 = jnp.moveaxis(tb * m[..., 1:2], -1, 1)
        coarse = jnp.moveaxis(
            (w0 * g0 + w1 * g1) / (w0 + w1 + cfg.blend_eps), 1, -1)
    else:
        w0 = (1.0 - tb) * m[..., 0:1]
        w1 = tb * m[..., 1:2]
        coarse = (w0 * g0 + w1 * g1) / (w0 + w1 + cfg.blend_eps)

    # 6. residue refinement
    if _ENTRY_GROUPS:
        out = coarse + run_unet("final", i01, coarse)
    else:
        out = coarse + run_unet("final", i0f, i1f, coarse)
    return jnp.clip(out, 0.0, 1.0)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "compute_dtype", "use_pallas", "remat", "packed",
        "flows_only",
    ),
)
def _forward_jit(
    params: Params,
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    t: Union[float, jnp.ndarray] = 0.5,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    remat: bool = False,
    packed: bool = False,
    quant_stats: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
    packed_params: Optional[Dict[str, Dict[str, dict]]] = None,
    flows: Optional[jnp.ndarray] = None,
    flows_only: bool = False,
) -> jnp.ndarray:
    """Interpolate the frame at time t between i0 and i1.

    Args:
      params: pytree from :func:`init_params` (or the torch converter).
      i0, i1: (B, H, W, 3) float frames in [0, 1]; H, W divisible by 16
        (use ops.pad.pad_to_multiple at the pipeline layer).
      t: scalar or (B,) interpolation time(s) in (0, 1). Traced, not static.
      compute_dtype: dtype for the U-Net convs (bfloat16 on TPU for the MXU
        fast path); warp, time-projection and blend stay float32.
      use_pallas: route the double warp through the Pallas kernel.
      remat: rematerialize each U-Net under autodiff (jax.checkpoint) —
        trades FLOPs for activation memory so large training crops fit HBM.
      packed: run the U-Nets in the carried packed layout
        (models/unet.unet_apply_packed) — the inference fast path that
        removes the per-kernel layout round-trips. INFERENCE ONLY (the
        packed conv has no VJP); silently falls back to the plain path
        when the shape/config does not support it.
      quant_stats: calibration stats from :func:`forward_calibrate`
        (per-UNet activation |x| maxima). Requires ``packed``; every
        packed-kernel conv then runs int8 x int8 -> int32 on the MXU
        (~1.7x the bf16 MXU rate on v5e, half the window DMA bytes).
        Quality bar: >35 dB PSNR vs the fp32 output (tests/test_int8.py).
      packed_params: per-UNet weight-side kernel constants from
        :func:`prepare_packed_params` — skips rebuilding B2/bias/scale
        tensors inside the jitted frame (prepare once, serve many).
      flows: optional precomputed coarse flow-UNet output (B, H, W, 4)
        from a ``flows_only=True`` call on the SAME (i0, i1) — skips the
        (t-independent) flow U-Net so one pair interpolated at m times
        pays it once (pipeline._step_body). Same math as recomputing
        (see the _cascade step-1 note on bf16 ulp reassociation).
      flows_only: run ONLY the t-independent flow U-Net and return its
        (B, H, W, 4) float32 output instead of the interpolated frame.

    Returns (B, H, W, 3) float32 frame in [0, 1] (or flows, see above).
    """
    if i0.shape[-3] % cfg.pad_multiple or i0.shape[-2] % cfg.pad_multiple:
        raise ValueError(
            f"H and W must be multiples of {cfg.pad_multiple}, got "
            f"{i0.shape[-3]}x{i0.shape[-2]}; pad with "
            "rrin_tpu.ops.pad_to_multiple (the video pipeline does this "
            "automatically)."
        )
    b = i0.shape[0]
    tb = _as_t(t, b)
    f32 = jnp.float32
    i0f = i0.astype(f32)
    i1f = i1.astype(f32)
    cd = compute_dtype

    from rrin_tpu.models.unet import packed_supported, unet_apply_packed

    if packed and remat:
        raise ValueError("packed=True is inference-only (no remat/VJP)")
    use_packed = packed and packed_supported(i0.shape[-3], i0.shape[-2], cfg)
    if use_packed and quant_stats is None:
        from rrin_tpu.models.unet import packed_bf16_supported

        # Scoped-VMEM bound (see unet.packed_bf16_supported): the per-call
        # Mosaic VMEM budgets admit 4K bf16 packed (2.3x the plain path,
        # benchmarks/AB_R4.json); only wider-than-4K bf16 frames fall back
        # to the plain path here. int8 windows are half the bytes and are
        # never bound by this.
        use_packed = packed_bf16_supported(i0.shape[-2])
    if quant_stats is not None and not use_packed:
        raise ValueError(
            "quant_stats (int8) requires the packed fast path — pass "
            "packed=True on a supported shape/config"
        )
    base_fn = unet_apply_packed if use_packed else unet_apply
    apply_fn = (
        jax.checkpoint(base_fn, static_argnums=(2,)) if remat else base_fn
    )

    prep = packed_params if use_packed else None
    if isinstance(prep, PackedParams):
        from rrin_tpu.models.unet import packed_branch_flags

        if packed_branch_flags(
            prep.hw[0], prep.hw[1], cfg
        ) != packed_branch_flags(i0.shape[-3], i0.shape[-2], cfg):
            raise ValueError(
                f"packed_params were prepared for shape {prep.hw}, whose "
                f"kernel-branch configuration differs from "
                f"{i0.shape[-3]}x{i0.shape[-2]} — re-run "
                "prepare_packed_params with hw matching the serving shape"
            )
        if (quant_stats is None) != (prep.quant_fp is None):
            raise ValueError(
                "packed_params/quant_stats mismatch: prep was built "
                + ("WITH" if prep.quant_fp else "WITHOUT")
                + " int8 calibration but forward was called "
                + ("without" if prep.quant_fp else "with")
                + " quant_stats — the int8 scales folded into the prep "
                "must match the runtime grids; re-run "
                "prepare_packed_params with the serving quant_stats"
            )
        # (Value-level fingerprint comparison happens in the eager
        # ``forward`` wrapper — inside jit the stats are tracers.)
        prep = prep.tree

    def run_unet(name: str, *feats: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([f.astype(cd) for f in feats], axis=-1)
        if quant_stats is not None or prep is not None:
            return apply_fn(
                params[name], x, cfg,
                quant_stats[name] if quant_stats is not None else None,
                prep[name] if prep is not None else None,
            ).astype(f32)
        return apply_fn(params[name], x, cfg).astype(f32)

    if flows_only:
        return run_unet("flow", i0f, i1f)
    return _cascade(
        run_unet, i0f, i1f, tb, cfg, use_pallas, pairs=_warp_pairs_mode(cd),
        flows=None if flows is None else flows.astype(f32),
    )


def forward(
    params: Params,
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    t: Union[float, jnp.ndarray] = 0.5,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    remat: bool = False,
    packed: bool = False,
    quant_stats: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
    packed_params: Optional[Dict[str, Dict[str, dict]]] = None,
    flows: Optional[jnp.ndarray] = None,
    flows_only: bool = False,
) -> jnp.ndarray:
    """See :func:`_forward_jit` (this is a thin eager wrapper around it).

    The wrapper exists for ONE check that cannot live inside jit: when
    ``packed_params`` carries a calibration fingerprint and the passed
    ``quant_stats`` are concrete arrays, their value hash must match the
    one baked into the prep — a same-shape call with different stats would
    otherwise be a silent jit-cache hit serving inconsistent int8 scales.
    """
    if (
        isinstance(packed_params, PackedParams)
        and packed_params.quant_fp not in (None, "unverified")
        and quant_stats is not None
    ):
        fp = _stats_fingerprint(quant_stats)
        if fp is not None and fp != packed_params.quant_fp:
            raise ValueError(
                "packed_params were prepared under DIFFERENT quant_stats "
                "values than those passed to forward — re-run "
                "prepare_packed_params with the serving stats"
            )
    return _forward_jit(
        params, i0, i1, t, cfg=cfg, compute_dtype=compute_dtype,
        use_pallas=use_pallas, remat=remat, packed=packed,
        quant_stats=quant_stats, packed_params=packed_params,
        flows=flows, flows_only=flows_only,
    )


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "use_pallas"))
def forward_calibrate(
    params: Params,
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    t: Union[float, jnp.ndarray] = 0.5,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    quantile=None,
) -> tuple:
    """:func:`forward` + int8 calibration stats (SURVEY.md has no analog —
    this is the TPU int8 lever, docs/PERFORMANCE.md lever 4).

    Runs the plain (unpacked) cascade recording every conv operand's |x|
    max per U-Net — or, with ``quantile`` (scalar in (0, 1]), the
    q-quantile of |x|: percentile clipping for trained weights with
    outlier activation channels that per-tensor absmax handles worst
    (validate the clip rate with :func:`forward_saturation`). Returns
    ``(out, stats)``; fold stats over several calibration pairs with
    :func:`merge_quant_stats`, then pass the result as
    ``forward(..., quant_stats=...)``.
    """
    from rrin_tpu.models.unet import unet_apply_stats

    b = i0.shape[0]
    tb = _as_t(t, b)
    f32 = jnp.float32
    cd = compute_dtype
    stats: Dict[str, Dict[str, jnp.ndarray]] = {}

    def run_unet(name: str, *feats: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([f.astype(cd) for f in feats], axis=-1)
        out, st = unet_apply_stats(params[name], x, cfg, quantile=quantile)
        stats[name] = st
        return out.astype(f32)

    out = _cascade(
        run_unet, i0.astype(f32), i1.astype(f32), tb, cfg, use_pallas,
        pairs=_warp_pairs_mode(cd),
    )
    return out, stats


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "use_pallas"))
def forward_saturation(
    params: Params,
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    quant_stats,
    t: Union[float, jnp.ndarray] = 0.5,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
):
    """int8 saturation telemetry: per-site fraction of activation values
    the serving quantization grid CLIPS on this input.

    Runs the plain cascade under the same traversal as
    :func:`forward_calibrate` but records, for every quantization site,
    ``mean(|x| > range)`` against ``quant_stats`` (pass the SERVING stats,
    i.e. margin already applied, to measure what production clips).
    Healthy absmax calibration reads ~0 everywhere; percentile-clipped
    calibration trades a controlled nonzero rate for a finer grid. Rates
    well above the chosen percentile's complement on live traffic mean
    the calibration set no longer covers the input distribution.
    """
    from rrin_tpu.models.unet import unet_apply_stats

    b = i0.shape[0]
    tb = _as_t(t, b)
    f32 = jnp.float32
    cd = compute_dtype
    rates: Dict[str, Dict[str, jnp.ndarray]] = {}

    def run_unet(name: str, *feats: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([f.astype(cd) for f in feats], axis=-1)
        out, st = unet_apply_stats(
            params[name], x, cfg, ranges=quant_stats[name]
        )
        rates[name] = st
        return out.astype(f32)

    _cascade(
        run_unet, i0.astype(f32), i1.astype(f32), tb, cfg, use_pallas,
        pairs=_warp_pairs_mode(cd),
    )
    return rates


@partial(
    jax.jit, static_argnames=("cfg", "compute_dtype", "hw"),
)
def _prepare_packed_collect(
    params: Params,
    cfg: ModelConfig,
    compute_dtype: jnp.dtype,
    quant_stats,
    hw: tuple,
) -> Dict[str, Dict[str, dict]]:
    """Collect every packed-conv site's weight-side kernel constants
    (B2 blocks, lane-tiled bias, folded int8 scales) — the prepare-once
    serving artifact. The constants are shape-independent; ``hw`` only
    selects the branch configuration and defaults to the smallest shape
    that enables every kernel branch (l2+l3 levels, fused pool/upsample).
    Pass the result as ``forward(..., packed_params=...)``.
    """
    from rrin_tpu.models.unet import unet_apply_packed

    out: Dict[str, Dict[str, dict]] = {}
    for name, (cin, _cout) in UNET_SIGNATURES.items():
        col: Dict[str, dict] = {}
        x = jnp.zeros((1, hw[0], hw[1], cin), compute_dtype)
        unet_apply_packed(
            params[name], x, cfg,
            absmax=None if quant_stats is None else quant_stats[name],
            collect=col,
        )
        out[name] = col
    return out


def _stats_fingerprint(stats) -> Optional[str]:
    """Deterministic value hash of a CONCRETE quant-stats pytree (None for
    traced leaves — inside jit the values are unknowable, so callers skip
    the value check there and rely on the static presence check)."""
    import hashlib

    leaves, treedef = jax.tree_util.tree_flatten(stats)
    if any(isinstance(leaf, jax.core.Tracer) for leaf in leaves):
        return None
    h = hashlib.sha1(repr(treedef).encode())
    for leaf in leaves:
        import numpy as _np

        a = _np.asarray(leaf, _np.float32)
        h.update(a.shape.__repr__().encode())
        h.update(a.tobytes())
    return h.hexdigest()


@jax.tree_util.register_pytree_node_class
class PackedParams:
    """Prepared weight-side kernel constants + the (static) shape whose
    kernel-branch configuration they were collected under, plus a
    fingerprint of the quant_stats baked in at prepare time (None when
    prepared without int8 stats) so :func:`forward` can reject serving a
    prep under different (or missing) calibration than it was built with —
    the int8 scales folded into the prep would silently disagree with the
    runtime quantization grids otherwise."""

    def __init__(self, tree: Dict[str, Any], hw: tuple,
                 quant_fp: Optional[str] = None):
        self.tree = tree
        self.hw = tuple(hw)
        self.quant_fp = quant_fp

    def tree_flatten(self):
        # hw + the calibration fingerprint ride the static aux data.
        return (self.tree,), (self.hw, self.quant_fp)

    @classmethod
    def tree_unflatten(cls, aux, children):
        hw, quant_fp = aux
        return cls(children[0], hw, quant_fp)


def prepare_packed_params(
    params: Params,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: jnp.dtype = jnp.bfloat16,
    quant_stats=None,
    hw: tuple = (320, 64),
) -> "PackedParams":
    """Collect every packed-conv site's weight-side kernel constants
    (B2 blocks, lane-tiled bias, folded int8 scales) — the prepare-once
    serving artifact. The constants are shape-independent, but the SET of
    sites and their int8-carry roles follow the kernel-branch flags of
    ``hw`` (models/unet.packed_branch_flags) — prepare with the serving
    shape (or any shape with identical flags; the default enables every
    branch). ``forward`` rejects a mismatched prep. Pass the result as
    ``forward(..., packed_params=...)``.
    """
    return PackedParams(
        _prepare_packed_collect(params, cfg, compute_dtype, quant_stats, hw),
        hw,
        quant_fp=(
            None if quant_stats is None
            # "unverified" when the stats were traced at prepare time (no
            # concrete values to hash): presence is still checked.
            else (_stats_fingerprint(quant_stats) or "unverified")
        ),
    )


def merge_quant_stats(a, b):
    """Elementwise max of two calibration-stats pytrees."""
    return jax.tree.map(jnp.maximum, a, b)


def scale_quant_stats(stats, margin: float):
    """Scale calibration ranges by a safety margin (>1 guards frames whose
    activations exceed the calibration set's; costs ~log2(margin) bits)."""
    return jax.tree.map(lambda s: s * jnp.float32(margin), stats)


@dataclasses.dataclass
class RRIN:
    """Convenience object bundling params + config (mirrors reference `Net`).

    The reference exposes ``Net.forward(frame0, frame1, t)`` (SURVEY.md §1
    L3); this wrapper keeps that surface while the real compute stays in the
    pure :func:`forward` (params explicit, jit-friendly).
    """

    params: Params
    cfg: ModelConfig = ModelConfig()
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    packed: Optional[bool] = None  # None: follow use_pallas
    quant_stats: Optional[Dict[str, Any]] = None  # set via quantize()

    @classmethod
    def init(cls, key: Optional[jax.Array] = None, cfg: ModelConfig = ModelConfig(), **kw) -> "RRIN":
        if key is None:
            key = jax.random.key(0)
        return cls(params=init_params(key, cfg), cfg=cfg, **kw)

    def quantize(
        self,
        i0: jnp.ndarray,
        i1: jnp.ndarray,
        t: Union[float, jnp.ndarray] = 0.5,
        margin: float = 1.2,
    ) -> "RRIN":
        """Calibrate int8 activation ranges on a representative pair and
        return a copy whose calls run the packed int8 path."""
        _, stats = forward_calibrate(
            self.params, i0, i1, t, cfg=self.cfg,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
        )
        return dataclasses.replace(
            self, packed=True, quant_stats=scale_quant_stats(stats, margin)
        )

    def __call__(self, i0: jnp.ndarray, i1: jnp.ndarray, t: Union[float, jnp.ndarray] = 0.5) -> jnp.ndarray:
        return forward(
            self.params,
            i0,
            i1,
            t,
            cfg=self.cfg,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
            packed=self.use_pallas if self.packed is None else self.packed,
            quant_stats=self.quant_stats,
        )

    # Alias matching the reference method name.
    forward = __call__
