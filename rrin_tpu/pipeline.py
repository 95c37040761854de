"""Streaming video interpolation engine (SURVEY.md §1 L4, §3.2, §7.2 step 3).

decode -> normalize -> pad16 -> interpolate -> unpad -> quantize -> encode,
restructured TPU-first:

  * uint8 crosses the PCIe boundary in both directions (4x less transfer
    than the reference's float CHW upload); normalize/pad/quantize run
    on-device inside the jitted step.
  * The device step is ONE jit per (resolution, batch, exp): it expands a
    batch of frame pairs to all 2^k - 1 intermediate times and runs the
    cascade at maximal batch (direct mode), or runs the reference's
    cascaded midpoint recursion entirely in HBM (cascade mode,
    BASELINE.json config 4 — intermediates never round-trip to host,
    avoiding SURVEY.md §7.3's re-quantization pitfall).
  * Host decode and encode run on their own threads (io/video.py); device
    dispatch is async with a bounded in-flight window, so H2D/compute/D2H
    overlap decode and encode (the reference's CUDA-stream analog).
  * Per-stage wall-clock timers are collected into a structured JSON report
    (SURVEY.md §5 metrics/observability).
"""

from __future__ import annotations

import collections
import fractions
import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rrin_tpu import native
from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import forward, forward_calibrate, scale_quant_stats
from rrin_tpu.ops.pad import padded_size


def _dtype_from_name(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _normalize_pad(pairs_u8: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """uint8 (B, 2, H, W, 3) -> f32 [0, 1], edge-padded to the /16 grid.

    THE device-side preprocessing, shared by serving (_step_body),
    calibration (_calibrate_body) and saturation telemetry so all three
    measure/compute on identically prepared inputs."""
    x = pairs_u8.astype(jnp.float32) * (1.0 / 255.0)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x


def _step_body(
    params: Dict[str, Any],
    pairs_u8: jnp.ndarray,
    exp: int = 1,
    mode: str = "direct",
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: Any = jnp.bfloat16,
    use_pallas: bool = False,
    pad_hw: Any = None,
    packed: Optional[bool] = None,
    quant_stats: Optional[Dict[str, Any]] = None,
    packed_params: Any = None,
    ts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One fused device step: (B, 2, H, W, 3) uint8 -> (B, m, H, W, 3) uint8
    with m = 2^exp - 1 (direct/cascade) or ts.shape[1] (times).

    All math between the two uint8 boundaries is on-device and fused by XLA.
    ``pad_hw`` is the static (pad_h, pad_w) bottom/right padding to /16.
    ``quant_stats`` (from :func:`device_calibrate`) switches the packed
    convs to int8 — requires the packed path.

    ``mode="times"`` interpolates each pair at the RUNTIME times ``ts``
    (a traced (B, m) float array in (0, 1)) instead of the static 2^k
    midpoint grid — the arbitrary-fps retiming step. Because ``t`` is a
    traced model input (models/rrin.py), every timestep pattern reuses ONE
    compiled program per (resolution, batch, m); the torch reference would
    pay a fresh graph per distinct t.
    """
    b, _, h, w, _ = pairs_u8.shape
    ph, pw = pad_hw if pad_hw is not None else (
        padded_size(h, cfg.pad_multiple) - h,
        padded_size(w, cfg.pad_multiple) - w,
    )
    x = _normalize_pad(pairs_u8, ph, pw)
    i0, i1 = x[:, 0], x[:, 1]
    m = (1 << exp) - 1

    # The packed-layout fast path follows use_pallas by default: it is
    # the inference configuration (models/unet.unet_apply_packed).
    run = partial(
        forward, params, cfg=cfg, compute_dtype=compute_dtype,
        use_pallas=use_pallas,
        packed=use_pallas if packed is None else packed,
        quant_stats=quant_stats,
        packed_params=packed_params,
    )

    def _run_times(tm: jnp.ndarray) -> jnp.ndarray:
        """Interpolate every pair at its (B, m) times ``tm`` -> (B, m, H,
        W, 3) float mids.

        The m times run SEQUENTIALLY at batch B inside one ``lax.scan``
        (one compiled cascade body, m trips): large frames are measured
        HBM-pressure-SLOWER above device batch 1 (docs/PERFORMANCE.md
        "1080p batching"), and the scan keeps the program small (the
        B*m-batch program's load over the tunnel took minutes). The
        coarse flow U-Net is t-INDEPENDENT (SURVEY App-A step 1:
        flows = f(i0, i1)), so it runs ONCE per pair before the scan and
        the scan body closes over it. Measured at 720p exp2 int8
        (AB_R5): 48.76 mid-fps shared vs 42.75 recomputed — FASTER than
        3 independent m=1 forwards (the sharing dividend). Same math;
        across different compiled programs XLA reassociation allows <=1
        u8 step on isolated rounding-boundary pixels (any dtype — see
        docs/PERFORMANCE.md "Multi-frame" + tests/test_flow_shared).
        A/B valves (read at trace time): RRIN_SHARE_FLOWS=0 recomputes
        flows per time inside the body; RRIN_MF_SEQ=0 reverts to the
        legacy maximal-batch forward; RRIN_MF_UNROLL=1 unrolls the scan
        (measured neutral)."""
        m = tm.shape[1]
        if m == 1:
            return run(i0, i1, tm[:, 0])[:, None]
        share = os.environ.get("RRIN_SHARE_FLOWS", "1") == "1"
        if os.environ.get("RRIN_MF_SEQ", "1") != "1":
            # Legacy round-4 path: one (B*m)-batch forward, pair-major.
            tr = tm.reshape(-1)
            i0r = jnp.repeat(i0, m, axis=0)
            i1r = jnp.repeat(i1, m, axis=0)
            fl = (jnp.repeat(run(i0, i1, 0.5, flows_only=True), m, axis=0)
                  if share else None)
            out = run(i0r, i1r, tr, flows=fl)
            return out.reshape(b, m, out.shape[1], out.shape[2], 3)
        fl = run(i0, i1, 0.5, flows_only=True) if share else None

        def body(carry, t_row):
            return carry, run(i0, i1, t_row, flows=fl)

        # RRIN_MF_UNROLL=1 unrolls the scan: same sequential structure,
        # no while loop in the HLO (m inlined cascade bodies). A/B valve
        # for isolating while-loop overhead around the Mosaic kernels
        # (trace: the rolled scan's trips cost ~5x the m=1 forward).
        unroll = m if os.environ.get("RRIN_MF_UNROLL", "0") == "1" else 1
        _, outs = jax.lax.scan(body, None, jnp.moveaxis(tm, 0, 1),
                               unroll=unroll)
        return jnp.moveaxis(outs, 0, 1)  # (m, B, ...) -> (B, m, ...)

    if mode == "times":
        # Per-pair runtime times: ts is (B, m) traced (host drops any
        # padded slots).
        assert ts is not None and ts.ndim == 2 and ts.shape[0] == b, ts
        m = ts.shape[1]
        mids = _run_times(ts.astype(jnp.float32))
    elif mode == "direct" or exp == 1:
        # Pair j gets t = (j+1)/2^exp.
        tg = jnp.arange(1, m + 1, dtype=jnp.float32) / (1 << exp)
        mids = _run_times(jnp.broadcast_to(tg, (b, m)))
    elif mode == "cascade":
        # Reference-compatible midpoint recursion (SURVEY.md §3.2 [B:10]):
        # level l interpolates midpoints of all 2^l consecutive pairs, in
        # one batched forward per level; intermediates stay in HBM float.
        # NOTE: the last level runs a 2^(exp-1)*B-batch forward (direct
        # mode runs (2^exp - 1)*B) — at 1080p, batch>1 is measured
        # HBM-pressure-SLOWER than batch 1 (docs/PERFORMANCE.md "1080p
        # batching"), so high exp on large frames has sub-linear
        # throughput; Interpolator warns at exp >= 3.
        frames = [i0, i1]  # ordered timeline
        for _level in range(exp):
            lhs = jnp.concatenate(frames[:-1], axis=0)
            rhs = jnp.concatenate(frames[1:], axis=0)
            new_mids = run(lhs, rhs, 0.5)
            n_pairs = len(frames) - 1
            mids_list = [
                new_mids[i * b : (i + 1) * b] for i in range(n_pairs)
            ]
            merged: List[jnp.ndarray] = []
            for i, f in enumerate(frames[:-1]):
                merged.append(f)
                merged.append(mids_list[i])
            merged.append(frames[-1])
            frames = merged
        mids = jnp.stack(frames[1:-1], axis=1)  # (B, m, H, W, 3)
    else:
        raise ValueError(
            f"unknown mode: {mode!r} (use 'direct', 'cascade' or 'times')"
        )

    if ph or pw:
        mids = mids[:, :, :h, :w, :]
    return jnp.round(jnp.clip(mids, 0.0, 1.0) * 255.0).astype(jnp.uint8)


# The single-device jitted step (each Interpolator DP shard runs this exact
# program per device via shard_map — see Interpolator._make_dp_step).
device_step = partial(
    jax.jit,
    static_argnames=(
        "exp", "mode", "cfg", "compute_dtype", "use_pallas", "pad_hw",
        "packed",
    ),
)(_step_body)


def _calibrate_body(
    params: Dict[str, Any],
    pairs_u8: jnp.ndarray,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: Any = jnp.bfloat16,
    use_pallas: bool = False,
    pad_hw: Any = None,
    quantile: Any = None,
) -> Dict[str, Any]:
    """int8 calibration pass: (B, 2, H, W, 3) uint8 -> activation stats.

    Same preprocessing as :func:`device_step`, then the plain cascade at
    t=0.5 (where the flow-projection magnitudes peak) recording per-UNet
    activation |x| maxima (or the ``quantile``-quantile of |x| for
    percentile-clipped calibration). XLA dead-code-eliminates everything
    the stats don't need."""
    b, _, h, w, _ = pairs_u8.shape
    ph, pw = pad_hw if pad_hw is not None else (
        padded_size(h, cfg.pad_multiple) - h,
        padded_size(w, cfg.pad_multiple) - w,
    )
    x = _normalize_pad(pairs_u8, ph, pw)
    _, stats = forward_calibrate(
        params, x[:, 0], x[:, 1], 0.5, cfg=cfg,
        compute_dtype=compute_dtype, use_pallas=use_pallas,
        quantile=quantile,
    )
    return stats


device_calibrate = partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "use_pallas", "pad_hw"),
)(_calibrate_body)


@dataclass(frozen=True)
class PairPlan:
    """Retiming schedule of ONE source pair (see :func:`retime_plan`)."""

    emit_copy: bool          # an output lands exactly on the left frame
    ts: Tuple[float, ...]    # strictly increasing mid times in (0, 1)


def retime_plan(
    factor: fractions.Fraction, start_pair: int, n_pairs: int
) -> List[PairPlan]:
    """Map output frames to source pairs for fps retiming.

    Output frame j plays at source time T = j / factor (in source-frame
    units), so it belongs to pair p = floor(T) with t = T - p; integer T
    is the source frame itself (a host-side copy — the model is only
    asked for strictly interior times). Exact Fraction arithmetic: no
    float drift over long videos, and the per-pair schedule depends only
    on the ABSOLUTE pair index, so resumable segments reproduce it from
    ``start_pair`` alone.
    """
    assert isinstance(factor, fractions.Fraction) and factor > 0
    plans = []
    for p in range(start_pair, start_pair + n_pairs):
        j0 = -((-p * factor) // 1)              # ceil(p * factor)
        j1 = -((-(p + 1) * factor) // 1)        # ceil((p+1) * factor)
        ts, emit_copy = [], False
        for j in range(int(j0), int(j1)):
            t = fractions.Fraction(j, 1) / factor - p
            if t == 0:
                emit_copy = True
            else:
                ts.append(float(t))
        plans.append(PairPlan(emit_copy, tuple(ts)))
    return plans


def retime_slots(factor: fractions.Fraction) -> int:
    """Exact max mids any pair needs under ``factor``.

    Closed form, not a period scan (a scan capped below the denominator
    underestimates — e.g. 10001/9999 first needs its 2nd slot at pair
    4999). With factor a/q in lowest terms and x = frac(p*factor) = k/q,
    a pair has ceil((a+k)/q) - ceil(k/q) outputs of which [k == 0] is a
    copy, so mids(k) = ceil((a+k)/q) - 1 for k > 0 and ceil(a/q) - 1 for
    k = 0; the max over k in [0, q) is at k = q-1 (and equals a-1 when
    q == 1, where every pair is the k=0 case)."""
    a, q = factor.numerator, factor.denominator
    if q == 1:
        return a - 1
    return (a + 2 * q - 2) // q - 1


@dataclass
class StageTimers:
    decode: float = 0.0
    pack: float = 0.0  # fused BGR->RGB + batch pack (native/framepack)
    dispatch: float = 0.0  # host->device + jitted step dispatch
    d2h: float = 0.0  # blocking device->host result fetch
    encode_wait: float = 0.0  # time the main loop stalled on the encode queue
    total: float = 0.0

    def as_dict(self) -> Dict[str, float]:
        return {k: round(v, 4) for k, v in self.__dict__.items()}


@dataclass
class PipelineReport:
    """Structured per-run report (SURVEY.md §5 metrics/logging)."""

    input: str
    output: str
    exp: int
    mode: str
    frames_in: int = 0
    frames_out: int = 0
    fps_in: float = 0.0
    fps_out: float = 0.0
    interp_fps: float = 0.0  # interpolated frames produced per second
    output_fps_rate: float = 0.0  # total output frames per second of wall clock
    compile_seconds: float = 0.0
    timers: Dict[str, float] = field(default_factory=dict)
    # int8 clip telemetry ("unet/site" -> clip rate), filled only when
    # interpolate_video(int8_saturation=True) — see
    # Interpolator.saturation_rates.
    int8_saturation: Optional[Dict[str, float]] = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2)


class Interpolator:
    """Jit-managing wrapper around :func:`device_step` for one video config.

    With ``data_parallel > 1`` (or 0 = all local devices), frame-pair
    batches shard over a 1-D ``data`` mesh axis riding ICI (BASELINE.json
    config 5); params are replicated. Batch DP is embarrassingly parallel,
    so the step is ``jax.shard_map`` of the SINGLE-DEVICE program: every
    chip runs the exact same fast path as a 1-chip run — Mosaic kernels,
    carried int8, prepare-once constants and all (SURVEY.md §2.3 DP row).
    The batch must be divisible by the mesh size (interpolate_video pads
    tail batches, so any batch_size works at the CLI level).

    ``spatial > 1`` additionally shards frame HEIGHT (for 4K-class frames)
    through jit-SPMD with XLA-inserted halo exchanges; that path cannot
    carry the Mosaic kernels (pallas_call is not partitionable across a
    sharded H), so spatial runs use the plain XLA compute path and reject
    int8 (which would be all fake-quant cost, no MXU win).
    """

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig = ModelConfig(),
        exp: int = 1,
        mode: str = "direct",
        compute_dtype: str = "bfloat16",
        use_pallas: bool = False,
        data_parallel: int = 1,
        packed: Optional[bool] = None,
        spatial: int = 1,
        int8: bool = False,
        int8_margin: float = 1.2,
        int8_percentile: Optional[float] = None,
        quant_stats: Optional[Dict[str, Any]] = None,
        mesh: Any = None,
    ):
        if mode not in ("direct", "cascade", "times"):
            raise ValueError(f"unknown mode: {mode!r}")
        if exp < 1:
            raise ValueError("exp must be >= 1")
        if mode == "cascade" and exp >= 3:
            import warnings

            n = 1 << (exp - 1)
            warnings.warn(
                f"exp={exp} (cascade mode) runs up to {n}x-batch forwards "
                "per frame pair — large frames (1080p+) are measured "
                "HBM-pressure-slower above device batch 1 "
                "(docs/PERFORMANCE.md); direct mode runs the "
                "2^exp - 1 times sequentially at batch B instead",
                stacklevel=2,
            )
        if spatial < 1:
            raise ValueError("spatial must be >= 1")
        if int8 and spatial > 1:
            # Spatially-sharded runs use the SPMD XLA path (no Mosaic
            # kernels across a sharded H), where int8 would only add
            # fake-quant noise with no MXU speedup. Pure batch DP is fine:
            # shard_map runs the full int8 fast path on every device.
            raise ValueError(
                "int8 composes with data_parallel (shard_map DP) but not "
                "with spatial sharding: the spatial path is plain-XLA by "
                "design — the cascade's 8 warps each all-gather the "
                "full-res frame across spatial shards, so the Mosaic/int8 "
                "fast path cannot ride it. Use --data-parallel for "
                "multi-chip int8 throughput (docs/PERFORMANCE.md "
                "'Spatial sharding x fast path')."
            )
        if int8_percentile is not None:
            if not int8:
                raise ValueError("int8_percentile requires int8=True")
            if quant_stats is not None:
                raise ValueError(
                    "int8_percentile shapes CALIBRATION — it cannot apply "
                    "to preset quant_stats (already-calibrated ranges)"
                )
            if not 50.0 < int8_percentile <= 100.0:
                raise ValueError(
                    "int8_percentile must be in (50, 100] (percent of "
                    "|activation| mass kept inside the grid; 100 = absmax)"
                )
        if int8:
            packed = True
        self.int8 = int8
        self.int8_margin = int8_margin
        # Percentile-clipped calibration (VERDICT r2 weak #2): trained
        # networks have outlier activation channels that per-tensor absmax
        # handles worst — clipping at e.g. the 99.9th |x| percentile trades
        # a bounded saturation rate (see saturation_rates) for a finer
        # grid. None = classic absmax.
        self._calib_quantile = (
            None if int8_percentile is None else int8_percentile / 100.0
        )
        # Persisted calibration (params/checkpoint save_calibration):
        # per-tensor absmax scalars are resolution-independent, so one
        # preset tree serves every shape (packed support still validated
        # per shape). The margin is assumed already applied by the saver.
        self._preset_stats = quant_stats
        self._quant_stats: Dict[Any, Dict[str, Any]] = {}
        self._packed_params: Dict[Any, Any] = {}
        self.params = params
        self.cfg = cfg
        self.exp = exp
        self.mode = mode
        self.compute_dtype = _dtype_from_name(compute_dtype)
        self.use_pallas = use_pallas
        self.packed = packed
        self.mesh = None
        self.spatial = spatial
        self._dp_steps: Dict[Any, Any] = {}  # pad_hw -> jitted shard_map
        if mesh is not None or data_parallel != 1 or spatial > 1:
            # BASELINE.json config 5: batch over ``data`` (shard_map of
            # the single-device fast path — see class docstring); very
            # large frames (4K) additionally shard H over ``spatial``
            # through jit-SPMD with XLA-inserted conv halo exchanges over
            # ICI (SURVEY.md §5 "long-context"). ``mesh`` overrides
            # data_parallel/spatial with a prebuilt ('data', 'spatial')
            # mesh (the driver's CPU-pinned dryrun uses this).
            from rrin_tpu.parallel.sharding import make_mesh, replicate_params

            if mesh is None:
                n = data_parallel if data_parallel > 0 else 0
                mesh = make_mesh(n_data=n, n_spatial=spatial)
            if mesh.devices.size > 1:
                if int8:
                    # Same constraint as the `spatial` arg check above,
                    # but derived from the MESH (a prebuilt mesh with a
                    # >1 spatial axis routes to the jit-SPMD path — see
                    # _dp_fast — where int8 would crash mid-step after a
                    # wasted calibration pass).
                    from rrin_tpu.parallel.sharding import SPATIAL_AXIS

                    n_sp = int(dict(mesh.shape).get(SPATIAL_AXIS, 1))
                    if n_sp > 1:
                        raise ValueError(
                            "int8 composes with data_parallel (shard_map "
                            "DP) but not with spatial sharding (mesh has "
                            f"a {n_sp}-way '{SPATIAL_AXIS}' axis)"
                        )
                self.mesh = mesh
                self.params = replicate_params(mesh, params)

    @property
    def _dp_fast(self) -> bool:
        """True when the sharded step is shard_map of the full single-
        device fast path (pure batch DP — no spatial axis in use). Derived
        from the MESH, not the ``spatial`` arg, so a prebuilt mesh with a
        >1 spatial axis routes to the jit-SPMD path even if the caller
        left spatial=1."""
        if self.mesh is None:
            return False
        from rrin_tpu.parallel.sharding import SPATIAL_AXIS

        n_sp = dict(self.mesh.shape).get(SPATIAL_AXIS, 1)
        return self.spatial == 1 and int(n_sp) == 1

    def _make_dp_step(self, pad_hw):
        """jit(shard_map(single-device step)) over the data axis: params,
        stats and prep replicated, the pair batch sharded on B. Each device
        traces the EXACT single-chip program — Mosaic kernels, carried
        int8, prepare-once constants and all."""
        from jax.sharding import PartitionSpec as P

        from rrin_tpu.parallel.sharding import DATA_AXIS

        kw = dict(
            exp=self.exp, mode=self.mode, cfg=self.cfg,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            pad_hw=pad_hw, packed=self.packed,
        )

        if self.mode == "times":
            # ts shards with the batch (one row of times per pair).
            def local_t(params, pairs, quant_stats, packed_params, ts):
                return _step_body(params, pairs, quant_stats=quant_stats,
                                  packed_params=packed_params, ts=ts, **kw)

            return jax.jit(jax.shard_map(
                local_t, mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS), P(), P(), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            ))

        def local(params, pairs, quant_stats, packed_params):
            return _step_body(params, pairs, quant_stats=quant_stats,
                              packed_params=packed_params, **kw)

        # check_vma=False: pallas_call does not carry vma metadata (the
        # kernels are traced inside shard_map even on CPU — platform_
        # dependent traces every branch), and the replication check has
        # nothing to verify here: one sharded input, batch-pointwise.
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        ))

    def _dp_calibrate(self, pairs_u8: np.ndarray, pad_hw) -> Dict[str, Any]:
        """shard_map int8 calibration: each device runs the single-device
        calibration pass on its batch shard; per-tensor |x| maxima fold
        with pmax over the data axis, so the result equals a full-batch
        single-device calibration and comes out replicated."""
        from jax.sharding import PartitionSpec as P

        from rrin_tpu.parallel.sharding import DATA_AXIS, shard_pairs

        kw = dict(cfg=self.cfg, compute_dtype=self.compute_dtype,
                  use_pallas=self.use_pallas, pad_hw=pad_hw,
                  quantile=self._calib_quantile)

        def local(params, pairs):
            stats = _calibrate_body(params, pairs, **kw)
            return jax.tree.map(
                lambda s: jax.lax.pmax(s, DATA_AXIS), stats
            )

        batch = shard_pairs(self.mesh, pairs_u8)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(), check_vma=False,
        ))(self.params, batch)

    def _ensure_quant_stats(self, pairs_u8, pad_hw, hw_key) -> None:
        """Calibrate (or install the preset) for this padded resolution if
        not already done. Preset > shard_map DP calibration > single-device
        calibration; non-preset ranges get the safety margin applied."""
        if hw_key in self._quant_stats:
            return
        from rrin_tpu.models.unet import packed_supported

        h, w = pairs_u8.shape[2], pairs_u8.shape[3]
        if not packed_supported(hw_key[0], hw_key[1], self.cfg):
            raise ValueError(
                f"int8 mode needs the packed fast path, which does not "
                f"support {h}x{w} with this config"
            )
        if self._preset_stats is not None:
            self._quant_stats[hw_key] = self._preset_stats
        elif self.mesh is not None:
            # shard_map calibration: per-device local stats folded with
            # pmax over the data axis — exact full-batch ranges for absmax
            # (for percentile mode the max of per-shard quantiles, a safe
            # upper approximation), replicated on output, Pallas-safe per
            # device.
            self._quant_stats[hw_key] = scale_quant_stats(
                self._dp_calibrate(pairs_u8, pad_hw), self.int8_margin
            )
        else:
            self._quant_stats[hw_key] = scale_quant_stats(
                device_calibrate(
                    self.params, jnp.asarray(pairs_u8), cfg=self.cfg,
                    compute_dtype=self.compute_dtype,
                    use_pallas=self.use_pallas, pad_hw=pad_hw,
                    quantile=self._calib_quantile,
                ),
                self.int8_margin,
            )

    def saturation_rates(self, pairs_u8: np.ndarray) -> Dict[str, float]:
        """int8 clip telemetry: fraction of |activation| values this
        batch pushes ABOVE the serving quantization ranges, per site
        (``"unet/site"`` keys, e.g. ``"flow/d1c1"``).

        Calibrates first if this resolution hasn't been seen (so rates
        reflect the grid production would actually use — margin applied).
        Healthy absmax calibration reads ~0.0 everywhere; with
        ``int8_percentile=P`` expect rates near ``1 - P/100`` on inputs
        like the calibration batch. Telemetry path — runs the plain
        cascade once on the default device (params pulled to host under a
        mesh), not part of the serving hot loop."""
        if not self.int8:
            raise ValueError("saturation_rates requires int8=True")
        from rrin_tpu.models.rrin import forward_saturation

        b, _, h, w, _ = pairs_u8.shape
        pad_hw = (
            padded_size(h, self.cfg.pad_multiple) - h,
            padded_size(w, self.cfg.pad_multiple) - w,
        )
        hw_key = (h + pad_hw[0], w + pad_hw[1])
        self._ensure_quant_stats(pairs_u8, pad_hw, hw_key)
        stats = self._quant_stats[hw_key]
        params = self.params
        if self.mesh is not None:
            params = jax.tree.map(lambda x: np.asarray(x), params)
            stats = jax.tree.map(lambda x: np.asarray(x), stats)
        x = _normalize_pad(jnp.asarray(pairs_u8), pad_hw[0], pad_hw[1])
        rates = forward_saturation(
            params, x[:, 0], x[:, 1], stats, 0.5, cfg=self.cfg,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
        )
        return {
            f"{unet}/{site}": float(v)
            for unet, sites in sorted(rates.items())
            for site, v in sorted(sites.items())
        }

    @property
    def mids_per_pair(self) -> int:
        return (1 << self.exp) - 1

    @property
    def shard_count(self) -> int:
        """Devices the BATCH dim shards over (the data axis only — the
        spatial axis shards H, not B)."""
        if self.mesh is None:
            return 1
        from rrin_tpu.parallel.sharding import DATA_AXIS

        return int(self.mesh.shape[DATA_AXIS])

    def step(
        self, pairs_u8: np.ndarray, ts: Optional[np.ndarray] = None
    ) -> jax.Array:
        """Dispatch one device step; returns the (async) device result.

        In int8 mode the first batch AT EACH RESOLUTION also runs a
        calibration pass (device_calibrate) whose activation ranges, scaled
        by ``int8_margin``, quantize every subsequent same-resolution frame
        (per-resolution stats: a shape change re-validates packed support
        and re-calibrates rather than silently reusing foreign ranges).

        ``mode="times"`` requires ``ts``: a (B, m) float array of per-pair
        interpolation times in (0, 1) (padded slots are computed and
        host-dropped — see :func:`retime_plan`)."""
        if (ts is not None) != (self.mode == "times"):
            raise ValueError("ts is required (exactly) when mode='times'")
        b, _, h, w, _ = pairs_u8.shape
        pad_hw = (
            padded_size(h, self.cfg.pad_multiple) - h,
            padded_size(w, self.cfg.pad_multiple) - w,
        )
        hw_key = (h + pad_hw[0], w + pad_hw[1])
        if self.int8:
            self._ensure_quant_stats(pairs_u8, pad_hw, hw_key)
        quant_stats = self._quant_stats.get(hw_key)
        # Prepare-once: collect the packed kernels' weight-side constants
        # for this resolution so per-frame steps skip rebuilding them.
        # (Single-device and shard_map-DP runs both use it — under DP the
        # prep constants come out mesh-replicated and ride P() specs.)
        use_pp = self.use_pallas if self.packed is None else self.packed
        if (use_pp and (self.mesh is None or self._dp_fast)
                and hw_key not in self._packed_params):
            from rrin_tpu.models.rrin import prepare_packed_params
            from rrin_tpu.models.unet import (
                packed_bf16_supported,
                packed_supported,
            )

            prep = None
            # Mirror forward()'s routing exactly: a bf16 run above the
            # scoped-VMEM width bound falls back to the plain path, so
            # building (and caching) a prep it would discard is waste.
            if packed_supported(hw_key[0], hw_key[1], self.cfg) and (
                quant_stats is not None or packed_bf16_supported(hw_key[1])
            ):
                prep = prepare_packed_params(
                    self.params, self.cfg, self.compute_dtype,
                    quant_stats=quant_stats, hw=hw_key,
                )
            self._packed_params[hw_key] = prep  # None = unsupported
        prep = self._packed_params.get(hw_key)
        if self._dp_fast:
            # Pure batch DP: shard_map of the single-device program — the
            # full fast path (Mosaic kernels + carried int8) per device.
            from rrin_tpu.parallel.sharding import shard_pairs

            # Keyed by pad_hw (NOT hw_key): two true sizes can share one
            # padded size (1080 and 1088 both pad to 1088) but need
            # different baked-in pads; the jit inside retraces per input
            # shape, so one pad_hw entry serves every resolution with
            # that pad.
            dp = self._dp_steps.get(pad_hw)
            if dp is None:
                dp = self._dp_steps[pad_hw] = self._make_dp_step(pad_hw)
            batch = shard_pairs(self.mesh, pairs_u8)
            if ts is not None:
                from rrin_tpu.parallel.sharding import DATA_AXIS

                tdev = jax.device_put(
                    jnp.asarray(ts, jnp.float32),
                    jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec(DATA_AXIS)
                    ),
                )
                return dp(self.params, batch, quant_stats, prep, tdev)
            return dp(self.params, batch, quant_stats, prep)
        if self.mesh is not None:
            from rrin_tpu.parallel.sharding import shard_pairs

            # Spatial (+DP) jit-SPMD path: XLA compute only — pallas_call
            # cannot partition across the sharded H, so the kernels and
            # the packed layout are FORCED off below (4K-class frames; the
            # halo exchanges ride ICI). pairs_u8 is (B, 2, H, W, 3): H is
            # dim 2.
            batch = shard_pairs(self.mesh, pairs_u8, spatial_dim=2)
        else:
            batch = jnp.asarray(pairs_u8)
        spatial_run = self.mesh is not None
        return device_step(
            self.params,
            batch,
            exp=self.exp,
            mode=self.mode,
            cfg=self.cfg,
            compute_dtype=self.compute_dtype,
            use_pallas=False if spatial_run else self.use_pallas,
            pad_hw=pad_hw,
            packed=False if spatial_run else self.packed,
            quant_stats=quant_stats,
            packed_params=prep,
            ts=None if ts is None else jnp.asarray(ts, jnp.float32),
        )


def interpolate_video(
    input_path: str,
    output_path: str,
    params: Dict[str, Any],
    cfg: ModelConfig = ModelConfig(),
    exp: int = 1,
    mode: str = "direct",
    batch_size: int = 1,
    compute_dtype: str = "bfloat16",
    use_pallas: bool = False,
    fps_out: Optional[float] = None,
    fourcc: str = "mp4v",
    queue_depth: int = 8,
    max_in_flight: int = 2,
    progress: bool = False,
    start_frame: int = 0,
    max_pairs: Optional[int] = None,
    write_trailing_frame: bool = True,
    data_parallel: int = 1,
    spatial: int = 1,
    int8: bool = False,
    int8_margin: float = 1.2,
    int8_percentile: Optional[float] = None,
    int8_saturation: bool = False,
    quant_stats: Optional[Dict[str, Any]] = None,
    save_calib: Optional[str] = None,
    retime_fps: Optional[float] = None,
    slowmo: Optional[float] = None,
) -> PipelineReport:
    """2^exp-upsample ``input_path``'s frame rate into ``output_path``.

    Output frame count = 2^exp * (N - 1) + 1 for N input frames
    (original frames interleaved with interpolated ones, SURVEY.md §3.2).

    ``retime_fps`` switches to arbitrary-ratio retiming instead: output
    frame j plays at source time j*fps_in/retime_fps, so any conversion
    (24→60, 30→24, NTSC rates, slowdowns) runs in ONE compiled times-mode
    program per resolution (see :func:`retime_plan`; ``exp``/``mode`` are
    ignored). Output frame count = floor((N-1) * retime_fps/fps_in) + 1 —
    timestamps never extrapolate past the last source frame.

    ``slowmo`` is the same times-mode machinery with the output CLOCK kept
    at the input rate: ``slowmo=2.5`` interpolates 2.5x the frames and
    plays them at fps_in, i.e. arbitrary-ratio (non-power-of-two) slow
    motion. ``fps_out`` may override the playback rate; mutually exclusive
    with ``retime_fps``.

    ``start_frame``/``max_pairs``/``write_trailing_frame`` carve out a
    contiguous sub-range of source pairs — the building block of segmented
    resumable jobs (rrin_tpu.resumable, SURVEY.md §5 failure recovery):
    consecutive segments concatenate seamlessly when only the last one
    writes the trailing source frame.
    """
    from rrin_tpu.io.video import VideoReader, VideoWriter

    if retime_fps is not None and slowmo is not None:
        raise ValueError("retime_fps and slowmo are mutually exclusive")
    if retime_fps is not None:
        if retime_fps <= 0:
            raise ValueError("retime_fps must be > 0")
        mode = "times"
    if slowmo is not None:
        if slowmo <= 0:
            raise ValueError("slowmo must be > 0")
        mode = "times"
    if mode == "times" and retime_fps is None and slowmo is None:
        # Interpolator itself accepts mode='times' (per-step ts), but at
        # the video level the times come from a retime/slowmo factor —
        # fail here, not mid-run after the output file exists.
        raise ValueError(
            "mode='times' at the video level requires retime_fps or slowmo"
        )

    # Interpolator validation (mode/exp/sharding/int8 conflicts) runs
    # BEFORE any file handle or decode thread exists.
    interp = Interpolator(
        params, cfg, exp=exp, mode=mode, compute_dtype=compute_dtype,
        use_pallas=use_pallas, data_parallel=data_parallel, spatial=spatial,
        int8=int8, int8_margin=int8_margin,
        int8_percentile=int8_percentile, quant_stats=quant_stats,
    )
    # Sharded batches must divide evenly over the data mesh axis.
    batch_size = -(-batch_size // interp.shard_count) * interp.shard_count

    # Host frames stay BGR end-to-end: original frames are written back
    # with ZERO swap passes, and the one swap the device input needs is
    # fused into the threaded native pair-packer (rrin_tpu/native).
    reader = VideoReader(input_path, queue_depth=queue_depth,
                         start_frame=start_frame, rgb=False)
    meta = reader.meta

    factor = None
    try:
        if retime_fps is not None:
            if meta.fps_assumed:
                raise ValueError(
                    f"{input_path} has no fps metadata — retiming needs "
                    "the true input rate (pass a container with fps, or "
                    "remux first)"
                )
            # Exact rational ratio (limit_denominator absorbs NTSC-style
            # float fps like 29.97002997 -> 30000/1001).
            factor = (
                fractions.Fraction(retime_fps).limit_denominator(100_000)
                / fractions.Fraction(meta.fps).limit_denominator(100_000)
            )
        elif slowmo is not None:
            # Slow motion IS the factor (fps-independent: timestamps
            # stretch, the playback clock stays at fps_in).
            factor = fractions.Fraction(slowmo).limit_denominator(100_000)
    except Exception:
        reader.close()
        raise

    # m sizes the writer queue: exact max mids per pair under retiming
    # (dispatch uses the per-BATCH max, which never exceeds it).
    m = retime_slots(factor) if factor is not None else interp.mids_per_pair

    out_fps = (
        retime_fps if retime_fps is not None
        else fps_out if fps_out is not None
        else meta.fps if slowmo is not None
        else meta.fps * (1 << exp)
    )
    writer = VideoWriter(
        output_path, out_fps, (meta.height, meta.width), fourcc=fourcc,
        queue_depth=queue_depth * (m + 1), input_rgb=False,
    )

    timers = StageTimers()
    report = PipelineReport(
        input=input_path, output=output_path, exp=exp, mode=mode,
        fps_in=meta.fps, fps_out=out_fps,
    )
    t_start = time.perf_counter()

    # In-flight window: (lefts, plans, device result) per step.
    inflight: "collections.deque" = collections.deque()
    pending_pairs: List[tuple] = []  # (prev, frame) BGR uint8 pairs
    pending_lefts: List[np.ndarray] = []
    pending_plans: List[PairPlan] = []  # retime mode only
    prev: Optional[np.ndarray] = None
    last_frame: Optional[np.ndarray] = None
    frames_in = 0
    n_mids_written = 0
    first_dispatch = True

    def drain_one() -> None:
        nonlocal timers, n_mids_written
        lefts, plans, dev = inflight.popleft()
        t0 = time.perf_counter()
        # blocks until the step is done; uint8 host copy
        mids = None if dev is None else np.asarray(dev)
        timers.d2h += time.perf_counter() - t0
        t0 = time.perf_counter()
        for i, left in enumerate(lefts):
            if plans is None:
                writer.write(left)  # BGR passthrough, no swap
                for j in range(m):
                    writer.write(mids[i, j], rgb=True)  # device RGB
                n_mids_written += m
            else:
                if plans[i].emit_copy:
                    writer.write(left)
                for j in range(len(plans[i].ts)):
                    writer.write(mids[i, j], rgb=True)
                n_mids_written += len(plans[i].ts)
        timers.encode_wait += time.perf_counter() - t0

    def dispatch(
        pairs: List[tuple],
        lefts: List[np.ndarray],
        plans: Optional[List[PairPlan]] = None,
    ) -> None:
        nonlocal first_dispatch, timers, report
        n = len(pairs)
        if n < batch_size:
            # Pad the tail batch so the jit signature stays unique; the
            # padded rows are computed then dropped (lefts is shorter).
            pairs = pairs + [pairs[-1]] * (batch_size - n)
        mb = m if plans is None else max(len(p_.ts) for p_ in plans)
        if plans is not None and mb == 0:
            # No mids in this batch (pure-copy outputs, or none at all —
            # e.g. divisor-rate downsampling): no device work.
            inflight.append((lefts, plans, None))
            while len(inflight) > max_in_flight:
                drain_one()
            return
        t0 = time.perf_counter()
        # Fused BGR->RGB + pack into the device batch buffer (threaded
        # C++; numpy fallback). A fresh buffer per dispatch: the previous
        # one may still be staging for an in-flight device transfer.
        batch = np.empty((batch_size, 2) + pairs[0][0].shape, np.uint8)
        for i, (a, b) in enumerate(pairs):
            if not native.pack_pair_bgr(a, b, batch, i):
                batch[i, 0] = a[..., ::-1]
                batch[i, 1] = b[..., ::-1]
        timers.pack += time.perf_counter() - t0
        t0 = time.perf_counter()
        if plans is not None:
            # Per-pair times padded to the BATCH max slot count (padded
            # slots compute a midpoint that drain_one never writes). The
            # batch max, not the global max: for two-count factors like
            # 1200/1001 most batches stay at the low count, so batch-1
            # serving pays zero padded forwards (at most two jit widths
            # per resolution).
            ts = np.full((batch_size, mb), 0.5, np.float32)
            for i, pl_ in enumerate(plans):
                ts[i, : len(pl_.ts)] = pl_.ts
            dev = interp.step(batch, ts)[: len(lefts)]
        else:
            dev = interp.step(batch)[: len(lefts)]
        dt = time.perf_counter() - t0
        if first_dispatch:
            report.compile_seconds = round(dt, 3)
            first_dispatch = False
            if int8_saturation and int8:
                # Telemetry on the (already calibrated) first batch: with
                # absmax calibration + margin this reads 0.0 everywhere by
                # construction; with int8_percentile it shows the actual
                # clip rates production serves under.
                report.int8_saturation = {
                    k: round(v, 6)
                    for k, v in interp.saturation_rates(batch).items()
                }
        else:
            timers.dispatch += dt
        inflight.append((lefts, plans, dev))
        while len(inflight) > max_in_flight:
            drain_one()

    pairs_done = 0
    try:
        t_dec = time.perf_counter()
        for frame in reader:
            timers.decode += time.perf_counter() - t_dec
            frames_in += 1
            last_frame = frame
            if prev is not None:
                pending_pairs.append((prev, frame))
                pending_lefts.append(prev)
                if factor is not None:
                    # Schedule from the ABSOLUTE pair index — segments of
                    # a resumable retime job reproduce the same timeline.
                    pending_plans.append(
                        retime_plan(factor, start_frame + pairs_done, 1)[0]
                    )
                pairs_done += 1
                if len(pending_pairs) == batch_size:
                    dispatch(pending_pairs, pending_lefts,
                             pending_plans if factor is not None else None)
                    pending_pairs, pending_lefts, pending_plans = [], [], []
            prev = frame
            if progress and frames_in % 100 == 0:
                print(f"\r[rrin-tpu] {frames_in} frames decoded", end="", flush=True)
            if max_pairs is not None and pairs_done >= max_pairs:
                break
            t_dec = time.perf_counter()
        if pending_pairs:
            dispatch(pending_pairs, pending_lefts,
                     pending_plans if factor is not None else None)
        while inflight:
            drain_one()
        if write_trailing_frame and last_frame is not None:
            if factor is None:
                writer.write(last_frame)
            elif (
                (start_frame + frames_in - 1) * factor
            ).denominator == 1:
                # Retiming writes the trailing source frame only when an
                # output timestamp lands exactly on it.
                writer.write(last_frame)
        if frames_in == 0:
            raise ValueError(f"no frames decoded from {input_path}")
    finally:
        reader.close()
        writer.close()
        if progress:
            print()

    if save_calib and interp._quant_stats:
        # Persist the (margin-scaled) ranges the run calibrated — later
        # runs pass them back via ``quant_stats`` and skip calibration.
        from rrin_tpu.params import save_calibration

        stats = next(iter(interp._quant_stats.values()))
        save_calibration(save_calib, jax.tree.map(np.asarray, stats))

    timers.total = time.perf_counter() - t_start
    report.frames_in = frames_in
    report.frames_out = writer.frames_written
    n_interp = (
        n_mids_written if factor is not None else max(frames_in - 1, 0) * m
    )
    report.interp_fps = round(n_interp / timers.total, 2) if timers.total else 0.0
    report.output_fps_rate = (
        round(report.frames_out / timers.total, 2) if timers.total else 0.0
    )
    report.timers = timers.as_dict()
    return report
