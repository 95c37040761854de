"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json: "1080p 2x interp fps"): interpolated
frames/sec/chip for 1080p 2x midpoint interpolation, bf16 compute, model
on-device (uint8-in/uint8-out device step, excluding host video codec and
the tunnel's host<->device link, which on a real TPU host is PCIe).

vs_baseline: ratio against the PyTorch reference oracle measured on this
host's CPU (the only runnable reference implementation in this air-gapped
environment — see BASELINE.md): 0.00528 fps at 1080p. The BASELINE.json
north star (>=5x a PyTorch-GPU baseline) is unmeasurable here; an
RTX-2080-class GPU is typically ~50-100x the CPU figure, i.e. a
vs_baseline of ~250-500 corresponds to ~5x GPU parity.

The driver-mode single line also carries (in "detail") BASELINE.json
metric 1 — Vimeo-size 448x256 batch-8 frames/sec/chip — and an on-device
self-check of both Mosaic kernels against their XLA references (>60 dB
PSNR; SURVEY.md §4 parity bar on real TPU, not just interpret mode).

Usage: python bench.py [--size 1080p|720p|vimeo] [--iters N] [--full-json]
                       [--skip-extras] [--selfcheck-only]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Measured on this host (torch 2.13 CPU, oracle/torch_ref.py, fp32):
# see BASELINE.md "measured baselines" table.
TORCH_CPU_BASELINE_FPS = {
    "1080p": 0.00528,
    "720p": 0.0281,
    "vimeo": 0.168,
    "4k": 0.000971,  # measured 2026-08-17 (1030.4 s/frame)
}

SIZES = {
    "1080p": (1088, 1920),
    "720p": (736, 1280),
    "vimeo": (256, 448),
    "4k": (2176, 3840),
}


def _psnr_db(ref: np.ndarray, got: np.ndarray) -> float:
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    mse = float(np.mean((ref - got) ** 2))
    if mse == 0.0:
        return 999.0  # bit-exact; a finite cap keeps the JSON line valid
    peak = float(np.max(np.abs(ref))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def run_selfcheck() -> dict:
    """On-device numerical gate: both Mosaic kernels vs XLA references.

    Returns {"warp_psnr_db", "conv_psnr_db", "ok"}; kernels only lower on
    TPU, so on other backends this reports skipped=True.
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return {"skipped": True, "backend": jax.default_backend()}

    from rrin_tpu.ops.conv_phase import _conv_phase_impl, _conv_xla, supports
    from rrin_tpu.ops.warp import warp_bilinear
    from rrin_tpu.ops.warp_pallas import warp_one_pallas

    rng = np.random.default_rng(7)
    report = {}

    # Warp kernel: smooth bounded flow keeps the Pallas fast path active.
    img = jnp.asarray(rng.random((1, 256, 448, 3), dtype=np.float32))
    flow = jnp.asarray(
        (rng.random((1, 256, 448, 2), dtype=np.float32) - 0.5) * 8.0
    )
    ref = np.asarray(jax.jit(warp_bilinear)(img, flow))
    got = np.asarray(warp_one_pallas(img, flow, False))
    report["warp_psnr_db"] = round(_psnr_db(ref, got), 1)

    # Channel-paired bf16 variant (the bf16 compute path): reference is
    # XLA warp of the bf16-rounded image — the variant's only loss.
    imgb = img.astype(jnp.bfloat16).astype(jnp.float32)
    refp2 = np.asarray(jax.jit(warp_bilinear)(imgb, flow))
    gotp2 = np.asarray(warp_one_pallas(img, flow, False, True))
    report["warp_pairs_psnr_db"] = round(_psnr_db(refp2, gotp2), 1)

    # Byte-packed u8 variant (RRIN_WARP_U8 candidate): EXACT for
    # u8-derived sources (the production frames).
    img8 = jnp.round(img * 255.0) * jnp.float32(1.0 / 255.0)
    refu8 = np.asarray(jax.jit(warp_bilinear)(img8, flow))
    gotu8 = np.asarray(warp_one_pallas(img8, flow, False, "u8"))
    report["warp_u8_psnr_db"] = round(_psnr_db(refu8, gotu8), 1)

    # Phase-conv kernel: the stem conv2 pattern (7x7, 32->32, bf16).
    x = jnp.asarray(
        rng.random((1, 64, 448, 32), dtype=np.float32), jnp.bfloat16
    )
    w = jnp.asarray(
        (rng.random((7, 7, 32, 32), dtype=np.float32) - 0.5) * 0.1
    )
    b = jnp.asarray((rng.random(32, dtype=np.float32) - 0.5) * 0.1)
    p = supports(x.shape, w.shape)
    assert p, "selfcheck shape must route to the phase-conv kernel"
    refc = np.asarray(_conv_xla(x, w, b, 0.1), np.float32)
    gotc = np.asarray(
        _conv_phase_impl(x, w.astype(x.dtype), b, p, 0.1), np.float32
    )
    report["conv_psnr_db"] = round(_psnr_db(refc, gotc), 1)

    # Carried-layout conv kernel: dual-operand (fused skip concat) site.
    from rrin_tpu.ops.conv_packed import (
        _conv_packed_xla,
        _conv_up_packed_xla,
        conv_packed,
        conv_up_packed,
    )
    from rrin_tpu.ops.packed import pack

    a = jnp.asarray(rng.random((1, 64, 440, 16), dtype=np.float32))
    bb = jnp.asarray(rng.random((1, 64, 440, 16), dtype=np.float32))
    ap, aspec = pack(a, p=4, off=0, m=112)
    bp, bspec = pack(bb, p=4, off=0, m=112)
    wd = jnp.asarray((rng.random((3, 3, 32, 32), dtype=np.float32) - 0.5) * 0.3)
    bd = jnp.asarray((rng.random(32, dtype=np.float32) - 0.5))
    parts = [(ap, aspec, 16), (bp, bspec, 16)]
    gotp, _ = conv_packed(parts, wd, bd, 3, 0.1)
    refp = _conv_packed_xla(
        [ap, bp], wd, bd, (aspec, bspec), (16, 16), 3, 0.1
    )
    report["conv_packed_psnr_db"] = round(
        _psnr_db(np.asarray(refp), np.asarray(gotp)), 1
    )

    # Fused upsample+conv kernel (the up3/up4 fast path).
    cu = jnp.asarray(rng.random((1, 32, 216, 64), dtype=np.float32))
    cup, cuspec = pack(cu, p=2, off=0, m=112)
    wu = jnp.asarray((rng.random((3, 3, 64, 32), dtype=np.float32) - 0.5) * 0.3)
    bu = jnp.asarray((rng.random(32, dtype=np.float32) - 0.5))
    gotu, _ = conv_up_packed(cup, cuspec, 64, wu, bu, 3, 0.1)
    refu = _conv_up_packed_xla(cup, wu, bu, cuspec, 64, 3, 0.1)
    report["conv_up_psnr_db"] = round(
        _psnr_db(np.asarray(refu), np.asarray(gotu)), 1
    )

    # Fused pool+conv kernel (the down-stage fast path), float and
    # carried-int8-in/out.
    from rrin_tpu.ops.conv_packed import (
        _conv_pool_packed_xla,
        conv_pool_packed,
    )

    cp = jnp.asarray(rng.random((1, 64, 440, 32), dtype=np.float32)) - 0.5
    cpp, cpspec = pack(cp, p=4, off=3, m=112)
    wp = jnp.asarray((rng.random((5, 5, 32, 64), dtype=np.float32) - 0.5) * 0.3)
    bp2 = jnp.asarray((rng.random(64, dtype=np.float32) - 0.5))
    gotpl, _ = conv_pool_packed(cpp, cpspec, 32, wp, bp2, 1, 0.1)
    refpl = _conv_pool_packed_xla(cpp, wp, bp2, cpspec, 32, 1, 0.1)
    report["conv_pool_psnr_db"] = round(
        _psnr_db(np.asarray(refpl), np.asarray(gotpl)), 1
    )
    axp = jnp.max(jnp.abs(cp))
    cq = jnp.clip(jnp.round(cpp.astype(jnp.float32) * (127.0 / axp)),
                  -127, 127).astype(jnp.int8)
    oaxp = jnp.float32(6.0)
    gotplq, _ = conv_pool_packed(cq, cpspec, 32, wp, bp2, 1, 0.1,
                                 in_absmax=axp, out_absmax=oaxp)
    refplq = _conv_pool_packed_xla(cq, wp, bp2, cpspec, 32, 1, 0.1,
                                   axp, oaxp)
    report["conv_pool_int8_psnr_db"] = round(
        _psnr_db(np.asarray(refplq, np.float64),
                 np.asarray(gotplq, np.float64)), 1
    )

    # M-doubling fused upsample+conv kernel (the l3->l2 re-entry,
    # fuse_u2), float and int8-in/int8-out.
    from rrin_tpu.ops.conv_packed import (
        _conv_up_m_xla,
        conv_up_m_packed,
    )
    from rrin_tpu.ops.packed import PackedSpec, pad_lanes

    cm = jnp.asarray(rng.random((1, 16, 14, 256), dtype=np.float32)) - 0.5
    cmp_, _ = pack(cm, p=1, off=0, m=16)
    cmspec = PackedSpec(p=1, c=256, w=14, off=0, m=16)
    wm = jnp.asarray(
        (rng.random((3, 3, 256, 128), dtype=np.float32) - 0.5) * 0.3
    )
    bm = jnp.asarray((rng.random(128, dtype=np.float32) - 0.5))
    gotm, _ = conv_up_m_packed(cmp_, cmspec, 256, wm, bm, 32, 0, 16, 0.1)
    refm = _conv_up_m_xla(
        pad_lanes(cmp_, 256), wm, bm, cmspec, 256, 32, 0, 16, 0.1
    )
    report["conv_up_m_psnr_db"] = round(
        _psnr_db(np.asarray(refm), np.asarray(gotm)), 1
    )
    axm = jnp.max(jnp.abs(cm))
    cmq = jnp.clip(jnp.round(cmp_.astype(jnp.float32) * (127.0 / axm)),
                   -127, 127).astype(jnp.int8)
    oaxm = jnp.float32(8.0)
    gotmq, _ = conv_up_m_packed(cmq, cmspec, 256, wm, bm, 32, 0, 16, 0.1,
                                in_absmax=axm, out_absmax=oaxm)
    refmq = _conv_up_m_xla(
        pad_lanes(cmq, 256), wm, bm, cmspec, 256, 32, 0, 16, 0.1,
        axm, oaxm,
    )
    report["conv_up_m_int8_psnr_db"] = round(
        _psnr_db(np.asarray(refmq, np.float64),
                 np.asarray(gotmq, np.float64)), 1
    )

    # Phase-folded fused upsample+conv kernel (the generation-2 up3/up4
    # fast path), float and int8-in/int8-out, at the real u4c1 geometry
    # (P=2, odd off_out).
    from rrin_tpu.ops.conv_packed import _conv_up_f_xla, conv_up_f_packed

    cf = jnp.asarray(rng.random((1, 32, 216, 64), dtype=np.float32)) - 0.5
    cfp, cfspec = pack(cf, p=2, off=0, m=112)
    wf = jnp.asarray(
        (rng.random((3, 3, 64, 32), dtype=np.float32) - 0.5) * 0.3
    )
    bf = jnp.asarray((rng.random(32, dtype=np.float32) - 0.5))
    gotf, _ = conv_up_f_packed(cfp, cfspec, 64, wf, bf, 3, 0.1)
    reff = _conv_up_f_xla(cfp, wf, bf, cfspec, 64, 3, 0.1)
    report["conv_up_f_psnr_db"] = round(
        _psnr_db(np.asarray(reff), np.asarray(gotf)), 1
    )
    axf = jnp.max(jnp.abs(cf))
    cfq = jnp.clip(jnp.round(cfp * (127.0 / axf)), -127, 127).astype(
        jnp.int8
    )
    oaxf = jnp.float32(8.0)
    gotfq, _ = conv_up_f_packed(cfq, cfspec, 64, wf, bf, 3, 0.1,
                                in_absmax=axf, out_absmax=oaxf)
    reffq = _conv_up_f_xla(cfq, wf, bf, cfspec, 64, 3, 0.1, axf, oaxf)
    report["conv_up_f_int8_psnr_db"] = round(
        _psnr_db(np.asarray(reffq, np.float64),
                 np.asarray(gotfq, np.float64)), 1
    )

    # Dense-entry stem (models/unet.py DENSE_ENTRY): P=8/C=16 pack,
    # conv1 contraction at P=8 with the in-kernel P-halving interleave
    # (m_double), bf16 and entry-quantized int8 — the production entry
    # geometry of all four U-Nets.
    de = jnp.asarray(rng.random((1, 64, 443, 6), dtype=np.float32)) - 0.5
    dep, despec = pack(de, p=8, off=5, m=64, c_pad=16)
    wde = jnp.asarray(
        (rng.random((7, 7, 6, 32), dtype=np.float32) - 0.5) * 0.3
    )
    bde = jnp.asarray((rng.random(32, dtype=np.float32) - 0.5))
    gotde, _ = conv_packed([(dep, despec, 6)], wde, bde, 2, 0.1,
                           m_double=True)
    refde = _conv_packed_xla(
        [dep], wde, bde, (despec,), (6,), 2, 0.1, m_double=True
    )
    report["conv_dense_entry_psnr_db"] = round(
        _psnr_db(np.asarray(refde), np.asarray(gotde)), 1
    )
    axde = jnp.max(jnp.abs(de))
    oaxde = jnp.float32(6.0)
    gotdeq, _ = conv_packed([(dep, despec, 6)], wde, bde, 2, 0.1,
                            in_absmax=(axde,), out_absmax=oaxde,
                            m_double=True)
    refdeq = _conv_packed_xla(
        [dep], wde, bde, (despec,), (6,), 2, 0.1, (axde,), oaxde,
        m_double=True,
    )
    report["conv_dense_entry_int8_psnr_db"] = round(
        _psnr_db(np.asarray(refdeq, np.float64),
                 np.asarray(gotdeq, np.float64)), 1
    )

    # int8 variants of both packed kernels vs the fake-quant XLA fallback
    # (same int8 grid; difference is int32-exact vs f32 accumulation).
    amax = (jnp.max(jnp.abs(a)), jnp.max(jnp.abs(bb)))
    gotq, _ = conv_packed(parts, wd, bd, 3, 0.1, in_absmax=amax)
    refq = _conv_packed_xla(
        [ap, bp], wd, bd, (aspec, bspec), (16, 16), 3, 0.1, amax
    )
    report["conv_int8_psnr_db"] = round(
        _psnr_db(np.asarray(refq), np.asarray(gotq)), 1
    )
    amu = jnp.max(jnp.abs(cu))
    gotuq, _ = conv_up_packed(cup, cuspec, 64, wu, bu, 3, 0.1,
                              in_absmax=amu)
    refuq = _conv_up_packed_xla(cup, wu, bu, cuspec, 64, 3, 0.1, amu)
    report["conv_up_int8_psnr_db"] = round(
        _psnr_db(np.asarray(refuq), np.asarray(gotuq)), 1
    )

    report["ok"] = bool(
        report["warp_psnr_db"] > 60.0
        and report["warp_pairs_psnr_db"] > 60.0
        and report["warp_u8_psnr_db"] > 60.0
        and report["conv_psnr_db"] > 60.0
        and report["conv_packed_psnr_db"] > 60.0
        and report["conv_up_psnr_db"] > 60.0
        and report["conv_int8_psnr_db"] > 40.0
        and report["conv_up_int8_psnr_db"] > 40.0
        and report["conv_pool_psnr_db"] > 60.0
        and report["conv_pool_int8_psnr_db"] > 40.0
        and report["conv_up_m_psnr_db"] > 60.0
        and report["conv_up_m_int8_psnr_db"] > 40.0
        and report["conv_up_f_psnr_db"] > 60.0
        and report["conv_up_f_int8_psnr_db"] > 40.0
        and report["conv_dense_entry_psnr_db"] > 60.0
        and report["conv_dense_entry_int8_psnr_db"] > 40.0
    )
    return report


def run_bench(size: str = "1080p", iters: int = 10, batch: int = 1,
              use_pallas: bool = True, warmup: int = 2,
              int8: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from rrin_tpu.config import ModelConfig
    from rrin_tpu.models.rrin import (
        forward, forward_calibrate, init_params, prepare_packed_params,
        scale_quant_stats,
    )
    from rrin_tpu.models.unet import packed_supported

    cfg = ModelConfig()
    params = init_params(jax.random.key(0), cfg)
    h, w = SIZES[size]
    rng = np.random.default_rng(0)
    # u8-derived frames, like production (pipeline normalizes decoded
    # uint8 as u8 * (1/255)) — the default byte-packed warp variant is
    # exact for these sources (ops/warp_pallas._warp_kernel_u8).
    i0 = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3)).astype(
        np.float32) / 255.0)
    i1 = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3)).astype(
        np.float32) / 255.0)

    quant_stats = None
    int8_psnr = None
    if int8:
        # Calibrate once on the bench pair (the pipeline calibrates on its
        # first batch the same way), then gate quality vs the bf16 output.
        _, stats = forward_calibrate(
            params, i0, i1, 0.5, cfg=cfg, compute_dtype=jnp.bfloat16,
            use_pallas=use_pallas,
        )
        quant_stats = scale_quant_stats(stats, 1.2)

    # Prepare-once (the serving configuration, matching the pipeline):
    # weight-side kernel constants are collected outside the timed loop.
    pp = None
    if (use_pallas or int8) and packed_supported(h, w, cfg):
        pp = prepare_packed_params(
            params, cfg, jnp.bfloat16, quant_stats=quant_stats, hw=(h, w)
        )

    def step(a, b):
        return forward(params, a, b, 0.5, cfg=cfg, compute_dtype=jnp.bfloat16,
                       use_pallas=use_pallas, packed=use_pallas or int8,
                       quant_stats=quant_stats, packed_params=pp)

    if int8:
        ref = forward(params, i0, i1, 0.5, cfg=cfg,
                      compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
                      packed=use_pallas)
        int8_psnr = round(_psnr_db(np.asarray(ref), np.asarray(step(i0, i1))), 1)

    # Warm-up: compile + remote program load (can dominate on tunneled TPU).
    t0 = time.perf_counter()
    out = step(i0, i1)
    _ = np.asarray(out[0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        _ = np.asarray(step(i0, i1)[0, 0, 0, 0])

    # Dependency-chained timing: forces sequential device execution; the
    # 1-element fetch at the end forces completion without a bulk D2H.
    a, b = i0, out
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(a, b)
        a, b = b, c
    _ = np.asarray(b[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    fps = batch / dt

    baseline = TORCH_CPU_BASELINE_FPS.get(size)
    r = {
        "metric": f"{size}_2x_interp_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 1) if baseline else None,
        "detail": {
            "ms_per_frame": round(dt * 1e3 / batch, 2),
            "batch": batch,
            "compile_plus_load_seconds": round(compile_s, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "baseline": "torch-2.13-cpu oracle fp32 on this host (BASELINE.md)",
        },
    }
    if int8:
        r["metric"] = f"{size}_2x_interp_fps_per_chip_int8"
        r["detail"]["int8_vs_bf16_psnr_db"] = int8_psnr
    return r


def run_bench_exp(size: str, iters: int, exp: int, int8: bool = False,
                  use_pallas: bool = True, warmup: int = 2) -> dict:
    """Multi-frame direct-mode throughput: one device_step interpolates
    each pair at all m = 2^exp - 1 times (the CLI --exp path; retime and
    slowmo batch the same way via times mode). Measures MID-frames per
    second per chip — m outputs per step. The t-independent flow U-Net is
    computed once per pair and shared across the m times
    (docs/PERFORMANCE.md "Multi-frame interpolation"; RRIN_SHARE_FLOWS=0
    reverts to recomputing it per time for A/B runs)."""
    import jax
    import jax.numpy as jnp

    from rrin_tpu.config import ModelConfig
    from rrin_tpu.models.rrin import (
        init_params, prepare_packed_params, scale_quant_stats,
    )
    from rrin_tpu.models.unet import packed_supported
    from rrin_tpu.pipeline import device_calibrate, device_step

    cfg = ModelConfig()
    params = init_params(jax.random.key(0), cfg)
    h, w = SIZES[size]
    m = (1 << exp) - 1
    rng = np.random.default_rng(0)
    pairs = jnp.asarray(
        rng.integers(0, 256, (1, 2, h, w, 3), dtype=np.uint8))

    quant_stats = None
    if int8:
        stats = device_calibrate(
            params, pairs, cfg=cfg, compute_dtype=jnp.bfloat16,
            pad_hw=(0, 0))
        quant_stats = scale_quant_stats(stats, 1.2)
    pp = None
    if (use_pallas or int8) and packed_supported(h, w, cfg):
        pp = prepare_packed_params(
            params, cfg, jnp.bfloat16, quant_stats=quant_stats, hw=(h, w))

    def step(prs):
        return device_step(
            params, prs, exp=exp, mode="direct", cfg=cfg,
            compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
            pad_hw=(0, 0), packed=use_pallas or int8,
            quant_stats=quant_stats, packed_params=pp)

    t0 = time.perf_counter()
    out = step(pairs)  # (1, m, h, w, 3) uint8
    _ = np.asarray(out[0, 0, 0, 0, 0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        _ = np.asarray(step(pairs)[0, 0, 0, 0, 0])

    # Dependency chain: the next step's pair is built from the previous
    # step's first/last mid frames (device-side, no D2H). The chain op
    # MUST be one jitted call: building it from eager slice/stack ops
    # paid a tunnel ROUND TRIP per op (~200 ms/iter at 720p — each eager
    # op uploads its scalar constants), which round 4 misread as the
    # multi-frame step being 4-5x too slow (device trace: the exp step's
    # actual device time was fine all along).
    chain = jax.jit(lambda o: jnp.stack([o[:, 0], o[:, -1]], axis=1))
    cur = chain(step(pairs))  # compile the chain op outside the loop
    _ = np.asarray(cur[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = chain(step(cur))
    _ = np.asarray(cur[0, 0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters

    shared = os.environ.get("RRIN_SHARE_FLOWS", "1") == "1"
    seq = os.environ.get("RRIN_MF_SEQ", "1") == "1"
    return {
        "metric": f"{size}_exp{exp}_mid_fps_per_chip"
                  + ("_int8" if int8 else ""),
        "value": round(m / dt, 3),
        "unit": "frames/sec",
        "vs_baseline": None,
        "detail": {
            "ms_per_step": round(dt * 1e3, 2),
            "mid_frames_per_step": m,
            "flow_unet_shared": shared,
            "mf_sequential": seq,
            "compile_plus_load_seconds": round(compile_s, 1),
            "backend": jax.default_backend(),
        },
    }


def _bench_4k_row(budget_s: float) -> dict:
    """BASELINE.json config 5 regression guard: one 4K int8 measurement,
    isolated in a subprocess so a 4K-specific hang/crash (its one-time
    program load over the ~30 MB/s tunnel can take many minutes) degrades
    to a recorded skip reason instead of killing the whole artifact."""
    import subprocess
    import sys

    if budget_s < 300:
        return {"skipped": f"insufficient watchdog budget ({budget_s:.0f}s "
                "left; need >=300s for the 4K program load)"}
    cmd = [sys.executable, os.path.abspath(__file__), "--size", "4k",
           "--int8", "--skip-extras", "--watchdog", str(int(budget_s))]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=budget_s + 60)
    except subprocess.TimeoutExpired:
        return {"skipped": f"subprocess exceeded {budget_s:.0f}s"}
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            row = json.loads(line)
        except ValueError:
            continue
        if row.get("metric") == "4k_2x_interp_fps_per_chip_int8":
            return {"fps_per_chip": row["value"],
                    "vs_baseline": row["vs_baseline"]}
        return {"skipped": f"subprocess error: {row.get('detail')}"}
    return {"skipped": f"no JSON line (rc={out.returncode}): "
            f"{out.stderr.strip()[-300:]}"}


# Best-so-far printable line, updated after the headline and each extra
# row completes. If the watchdog fires mid-row it prints THIS instead of
# an error — the round-4 lesson (BENCH_r04.json rc=124/parsed=null): the
# artifact that matters is whatever has already been measured, and the
# watchdog must fire well before any plausible driver timeout so a valid
# line always lands.
_PARTIAL: dict = {"line": None}


def _install_sigterm_flush() -> None:
    """Print the best-so-far line when the DRIVER's timeout fires first.

    BENCH_r04's rc was 124 — GNU `timeout` SIGTERMs before escalating to
    SIGKILL, and an unhandled SIGTERM dies printing nothing. The handler
    makes the partial result land even if the external timeout is tighter
    than the internal watchdog: the driver parses the output tail
    regardless of rc."""
    import signal

    def flush(_sig, _frame):
        line = _PARTIAL.get("line")
        if line is not None:
            line.setdefault("detail", {})["sigterm_partial"] = True
            print(json.dumps(line), flush=True)
        else:
            print(json.dumps({
                "metric": "bench_error", "value": None,
                "unit": "frames/sec", "vs_baseline": None,
                "detail": {"error": "SIGTERM before the headline row "
                           "finished (driver timeout?)"},
            }), flush=True)
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, flush)
    except (ValueError, OSError):  # non-main thread / exotic platform
        pass


def _arm_watchdog(seconds: float) -> "threading.Event":
    """Hard-exit with the best-so-far result line (or a diagnosable JSON
    error if not even the headline finished) if the bench never completes
    — a wedged TPU tunnel hangs device init indefinitely (seen
    2026-08-17: even an (8,128) sum blocks for hours), and round 4 proved
    the driver's own timeout SIGKILLs without recording anything."""
    import threading

    done = threading.Event()

    def fire():
        if done.wait(seconds):
            return
        line = _PARTIAL.get("line")
        if line is not None:
            line.setdefault("detail", {})["watchdog_partial_after_s"] = (
                round(seconds)
            )
            print(json.dumps(line), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "bench_error",
            "value": None,
            "unit": "frames/sec",
            "vs_baseline": None,
            "detail": {"error": f"watchdog: no result in {seconds:.0f}s "
                       "(TPU tunnel wedged?)"},
        }), flush=True)
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=sorted(SIZES), default="1080p")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--exp", type=int, default=1,
                   help="multi-frame mode: interpolate each pair at all "
                   "2^exp - 1 times in one device step (metric becomes "
                   "*_exp{k}_mid_fps_per_chip; implies --skip-extras)")
    p.add_argument("--int8", action="store_true",
                   help="measure the calibrated int8 packed path (the "
                   "headline metric becomes *_int8; detail carries the "
                   "int8-vs-bf16 PSNR quality gate)")
    p.add_argument("--full-json", action="store_true",
                   help="pretty-print with detail (driver mode prints 1 line)")
    p.add_argument("--skip-extras", action="store_true",
                   help="headline metric only: skip the 448x256 batch-8 "
                   "measurement and the on-device kernel selfcheck")
    p.add_argument("--selfcheck-only", action="store_true",
                   help="run only the Mosaic-vs-XLA kernel parity gate")
    p.add_argument("--watchdog", type=float, default=None,
                   help="hard-exit printing the best-so-far JSON line "
                   "if the bench has not finished after this many seconds "
                   "(0 = off; default: BENCH_WATCHDOG_S env or 1800 — "
                   "CONSERVATIVE on purpose: it must fire well before the "
                   "driver's external timeout, which round 4 proved is "
                   "< 3600 s; extra rows are budget-gated against the "
                   "remaining time, see _run)")
    args = p.parse_args()
    if args.watchdog is None:
        args.watchdog = float(os.environ.get("BENCH_WATCHDOG_S", 1800))
    _install_sigterm_flush()

    done = None
    deadline = None
    if args.watchdog > 0:
        done = _arm_watchdog(args.watchdog)
        deadline = time.monotonic() + args.watchdog

    try:
        return _run(args, done, deadline)
    except BaseException as e:  # noqa: BLE001 — driver contract:
        # ALWAYS print one JSON line, even on a crash (the watchdog only
        # covers hangs); the traceback still goes to stderr for triage.
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "bench_error", "value": 0.0, "unit": "none",
            "vs_baseline": 0.0,
            "detail": {"error": f"{type(e).__name__}: {e}"},
        }))
        if done is not None:
            done.set()
        return 1


def _compact_line(r: dict, size: str) -> dict:
    """The driver's one-line view of a (possibly partial) result dict."""
    line = {k: r[k] for k in ("metric", "value", "unit", "vs_baseline")}
    d = r.get("detail", {})
    keys = (
        f"{size}_int8_fps_per_chip", f"{size}_int8_vs_bf16_psnr_db",
        "int8_vs_bf16_psnr_db", "selfcheck",
        "vimeo_448x256_b8_fps_per_chip", "vimeo_vs_baseline",
        "vimeo_448x256_b8_int8_fps_per_chip",
        "720p_fps_per_chip", "720p_int8_fps_per_chip",
        "720p_int8_vs_bf16_psnr_db", "720p_exp2_mid_fps_per_chip_int8",
        "4k_int8", "skipped_rows",
    )
    picked = {k: d[k] for k in keys if k in d}
    if picked:
        line["detail"] = picked
    return line


def _run(args, done, deadline=None) -> int:
    if args.selfcheck_only:
        print(json.dumps({"selfcheck": run_selfcheck()}))
        if done is not None:
            done.set()
        return 0

    if args.exp > 1:
        r = run_bench_exp(args.size, max(args.iters, 10), args.exp,
                          int8=args.int8, use_pallas=not args.no_pallas)
        # detail is small and carries the A/B-relevant fields
        # (flow_unet_shared, ms_per_step) — keep it on the one line
        print(json.dumps(r, indent=2 if args.full_json else None))
        if done is not None:
            done.set()
        return 0

    # Floor the headline loop at 20 iters: the round-3 reconciliation
    # established that short loops sit inside the tunnel's run-to-run
    # jitter (11.1 vs 11.7 fps ~5% spread at --iters 10; VERDICT r3 #6).
    # An explicit --iters above the floor still wins.
    r = run_bench(args.size, max(args.iters, 20), args.batch,
                  use_pallas=not args.no_pallas, int8=args.int8)
    _PARTIAL["line"] = _compact_line(r, args.size)

    if not args.skip_extras:
        # Extra rows in artifact-value order, each gated on the REMAINING
        # watchdog budget with a conservative cost estimate (from
        # benchmarks/AB_R4.json wall clocks — compile + one-time program
        # load dominate and vary wildly over the tunnel, so estimates
        # lean high). A row that does not fit records a skip reason
        # instead of running; a row that still overshoots only costs the
        # rows after it — the watchdog prints the partial line. This is
        # the round-4 fix: BENCH_r04 died rc=124 with zero output because
        # the row set outgrew the driver's external timeout.
        skipped: dict = {}

        def _left() -> float:
            return (float("inf") if deadline is None
                    else deadline - time.monotonic())

        def _fits(name: str, need: float) -> bool:
            if _left() >= need:
                return True
            skipped[name] = (f"budget: {max(_left(), 0):.0f}s left, "
                             f"need ~{need:.0f}s")
            r["detail"]["skipped_rows"] = skipped
            return False

        def _update() -> None:
            if skipped:
                r["detail"]["skipped_rows"] = skipped
            _PARTIAL["line"] = _compact_line(r, args.size)

        # int8 at the headline size (docs/PERFORMANCE.md lever 4),
        # PSNR-gated vs the bf16 output.
        if not args.int8 and _fits(f"{args.size}_int8", 700):
            hi = run_bench(args.size, args.iters, args.batch,
                           use_pallas=not args.no_pallas, int8=True)
            r["detail"][f"{args.size}_int8_fps_per_chip"] = hi["value"]
            r["detail"][f"{args.size}_int8_vs_bf16_psnr_db"] = (
                hi["detail"]["int8_vs_bf16_psnr_db"]
            )
            _update()
        # SURVEY.md §4: kernel parity ON DEVICE, recorded as an artifact.
        if _fits("selfcheck", 550):
            r["detail"]["selfcheck"] = run_selfcheck()
            _update()
        # BASELINE.json metric 1: Vimeo-size 448x256 batch-8 fps/chip.
        # 30+ iters: at ~30 ms/call a 10-iter loop is ~0.3 s, inside the
        # tunnel's run-to-run jitter (BENCH_r02 recorded 212.6 fps where
        # longer runs measure ~235-246 — reconciled round 3).
        if _fits("vimeo", 400):
            v = run_bench("vimeo", max(args.iters, 30), batch=8,
                          use_pallas=not args.no_pallas)
            r["detail"]["vimeo_448x256_b8_fps_per_chip"] = v["value"]
            r["detail"]["vimeo_vs_baseline"] = v["vs_baseline"]
            _update()
            if _fits("vimeo_int8", 300):
                vi = run_bench("vimeo", max(args.iters, 30), batch=8,
                               use_pallas=not args.no_pallas, int8=True)
                r["detail"]["vimeo_448x256_b8_int8_fps_per_chip"] = (
                    vi["value"]
                )
                r["detail"]["int8_vs_bf16_psnr_db"] = (
                    vi["detail"]["int8_vs_bf16_psnr_db"]
                )
                _update()
        if args.size != "720p":
            # BASELINE.json config 3 (720p streaming upscale) device rate —
            # regression-guards the padded-height packed paths
            # (h % 64 != 0), which 1080p/vimeo shapes never exercise.
            if _fits("720p", 450):
                s7 = run_bench("720p", max(args.iters, 20), 1,
                               use_pallas=not args.no_pallas)
                r["detail"]["720p_fps_per_chip"] = s7["value"]
                _update()
            if _fits("720p_int8", 450):
                s7i = run_bench("720p", max(args.iters, 20), 1,
                                use_pallas=not args.no_pallas, int8=True)
                r["detail"]["720p_int8_fps_per_chip"] = s7i["value"]
                r["detail"]["720p_int8_vs_bf16_psnr_db"] = (
                    s7i["detail"]["int8_vs_bf16_psnr_db"]
                )
                _update()
            # Multi-frame mode (--exp 2 / retime class): regression-guards
            # the sequential shared-flow scan of pipeline._run_times.
            if _fits("720p_exp2_int8", 450):
                s7m = run_bench_exp("720p", max(args.iters, 10), 2,
                                    int8=True,
                                    use_pallas=not args.no_pallas)
                r["detail"]["720p_exp2_mid_fps_per_chip_int8"] = (
                    s7m["value"]
                )
                _update()
        if args.size == "1080p" and _fits("4k_int8", 550):
            # BASELINE.json config 5 (4K): regression-guard the resolution
            # in the driver artifact (VERDICT r3 #3). Runs LAST so a 4K
            # failure can only cost its own row; budget = what remains of
            # the parent watchdog minus a printing margin.
            budget = float(os.environ.get("RRIN_BENCH_4K_TIMEOUT_S", 2400))
            if deadline is not None:
                budget = min(budget, _left() - 120)
            r["detail"]["4k_int8"] = _bench_4k_row(budget)
            _update()

    if args.full_json:
        print(json.dumps(r, indent=2))
    else:
        print(json.dumps(_compact_line(r, args.size)))
    if done is not None:
        done.set()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
