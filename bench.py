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

Usage: python bench.py [--size 1080p|720p|vimeo] [--iters N] [--full-json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Measured on this host (torch 2.13 CPU, oracle/torch_ref.py, fp32):
# see BASELINE.md "measured baselines" table.
TORCH_CPU_BASELINE_FPS = {
    "1080p": 0.00528,
    "720p": None,  # not measured
    "vimeo": 0.168,
}

SIZES = {"1080p": (1088, 1920), "720p": (736, 1280), "vimeo": (256, 448)}


def run_bench(size: str = "1080p", iters: int = 10, batch: int = 1,
              use_pallas: bool = True, warmup: int = 2) -> dict:
    import jax
    import jax.numpy as jnp

    from rrin_tpu.config import ModelConfig
    from rrin_tpu.models.rrin import forward, init_params

    cfg = ModelConfig()
    params = init_params(jax.random.key(0), cfg)
    h, w = SIZES[size]
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.random((batch, h, w, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((batch, h, w, 3), dtype=np.float32))

    def step(a, b):
        return forward(params, a, b, 0.5, cfg=cfg, compute_dtype=jnp.bfloat16,
                       use_pallas=use_pallas)

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
    return {
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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=sorted(SIZES), default="1080p")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--full-json", action="store_true",
                   help="pretty-print with detail (driver mode prints 1 line)")
    args = p.parse_args()
    r = run_bench(args.size, args.iters, args.batch, use_pallas=not args.no_pallas)
    if args.full_json:
        print(json.dumps(r, indent=2))
    else:
        line = {k: r[k] for k in ("metric", "value", "unit", "vs_baseline")}
        print(json.dumps(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
