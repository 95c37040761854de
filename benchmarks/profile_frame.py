"""Capture + summarize a device trace of the serving forward (one cmd).

Mirrors bench.py's ``run_bench`` setup exactly (random weights, calibrate,
prepare-once, dependency-chained steps) but wraps the timed loop in
``jax.profiler.trace`` and immediately prints the per-bucket ms/frame
table via benchmarks/trace_summary.py — the workflow that produced the
docs/PERFORMANCE.md budget tables, packaged so a re-trace after a kernel
or glue change is a single command:

    python benchmarks/profile_frame.py --size 1080p --int8 --frames 4
    python benchmarks/profile_frame.py --size 1080p --int8 --examples

The profile dir is kept (default /tmp/rrin_prof_<size>) for deeper digs
with ``trace_summary.py --examples``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--size", default="1080p")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--exp", type=int, default=1,
                   help="trace the multi-frame device_step (bench.py "
                   "run_bench_exp setup: uint8 pairs in, m = 2^exp - 1 "
                   "mids out) instead of the single-mid forward")
    p.add_argument("--frames", type=int, default=4,
                   help="steps captured inside the trace window")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--out", default=None, help="profile dir")
    p.add_argument("--examples", action="store_true")
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from bench import SIZES
    from rrin_tpu.config import ModelConfig
    from rrin_tpu.models.rrin import (
        forward, forward_calibrate, init_params, prepare_packed_params,
        scale_quant_stats,
    )
    from rrin_tpu.models.unet import packed_supported

    cfg = ModelConfig()
    params = init_params(jax.random.key(0), cfg)
    h, w = SIZES[args.size]
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.random((args.batch, h, w, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((args.batch, h, w, 3), dtype=np.float32))

    quant_stats = None
    if args.int8:
        _, stats = forward_calibrate(
            params, i0, i1, 0.5, cfg=cfg, compute_dtype=jnp.bfloat16,
            use_pallas=True,
        )
        quant_stats = scale_quant_stats(stats, 1.2)
    pp = None
    if packed_supported(h, w, cfg):
        pp = prepare_packed_params(
            params, cfg, jnp.bfloat16, quant_stats=quant_stats, hw=(h, w)
        )

    if args.exp > 1:
        # Multi-frame step (pipeline._run_times sequential scan): the
        # uint8-both-ways device_step at exp>1, dependency-chained the
        # same way bench.run_bench_exp drives it.
        from rrin_tpu.pipeline import device_step

        pairs = jnp.asarray(
            rng.integers(0, 256, (args.batch, 2, h, w, 3), dtype=np.uint8))

        def step_exp(prs):
            return device_step(
                params, prs, exp=args.exp, mode="direct", cfg=cfg,
                compute_dtype=jnp.bfloat16, use_pallas=True,
                pad_hw=(0, 0), packed=True, quant_stats=quant_stats,
                packed_params=pp)

        t0 = time.perf_counter()
        out = step_exp(pairs)
        _ = np.asarray(out[0, 0, 0, 0, 0])
        print(f"compile+load {time.perf_counter() - t0:.1f}s", flush=True)
        for _ in range(args.warmup - 1):
            _ = np.asarray(step_exp(pairs)[0, 0, 0, 0, 0])

        prof = args.out or (f"/tmp/rrin_prof_{args.size}_exp{args.exp}"
                            + ("_int8" if args.int8 else ""))
        # One jitted chain call — eager slice/stack ops pay a tunnel
        # round trip each (see bench.run_bench_exp).
        chain = jax.jit(lambda o: jnp.stack([o[:, 0], o[:, -1]], axis=1))
        cur = chain(step_exp(pairs))
        _ = np.asarray(cur[0, 0, 0, 0, 0])
        t0 = time.perf_counter()
        with jax.profiler.trace(prof):
            for _ in range(args.frames):
                cur = chain(step_exp(cur))
            _ = np.asarray(cur[0, 0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / args.frames
        print(f"{dt * 1e3 / args.batch:.2f} ms/STEP wall "
              f"({(1 << args.exp) - 1} mids; {prof})", flush=True)
        _summarize(prof, args)
        return 0

    def step(a, b):
        return forward(params, a, b, 0.5, cfg=cfg,
                       compute_dtype=jnp.bfloat16, use_pallas=True,
                       packed=True, quant_stats=quant_stats,
                       packed_params=pp)

    t0 = time.perf_counter()
    out = step(i0, i1)
    _ = np.asarray(out[0, 0, 0, 0])
    print(f"compile+load {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(args.warmup - 1):
        _ = np.asarray(step(i0, i1)[0, 0, 0, 0])

    prof = args.out or f"/tmp/rrin_prof_{args.size}" + (
        "_int8" if args.int8 else ""
    )
    a, b = i0, out
    t0 = time.perf_counter()
    with jax.profiler.trace(prof):
        for _ in range(args.frames):
            c = step(a, b)
            a, b = b, c
        _ = np.asarray(b[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / args.frames
    print(f"{dt * 1e3 / args.batch:.2f} ms/frame wall ({prof})", flush=True)
    _summarize(prof, args)
    return 0


def _summarize(prof: str, args) -> None:
    import trace_summary as ts

    rows = ts.device_op_rows(ts.load_events(ts.find_trace(prof)))
    total_us, buckets, counts, examples = ts.summarize(rows, args.frames)
    nf = args.frames
    print(f"total device us ({nf} frames): {total_us:.0f}"
          f" -> {total_us / nf / 1000:.2f} ms/frame")
    for k, v in buckets.most_common():
        print(f"{k:22s} {v / nf / 1000:8.3f} ms/frame  n={counts[k] // nf}")
    if args.examples:
        print("\n--- examples")
        for k in buckets:
            for dur, name, long_name in examples[k]:
                print(f"{k:18s} {dur:8d} us  {name}  {long_name}")


if __name__ == "__main__":
    raise SystemExit(main())
