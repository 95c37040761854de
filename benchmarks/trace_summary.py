"""Per-op device-time summary of a ``--profile`` trace.

The CLI's ``--profile DIR`` (and ``jax.profiler.trace`` generally) writes
a Perfetto ``*.trace.json.gz`` under ``DIR/plugins/profile/<run>/``. This
tool parses it directly (no TensorBoard needed in the air-gapped
environment) and prints a per-bucket ms/frame table of TPU device time —
the same analysis that produced docs/PERFORMANCE.md's budget tables.

Usage:
    python benchmarks/trace_summary.py /tmp/profdir --frames 4
    python benchmarks/trace_summary.py trace.json.gz --frames 1 --examples

Gotcha (learned the hard way): ``cond`` wrapper events NEST the Pallas
kernel events they dispatch — counting both double-counts kernel time, so
long cond events are dropped.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
from typing import Any, Dict, List, Tuple

# Buckets in match order (first prefix hit wins). Kernel entry points
# first, then XLA op families.
BUCKET_PREFIXES = (
    "_conv_packed_impl",
    "_conv_up_f",
    "_conv_up_m",
    "_conv_up",
    "_conv_pool",
    "_conv_phase",
    "_warp",
    "fusion",
    "copy",
    "pad",
    "reshape",
    "transpose",
    "convert",
    "slice",
    "concatenate",
    "dynamic",
)


def find_trace(path: str) -> str:
    """``path`` is a trace file or a profile dir written by --profile."""
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "plugins/profile/*/*.trace.json.gz"))
    ) or sorted(glob.glob(os.path.join(path, "*.trace.json.gz")))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def load_events(trace_path: str) -> List[Dict[str, Any]]:
    opener = gzip.open if trace_path.endswith(".gz") else open
    with opener(trace_path, "rb") as f:
        return json.load(f)["traceEvents"]


def device_op_rows(
    events: List[Dict[str, Any]], device_substr: str = "TPU:"
) -> List[Dict[str, Any]]:
    """Complete ('X') events on the device's "XLA Ops" rows."""
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    return [
        e
        for e in events
        if e.get("ph") == "X"
        and device_substr in pids.get(e["pid"], "")
        and tids.get((e["pid"], e["tid"])) == "XLA Ops"
    ]


def summarize(
    rows: List[Dict[str, Any]], frames: int
) -> Tuple[float, "collections.Counter", "collections.Counter", Dict]:
    buckets: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    examples: Dict[str, List] = collections.defaultdict(list)
    total_us = 0.0
    for e in rows:
        name, dur = e["name"], e["dur"]
        if name.startswith("cond") and dur > 1000:
            # cond wrappers NEST the pallas events they dispatch —
            # counting both would double-count kernel time.
            continue
        total_us += dur
        for pref in BUCKET_PREFIXES:
            if name.startswith(pref):
                key = pref
                break
        else:
            key = "OTHER"
        buckets[key] += dur
        counts[key] += 1
        if len(examples[key]) < 6:
            examples[key].append(
                (dur, name, e.get("args", {}).get("long_name", "")[:160])
            )
    return total_us, buckets, counts, examples


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("path", help="profile dir (from --profile) or trace file")
    p.add_argument("--frames", type=int, default=1,
                   help="frames captured inside the trace window "
                   "(divides totals into ms/frame)")
    p.add_argument("--device", default="TPU:",
                   help="device process-name substring (default TPU:)")
    p.add_argument("--examples", action="store_true",
                   help="print example events per bucket")
    args = p.parse_args(argv)

    rows = device_op_rows(load_events(find_trace(args.path)), args.device)
    total_us, buckets, counts, examples = summarize(rows, args.frames)
    nf = max(args.frames, 1)
    print(
        f"total device us ({nf} frames): {total_us:.0f}"
        f" -> {total_us / nf / 1000:.2f} ms/frame"
    )
    for k, v in buckets.most_common():
        print(f"{k:22s} {v / nf / 1000:8.3f} ms/frame  n={counts[k] // nf}")
    if args.examples:
        print("\n--- examples")
        for k in buckets:
            for dur, name, long_name in examples[k]:
                print(f"{k:18s} {dur:8.0f} us  {name}  {long_name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
