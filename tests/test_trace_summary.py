"""benchmarks/trace_summary.py on a synthetic Perfetto trace (SURVEY.md
§5 tracing/profiling: the bundled analyzer for --profile output)."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"
))

from trace_summary import (  # noqa: E402
    device_op_rows,
    find_trace,
    load_events,
    main,
    summarize,
)


def _write_trace(path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "host"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # Device ops: 2 frames of {conv kernel 1000us, warp 500us,
        # fusion 250us}, one long cond wrapper (must be DROPPED: it
        # nests the pallas events), one host op (must be filtered).
        *[
            {"ph": "X", "pid": 1, "tid": 2, "name": n, "dur": d, "ts": i}
            for i, (n, d) in enumerate(
                [("_conv_packed_impl.fused", 1000), ("_warp_kernel", 500),
                 ("fusion.1", 250)] * 2
                + [("cond.7", 50_000)]
            )
        ],
        {"ph": "X", "pid": 9, "tid": 1, "name": "host_thing", "dur": 777,
         "ts": 0},
    ]
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return path


class TestTraceSummary:
    def test_buckets_and_cond_drop(self, tmp_path):
        tp = _write_trace(str(tmp_path / "x.trace.json.gz"))
        rows = device_op_rows(load_events(tp))
        total_us, buckets, counts, _ = summarize(rows, frames=2)
        assert total_us == 2 * (1000 + 500 + 250)  # cond + host excluded
        assert buckets["_conv_packed_impl"] == 2000
        assert buckets["_warp"] == 1000
        assert buckets["fusion"] == 500
        assert counts["_conv_packed_impl"] == 2
        assert "OTHER" not in buckets

    def test_find_trace_in_profile_dir(self, tmp_path):
        d = tmp_path / "prof" / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        tp = _write_trace(str(d / "host.trace.json.gz"))
        assert find_trace(str(tmp_path / "prof")) == tp

    def test_cli(self, tmp_path, capsys):
        tp = _write_trace(str(tmp_path / "x.trace.json.gz"))
        assert main([tp, "--frames", "2"]) == 0
        out = capsys.readouterr().out
        assert "ms/frame" in out and "_conv_packed_impl" in out
