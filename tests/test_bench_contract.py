"""Driver contract of bench.py: ALWAYS exactly one JSON line on stdout
(SURVEY.md §6 / the round artifact BENCH_r{N}.json), even when the bench
crashes — the watchdog only covers hangs."""

import io
import contextlib
import json
import sys


def _load_bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


class TestBenchJsonContract:
    def test_crash_still_prints_one_json_line(self, monkeypatch, capsys):
        bench = _load_bench()

        def boom(*a, **k):
            raise RuntimeError("boom")

        monkeypatch.setattr(bench, "run_bench", boom)
        monkeypatch.setattr(
            sys, "argv", ["bench.py", "--size", "1080p", "--watchdog", "0"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bench.main()
        lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
        assert rc == 1 and len(lines) == 1, (rc, lines)
        d = json.loads(lines[0])
        assert d["metric"] == "bench_error"
        assert set(d) >= {"metric", "value", "unit", "vs_baseline"}
        assert "boom" in d["detail"]["error"]

    def test_selfcheck_only_skips_off_tpu(self, monkeypatch):
        """On a non-TPU backend run_selfcheck reports skipped (the real
        gates need Mosaic); the CLI must still print valid JSON."""
        bench = _load_bench()

        monkeypatch.setattr(
            sys, "argv", ["bench.py", "--selfcheck-only", "--watchdog", "0"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bench.main()
        d = json.loads(buf.getvalue().strip())
        assert rc == 0
        assert d["selfcheck"].get("skipped") is True  # CPU under pytest

    def test_exp_mode_prints_one_json_line(self, monkeypatch):
        """--exp 2 (multi-frame mode) keeps the one-JSON-line contract
        and reports the shared-flow-UNet metric (pipeline._run_times)."""
        bench = _load_bench()

        monkeypatch.setattr(
            sys, "argv",
            ["bench.py", "--size", "vimeo", "--exp", "2", "--int8",
             "--iters", "1", "--watchdog", "0"],
        )
        # keep the CPU run fast: 1 timed iter (main floors at 10) and 1
        # warmup step instead of 2
        orig = bench.run_bench_exp
        monkeypatch.setattr(
            bench, "run_bench_exp",
            lambda size, iters, exp, **k: orig(
                size, 1, exp, **{**k, "warmup": 1}),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bench.main()
        lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
        assert rc == 0 and len(lines) == 1, (rc, lines)
        d = json.loads(lines[0])
        assert d["metric"] == "vimeo_exp2_mid_fps_per_chip_int8"
        assert d["value"] > 0
