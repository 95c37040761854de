"""Driver contract of bench.py: ALWAYS exactly one JSON line on stdout
(SURVEY.md §6 / the round artifact BENCH_r{N}.json), even when the bench
crashes — the watchdog only covers hangs."""

import io
import contextlib
import json
import pytest
import subprocess
import sys
import time


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

    def test_watchdog_prints_partial_line(self):
        """When the watchdog fires after the headline completed, it must
        print the best-so-far result line (rc 0), NOT a bench_error —
        the round-4 lesson (BENCH_r04.json was rc=124/parsed=null)."""
        code = (
            "import sys, time\n"
            "sys.path.insert(0, '/root/repo')\n"
            "import bench\n"
            "bench._PARTIAL['line'] = {'metric': 'm', 'value': 1.5,\n"
            "    'unit': 'u', 'vs_baseline': None}\n"
            "bench._arm_watchdog(0.3)\n"
            "time.sleep(30)\n"
        )
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=25)
        assert out.returncode == 0, (out.returncode, out.stderr[-300:])
        lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
        assert len(lines) == 1, lines
        d = json.loads(lines[0])
        assert d["metric"] == "m" and d["value"] == 1.5
        assert d["detail"]["watchdog_partial_after_s"] == 0

    def test_sigterm_prints_partial_line(self):
        """GNU `timeout` SIGTERMs before SIGKILL (BENCH_r04 rc=124): the
        handler must flush the best-so-far line so the driver's tail
        parse succeeds even when its external timeout is tighter than
        the internal watchdog."""
        import os
        import signal

        code = (
            "import sys, time\n"
            "sys.path.insert(0, '/root/repo')\n"
            "import bench\n"
            "bench._PARTIAL['line'] = {'metric': 'm', 'value': 2.5,\n"
            "    'unit': 'u', 'vs_baseline': None}\n"
            "bench._install_sigterm_flush()\n"
            "print('READY', flush=True)\n"
            "time.sleep(30)\n"
        )
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.PIPE, text=True)
        assert proc.stdout.readline().strip() == "READY"
        os.kill(proc.pid, signal.SIGTERM)
        out, _ = proc.communicate(timeout=20)
        assert proc.returncode == 0, proc.returncode
        d = json.loads(out.strip())
        assert d["metric"] == "m" and d["value"] == 2.5
        assert d["detail"]["sigterm_partial"] is True

    def test_watchdog_errors_without_headline(self):
        """Watchdog firing BEFORE any result still prints a diagnosable
        bench_error line (rc 3)."""
        code = (
            "import sys, time\n"
            "sys.path.insert(0, '/root/repo')\n"
            "import bench\n"
            "bench._arm_watchdog(0.3)\n"
            "time.sleep(30)\n"
        )
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=25)
        assert out.returncode == 3, (out.returncode, out.stderr[-300:])
        d = json.loads(out.stdout.strip())
        assert d["metric"] == "bench_error"

    def test_budget_gating_skips_extras(self, monkeypatch):
        """With nearly no remaining budget, every extra row is skipped
        with a recorded reason and the headline line still prints."""
        import argparse

        bench = _load_bench()
        calls = []

        def stub_bench(size, iters, batch=1, **k):
            calls.append(("bench", size, k.get("int8", False)))
            return {"metric": f"{size}_2x_interp_fps_per_chip",
                    "value": 12.0, "unit": "frames/sec",
                    "vs_baseline": 100.0, "detail": {}}

        def stub_never(*a, **k):
            raise AssertionError("row should have been budget-skipped")

        monkeypatch.setattr(bench, "run_bench", stub_bench)
        monkeypatch.setattr(bench, "run_bench_exp", stub_never)
        monkeypatch.setattr(bench, "run_selfcheck", stub_never)
        monkeypatch.setattr(bench, "_bench_4k_row", stub_never)
        args = argparse.Namespace(
            size="1080p", iters=1, batch=1, no_pallas=False, exp=1,
            int8=False, full_json=False, skip_extras=False,
            selfcheck_only=False, watchdog=0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bench._run(args, None, deadline=time.monotonic() + 5)
        assert rc == 0
        d = json.loads(buf.getvalue().strip())
        assert d["value"] == 12.0
        skipped = d["detail"]["skipped_rows"]
        for name in ("1080p_int8", "selfcheck", "vimeo", "720p",
                     "720p_int8", "720p_exp2_int8", "4k_int8"):
            assert name in skipped, (name, skipped)
        # only the headline ran
        assert calls == [("bench", "1080p", False)]

    def test_no_deadline_runs_all_rows(self, monkeypatch):
        """deadline=None (watchdog off) runs the full row set and the
        compact line carries every detail key."""
        import argparse

        bench = _load_bench()

        def stub_bench(size, iters, batch=1, **k):
            suffix = "_int8" if k.get("int8") else ""
            return {"metric": f"{size}_2x_interp_fps_per_chip{suffix}",
                    "value": 10.0, "unit": "frames/sec",
                    "vs_baseline": 100.0,
                    "detail": {"int8_vs_bf16_psnr_db": 67.0}}

        monkeypatch.setattr(bench, "run_bench", stub_bench)
        monkeypatch.setattr(
            bench, "run_bench_exp",
            lambda *a, **k: {"metric": "x", "value": 30.0, "unit": "u",
                             "vs_baseline": None, "detail": {}})
        monkeypatch.setattr(bench, "run_selfcheck", lambda: {"ok": True})
        monkeypatch.setattr(bench, "_bench_4k_row",
                            lambda budget: {"fps_per_chip": 4.0})
        args = argparse.Namespace(
            size="1080p", iters=1, batch=1, no_pallas=False, exp=1,
            int8=False, full_json=False, skip_extras=False,
            selfcheck_only=False, watchdog=0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bench._run(args, None, deadline=None)
        assert rc == 0
        d = json.loads(buf.getvalue().strip())
        det = d["detail"]
        for k in ("1080p_int8_fps_per_chip", "selfcheck",
                  "vimeo_448x256_b8_fps_per_chip",
                  "vimeo_448x256_b8_int8_fps_per_chip",
                  "720p_fps_per_chip", "720p_int8_fps_per_chip",
                  "720p_exp2_mid_fps_per_chip_int8", "4k_int8"):
            assert k in det, (k, det)
        assert "skipped_rows" not in det

    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
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
