"""Arbitrary-fps retiming tests (pipeline.retime_plan / mode="times").

The reference CLI only does 2^k frame-rate doubling (SURVEY.md §3.2);
retiming is a TPU-native extension enabled by ``t`` being a traced model
input (models/rrin.py): one compiled times-mode program per resolution
serves EVERY output timestep pattern.
"""

import fractions
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rrin_tpu.cli import main as cli_main  # noqa: E402
from rrin_tpu.io.video import VideoReader, probe_video  # noqa: E402
from rrin_tpu.models.rrin import init_params  # noqa: E402
from rrin_tpu.pipeline import (  # noqa: E402
    Interpolator,
    device_step,
    interpolate_video,
    retime_plan,
    retime_slots,
)

F = fractions.Fraction
H, W, N_FRAMES, FPS = 64, 96, 9, 10.0


def _make_video(path, n=N_FRAMES, hw=(H, W), fps=FPS):
    h, w = hw
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    small = rng.random((h // 8, 2 * w // 8, 3)).astype(np.float32)
    base = cv2.resize(small, (2 * w, h), interpolation=cv2.INTER_CUBIC)
    base = (np.clip(base, 0, 1) * 255).astype(np.uint8)
    for i in range(n):
        writer.write(base[:, 3 * i : 3 * i + w])
    writer.release()
    return path


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    return _make_video(str(tmp_path_factory.mktemp("vid") / "in.mp4"))


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0))


class TestRetimePlan:
    def test_24_to_60(self):
        # factor 5/2: period-2 pattern, 2 mids per pair, copies on even
        # pairs.
        plans = retime_plan(F(5, 2), 0, 4)
        assert plans[0].emit_copy and plans[0].ts == (0.4, 0.8)
        assert not plans[1].emit_copy and plans[1].ts == (0.2, 0.6)
        assert plans[2].emit_copy and plans[2].ts == (0.4, 0.8)
        assert plans[3] == plans[1]
        assert retime_slots(F(5, 2)) == 2

    def test_downsample_divisor_is_all_copies(self):
        plans = retime_plan(F(1, 2), 0, 4)
        assert [p.emit_copy for p in plans] == [True, False, True, False]
        assert all(p.ts == () for p in plans)
        assert retime_slots(F(1, 2)) == 0

    @pytest.mark.parametrize(
        "factor", [F(5, 2), F(17, 10), F(3, 4), F(30000, 1001) / F(24)]
    )
    def test_plan_partitions_output_timeline(self, factor):
        """Every output j maps to exactly one (pair, t) and nothing else
        is scheduled; slot bound holds for every pair."""
        n_pairs = 50
        plans = retime_plan(factor, 0, n_pairs)
        slots = retime_slots(factor)
        got = []
        for p, plan in enumerate(plans):
            assert len(plan.ts) <= slots
            assert all(0.0 < t < 1.0 for t in plan.ts)
            assert list(plan.ts) == sorted(plan.ts)
            if plan.emit_copy:
                got.append(F(p))
            got.extend(F(p) + F(t).limit_denominator(10**9) for t in plan.ts)
        j_count = -((-n_pairs * factor) // 1)  # ceil: outputs in [0, n)
        want = [F(j) / factor for j in range(int(j_count))]
        assert len(got) == len(want)
        for a, b in zip(sorted(got), want):
            assert abs(float(a - b)) < 1e-9

    def test_segment_offset_reproduces_timeline(self):
        whole = retime_plan(F(17, 10), 0, 20)
        assert whole[7:12] == retime_plan(F(17, 10), 7, 5)

    @pytest.mark.parametrize(
        "factor",
        [F(5, 2), F(1, 2), F(17, 10), F(3, 4), F(4), F(10001, 9999),
         F(30000, 1001) / F(24), F(1200, 1001)],
    )
    def test_slots_closed_form_is_exact(self, factor):
        """retime_slots must bound EVERY pair (a capped period scan
        missed 10001/9999's 2-mid pair at index 4999)."""
        slots = retime_slots(factor)
        q = factor.denominator
        # The schedule is periodic with period q; scan one full period
        # (brute force) when feasible, else the known-worst residues.
        if q <= 2048:
            counts = [len(p.ts) for p in retime_plan(factor, 0, q)]
        else:
            # The max-mids pair has frac(p*factor) = (q-1)/q, i.e.
            # p = (q-1) * a^{-1} mod q; probe it plus the copy pair 0.
            inv = pow(factor.numerator % q, -1, q)
            worst = ((q - 1) * inv) % q
            counts = [len(retime_plan(factor, p, 1)[0].ts)
                      for p in (0, worst)]
        assert max(counts) == slots

    def test_slots_huge_denominator_pair_4999(self):
        # The concrete failure case: factor 10001/9999 needs 2 slots,
        # first at pair 4999.
        assert retime_slots(F(10001, 9999)) == 2
        assert len(retime_plan(F(10001, 9999), 4999, 1)[0].ts) == 2


class TestTimesStep:
    @pytest.mark.parametrize("exp", [1, 2])
    def test_times_matches_direct_grid(self, params, exp):
        rng = np.random.default_rng(1)
        pairs = rng.integers(0, 256, (2, 2, H, W, 3), dtype=np.uint8)
        m = (1 << exp) - 1
        grid = np.arange(1, m + 1, dtype=np.float32) / (1 << exp)
        direct = device_step(
            params, jnp.asarray(pairs), exp=exp, mode="direct",
            compute_dtype=jnp.float32,
        )
        times = device_step(
            params, jnp.asarray(pairs), mode="times",
            compute_dtype=jnp.float32,
            ts=jnp.tile(grid, (2, 1)),
        )
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(times))

    def test_interpolator_ts_contract(self, params):
        pairs = np.zeros((1, 2, H, W, 3), np.uint8)
        it = Interpolator(params, mode="times", compute_dtype="float32")
        with pytest.raises(ValueError, match="ts is required"):
            it.step(pairs)
        it2 = Interpolator(params, compute_dtype="float32")
        with pytest.raises(ValueError, match="ts is required"):
            it2.step(pairs, ts=np.full((1, 1), 0.5, np.float32))


class TestRetimePipeline:
    def test_factor2_matches_exp1(self, video, params, tmp_path):
        """20 fps retime of a 10 fps clip is exactly the 2x doubling:
        same frames in the same order -> byte-identical encodes."""
        out_exp = str(tmp_path / "exp.mp4")
        out_ret = str(tmp_path / "ret.mp4")
        interpolate_video(video, out_exp, params, exp=1,
                          compute_dtype="float32")
        interpolate_video(video, out_ret, params, retime_fps=20.0,
                          compute_dtype="float32")
        a = list(VideoReader(out_exp))
        b = list(VideoReader(out_ret))
        assert len(a) == len(b) == 2 * (N_FRAMES - 1) + 1
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert abs(probe_video(out_ret).fps - 20.0) < 0.01

    def test_24_like_upsample_counts_and_copies(self, video, params,
                                                tmp_path):
        # 10 -> 25 fps (factor 5/2): floor(8 * 2.5) + 1 = 21 frames;
        # outputs j = 0, 5, 10, 15, 20 are source copies of frames
        # 0, 2, 4, 6, 8 (codec noise only).
        out = str(tmp_path / "r25.mp4")
        report = interpolate_video(video, out, params, retime_fps=25.0,
                                   compute_dtype="float32")
        assert report.frames_out == 21
        frames = list(VideoReader(out))
        assert len(frames) == 21
        src = list(VideoReader(video))
        for j, i in [(0, 0), (5, 2), (10, 4), (15, 6), (20, 8)]:
            d = np.mean(np.abs(frames[j].astype(int) - src[i].astype(int)))
            assert d < 12.0, (j, i, d)

    def test_non_integer_trailing_dropped(self, video, params, tmp_path):
        # 10 -> 24 fps (factor 12/5): floor(8 * 2.4) + 1 = 20 frames; the
        # last source frame is NOT an output timestamp.
        out = str(tmp_path / "r24.mp4")
        report = interpolate_video(video, out, params, retime_fps=24.0,
                                   compute_dtype="float32")
        assert report.frames_out == 20

    def test_downsample_divisor_is_pure_copy(self, video, params, tmp_path):
        # 10 -> 5 fps: every output is a source copy, zero device work.
        out = str(tmp_path / "r5.mp4")
        report = interpolate_video(video, out, params, retime_fps=5.0,
                                   compute_dtype="float32")
        assert report.frames_out == 5
        frames = list(VideoReader(out))
        src = list(VideoReader(video))
        for j, i in enumerate(range(0, 9, 2)):
            d = np.mean(np.abs(frames[j].astype(int) - src[i].astype(int)))
            assert d < 12.0, (j, i, d)

    def test_resumable_segments_match_single_pass(self, video, params,
                                                  tmp_path):
        from rrin_tpu.resumable import interpolate_video_resumable

        single = str(tmp_path / "single.mp4")
        seg = str(tmp_path / "seg.mp4")
        interpolate_video(video, single, params, retime_fps=25.0,
                          compute_dtype="float32")
        manifest = interpolate_video_resumable(
            video, seg, params, retime_fps=25.0, segment_pairs=3,
            compute_dtype="float32", use_pallas=False, progress=False,
        )
        assert manifest["finished"]
        a = list(VideoReader(single))
        b = list(VideoReader(seg))
        assert len(a) == len(b) == 21
        # _finalize re-encodes the concatenated segments (one extra codec
        # generation vs the single pass) — same tolerance as
        # tests/test_resumable.py.
        for x, y in zip(a, b):
            assert np.mean(np.abs(x.astype(int) - y.astype(int))) < 12.0

    def test_two_width_factor_batch1(self, video, params, tmp_path):
        # factor 17/10: pairs alternate 1 and 2 mids; at batch 1 each
        # dispatch uses its own slot width (two jit widths, no padded
        # forwards). floor(8 * 1.7) + 1 = 14 outputs.
        out = str(tmp_path / "r17.mp4")
        report = interpolate_video(video, out, params, retime_fps=17.0,
                                   compute_dtype="float32")
        assert report.frames_out == 14

    def test_extreme_downsample_segments_finalize(self, video, params,
                                                  tmp_path):
        # factor 1/4 with 2-pair segments: one segment emits ZERO frames
        # (no output timestamp in its range) — _finalize must skip its
        # header-only file instead of wedging the job.
        from rrin_tpu.resumable import interpolate_video_resumable

        out = str(tmp_path / "down.mp4")
        manifest = interpolate_video_resumable(
            video, out, params, retime_fps=2.5, segment_pairs=2,
            compute_dtype="float32", use_pallas=False, progress=False,
        )
        assert manifest["finished"]
        assert [s["frames"] for s in manifest["segments"]] == [1, 0, 1, 1]
        assert probe_video(out).frame_count == 3

    def test_fps_assumed_container_rejected(self, video, params, tmp_path,
                                            monkeypatch):
        # A container with no fps metadata must not silently retime
        # against the 30.0 display default.
        import rrin_tpu.io.video as vio

        real_init = vio.VideoReader.__init__

        def patched(self, *a, **k):
            real_init(self, *a, **k)
            self.meta = vio.VideoMeta(
                self.meta.width, self.meta.height, 30.0,
                self.meta.frame_count, fps_assumed=True,
            )

        monkeypatch.setattr(vio.VideoReader, "__init__", patched)
        with pytest.raises(ValueError, match="no fps metadata"):
            interpolate_video(video, str(tmp_path / "x.mp4"), params,
                              retime_fps=25.0, compute_dtype="float32")

    def test_retime_composes_with_int8(self, video, params, tmp_path):
        """Retiming rides Interpolator.step unchanged, so calibrated-int8
        serving composes with it (packed XLA fallback on CPU)."""
        out = str(tmp_path / "ri8.mp4")
        report = interpolate_video(video, out, params, retime_fps=25.0,
                                   int8=True)
        assert report.frames_out == 21
        assert probe_video(out).frame_count == 21

    def test_dp_retime_matches_single_device(self, video, params, tmp_path):
        out1 = str(tmp_path / "rdp1.mp4")
        out8 = str(tmp_path / "rdp8.mp4")
        interpolate_video(video, out1, params, retime_fps=25.0,
                          batch_size=8, compute_dtype="float32")
        interpolate_video(video, out8, params, retime_fps=25.0,
                          batch_size=8, compute_dtype="float32",
                          data_parallel=0)
        a = list(VideoReader(out1))
        b = list(VideoReader(out8))
        assert len(a) == len(b) == 21
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestSlowmo:
    def test_slowmo2_matches_exp1_with_source_clock(self, video, params,
                                                    tmp_path):
        """slowmo=2 produces exactly the exp=1 frame sequence but keeps
        the playback clock at fps_in (half-speed motion)."""
        out_exp = str(tmp_path / "sm_exp.mp4")
        out_sm = str(tmp_path / "sm.mp4")
        interpolate_video(video, out_exp, params, exp=1,
                          compute_dtype="float32")
        interpolate_video(video, out_sm, params, slowmo=2.0,
                          compute_dtype="float32")
        a = list(VideoReader(out_exp))
        b = list(VideoReader(out_sm))
        assert len(a) == len(b) == 2 * (N_FRAMES - 1) + 1
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert abs(probe_video(out_sm).fps - FPS) < 0.01  # source clock

    def test_slowmo_non_power_of_two(self, video, params, tmp_path):
        out = str(tmp_path / "sm25.mp4")
        report = interpolate_video(video, out, params, slowmo=2.5,
                                   compute_dtype="float32")
        assert report.frames_out == 21  # floor(8 * 2.5) + 1
        assert abs(probe_video(out).fps - FPS) < 0.01

    def test_slowmo_excludes_retime(self, video, params, tmp_path):
        with pytest.raises(ValueError, match="mutually exclusive"):
            interpolate_video(video, str(tmp_path / "x.mp4"), params,
                              retime_fps=25.0, slowmo=2.0)

    def test_cli_slowmo(self, video, tmp_path):
        out = str(tmp_path / "cli_sm.mp4")
        rc = cli_main([
            "-i", video, "-o", out, "--slowmo", "2.5", "--fp32", "--quiet",
            "--no-pallas",
        ])
        assert rc == 0
        assert probe_video(out).frame_count == 21
        assert abs(probe_video(out).fps - FPS) < 0.01


class TestRetimeCLI:
    def test_cli_retime(self, video, tmp_path):
        out = str(tmp_path / "cli_r.mp4")
        rpt = str(tmp_path / "cli_r.json")
        rc = cli_main([
            "-i", video, "-o", out, "--retime", "25", "--fp32", "--quiet",
            "--no-pallas", "--report", rpt,
        ])
        assert rc == 0
        assert probe_video(out).frame_count == 21
        assert abs(probe_video(out).fps - 25.0) < 0.01
        with open(rpt) as f:
            report = json.load(f)
        assert report["mode"] == "times"
        assert report["fps_out"] == 25.0

    def test_cli_retime_rejects_fps_override(self, video, tmp_path):
        rc = cli_main([
            "-i", video, "-o", str(tmp_path / "x.mp4"), "--retime", "25",
            "--fps", "30", "--quiet",
        ])
        assert rc == 2
