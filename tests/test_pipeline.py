"""End-to-end pipeline + CLI tests on synthetic videos (SURVEY.md §4
"Integration": frame count = 2^k(N-1)+1, fps metadata, decodability)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402

from rrin_tpu.cli import main as cli_main  # noqa: E402
from rrin_tpu.io.video import VideoReader, VideoWriter, probe_video  # noqa: E402
from rrin_tpu.models.rrin import init_params  # noqa: E402
from rrin_tpu.pipeline import interpolate_video  # noqa: E402

H, W, N_FRAMES, FPS = 64, 96, 9, 10.0


def _make_video(path: str, n: int = N_FRAMES, hw=(H, W), fps: float = FPS):
    h, w = hw
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert writer.isOpened()
    rng = np.random.default_rng(0)
    # Smooth (codec-friendly) moving texture: low-freq noise upscaled.
    small = rng.random((h // 8, 2 * w // 8, 3)).astype(np.float32)
    base = cv2.resize(small, (2 * w, h), interpolation=cv2.INTER_CUBIC)
    base = (np.clip(base, 0, 1) * 255).astype(np.uint8)
    for i in range(n):
        frame = base[:, 3 * i : 3 * i + w]
        writer.write(frame)
    writer.release()
    return path


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    return _make_video(str(tmp_path_factory.mktemp("vid") / "in.mp4"))


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0))


class TestVideoIO:
    def test_probe(self, video):
        meta = probe_video(video)
        assert (meta.width, meta.height) == (W, H)
        assert meta.frame_count == N_FRAMES
        assert abs(meta.fps - FPS) < 0.01

    def test_reader_round_trip(self, video, tmp_path):
        frames = list(VideoReader(video))
        assert len(frames) == N_FRAMES
        assert frames[0].shape == (H, W, 3)
        out = str(tmp_path / "copy.mp4")
        w = VideoWriter(out, FPS, (H, W))
        for f in frames:
            w.write(f)
        w.close()
        assert w.frames_written == N_FRAMES
        assert probe_video(out).frame_count == N_FRAMES

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            VideoReader("/nonexistent/video.mp4")


class TestPipeline:
    @pytest.mark.parametrize("exp,mode", [(1, "direct"), (2, "direct"), (2, "cascade")])
    def test_frame_count_and_fps(self, video, params, tmp_path, exp, mode):
        out = str(tmp_path / f"out_{exp}_{mode}.mp4")
        report = interpolate_video(
            video, out, params, exp=exp, mode=mode, compute_dtype="float32",
        )
        expected = (1 << exp) * (N_FRAMES - 1) + 1
        assert report.frames_out == expected
        meta = probe_video(out)
        assert meta.frame_count == expected
        assert abs(meta.fps - FPS * (1 << exp)) < 0.01
        assert report.frames_in == N_FRAMES
        assert report.compile_seconds > 0

    def test_batched_matches_unbatched(self, video, params, tmp_path):
        out1 = str(tmp_path / "b1.mp4")
        out4 = str(tmp_path / "b4.mp4")
        interpolate_video(video, out1, params, batch_size=1, compute_dtype="float32")
        interpolate_video(video, out4, params, batch_size=4, compute_dtype="float32")
        f1 = list(VideoReader(out1))
        f4 = list(VideoReader(out4))
        assert len(f1) == len(f4)
        # mp4 is lossy, so compare frames decoded from the two files loosely.
        for a, b in zip(f1, f4):
            assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 2.0

    def test_interpolated_frame_is_between(self, params, tmp_path):
        # Content check: translating texture; the mid frame should be closer
        # to the true midpoint than either endpoint is (even with random
        # weights the output is a blend; use PSNR vs a constructed midpoint).
        path = _make_video(str(tmp_path / "shift.mp4"))
        out = str(tmp_path / "shift_out.mp4")
        interpolate_video(path, out, params, compute_dtype="float32")
        frames = list(VideoReader(out))
        assert len(frames) == 2 * (N_FRAMES - 1) + 1
        # even indices are original frames (possibly re-encoded)
        orig = list(VideoReader(path))
        for i in range(N_FRAMES):
            a = frames[2 * i].astype(int)
            b = orig[i].astype(int)
            assert np.mean(np.abs(a - b)) < 12.0  # codec noise only


class TestCLI:
    def test_cli_end_to_end(self, video, tmp_path, capsys):
        out = str(tmp_path / "cli_out.mp4")
        rpt = str(tmp_path / "report.json")
        rc = cli_main([
            "-i", video, "-o", out, "--exp", "1", "--fp32", "--quiet",
            "--report", rpt, "--no-pallas",
        ])
        assert rc == 0
        assert probe_video(out).frame_count == 2 * (N_FRAMES - 1) + 1
        import json

        with open(rpt) as f:
            report = json.load(f)
        assert report["frames_out"] == 2 * (N_FRAMES - 1) + 1
        assert "timers" in report

    def test_cli_sf_alias(self, video, tmp_path):
        out = str(tmp_path / "sf_out.mp4")
        rc = cli_main(["-i", video, "-o", out, "--sf", "4", "--fp32", "--quiet"])
        assert rc == 0
        assert probe_video(out).frame_count == 4 * (N_FRAMES - 1) + 1

    def test_cli_bad_sf(self, video, tmp_path):
        rc = cli_main([
            "-i", video, "-o", str(tmp_path / "x.mp4"), "--sf", "3", "--quiet",
        ])
        assert rc == 2

    def test_cli_missing_input(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            cli_main([
                "-i", "/nonexistent.mp4", "-o", str(tmp_path / "y.mp4"), "--quiet",
            ])


class TestEval:
    def test_synthetic_eval_harness(self, params, tmp_path):
        from rrin_tpu.eval import evaluate, find_triplets, synthesize_triplets

        root = str(tmp_path / "trips")
        synthesize_triplets(root, count=3, hw=(64, 96))
        dirs = find_triplets(root)
        assert len(dirs) == 3
        report = evaluate(params, dirs, batch_size=2, compute_dtype="float32")
        assert report["count"] == 3
        assert report["psnr_mean"] is not None and report["psnr_mean"] > 5.0
        assert 0.0 <= report["ssim_mean"] <= 1.0
        assert len(report["per_triplet"]) == 3

    def test_eval_cli(self, tmp_path, capsys):
        from rrin_tpu.eval import main as eval_main

        root = str(tmp_path / "trips2")
        rc = eval_main(["--data", root, "--synthesize", "2"])
        assert rc == 0
        rc = eval_main(["--data", root, "--fp32", "--no-pallas"])
        assert rc == 0
        assert "psnr_mean" in capsys.readouterr().out


class TestShardedPipeline:
    def test_dp_pipeline_matches_single_device(self, video, params, tmp_path):
        """BASELINE.json config 5: frame pairs DP-sharded over the mesh.
        Output must match the single-device pipeline exactly (same device
        math; encode is deterministic)."""
        out1 = str(tmp_path / "dp1.mp4")
        out8 = str(tmp_path / "dp8.mp4")
        interpolate_video(video, out1, params, batch_size=8,
                          compute_dtype="float32", data_parallel=1)
        interpolate_video(video, out8, params, batch_size=8,
                          compute_dtype="float32", data_parallel=0)
        f1 = list(VideoReader(out1))
        f8 = list(VideoReader(out8))
        assert len(f1) == len(f8) == 2 * (N_FRAMES - 1) + 1
        for a, b in zip(f1, f8):
            np.testing.assert_array_equal(a, b)

    def test_dp_batch_rounded_up(self, video, params, tmp_path):
        # batch_size 3 with an 8-device mesh rounds to 8 transparently.
        out = str(tmp_path / "dp3.mp4")
        report = interpolate_video(video, out, params, batch_size=3,
                                   compute_dtype="float32", data_parallel=0)
        assert report.frames_out == 2 * (N_FRAMES - 1) + 1

    @pytest.mark.slow
    def test_dp_spatial_pipeline_matches_single_device(self, params, tmp_path):
        """BASELINE.json config 5 proper: very-wide (4K-aspect) frames,
        batch DP x H spatially sharded on a 4x2 mesh. The sharded pipeline
        must match the single-device pipeline exactly."""
        video = _make_video(str(tmp_path / "wide.mp4"), n=5,
                            hw=(32, 3840))
        out1 = str(tmp_path / "sp1.mp4")
        out8 = str(tmp_path / "sp8.mp4")
        interpolate_video(video, out1, params, batch_size=4,
                          compute_dtype="float32", data_parallel=1)
        interpolate_video(video, out8, params, batch_size=4,
                          compute_dtype="float32", data_parallel=4,
                          spatial=2)
        f1 = list(VideoReader(out1))
        f8 = list(VideoReader(out8))
        assert len(f1) == len(f8) == 2 * (5 - 1) + 1
        for a, b in zip(f1, f8):
            # H-sharded convs change halo accumulation order -> tiny fp
            # drift; uint8 rounding can flip by at most 1.
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_spatial_interpolator_shards_h(self, params):
        """The pairs batch really is sharded over (data, spatial)."""
        from rrin_tpu.parallel.sharding import batch_sharding
        from rrin_tpu.pipeline import Interpolator

        interp = Interpolator(params, compute_dtype="float32",
                              data_parallel=4, spatial=2)
        assert interp.shard_count == 4
        pairs = np.zeros((4, 2, 32, 64, 3), np.uint8)
        out = interp.step(pairs)
        assert out.shape == (4, 1, 32, 64, 3)

    def test_spatial_forces_plain_compute_path(self, params, monkeypatch):
        """jit-SPMD spatial runs cannot carry pallas_call / the packed
        layout across a sharded H: step() must force both off even when
        the Interpolator was built with use_pallas=True. On TPU a
        sharded-H pallas_call fails to lower — CPU meshes silently take
        the XLA branch of platform_dependent, so assert at the call
        site (round-3 review finding)."""
        import rrin_tpu.pipeline as pl

        seen = {}
        real = pl.device_step

        def spy(*a, **kw):
            seen.update(kw)
            return real(*a, **kw)

        monkeypatch.setattr(pl, "device_step", spy)
        interp = pl.Interpolator(params, compute_dtype="float32",
                                 use_pallas=True, data_parallel=2,
                                 spatial=2)
        pairs = np.zeros((2, 2, 32, 64, 3), np.uint8)
        out = interp.step(pairs)
        assert seen["use_pallas"] is False
        assert seen["packed"] is False
        assert out.shape == (2, 1, 32, 64, 3)

    def test_wide_bf16_skips_packed_prep(self, params):
        """Widths beyond the bf16 packed kernels' scoped-VMEM bound
        (models/unet.packed_bf16_supported; 4K itself fits since the
        round-4 A/B raised the bound — benchmarks/AB_R4.json): forward
        falls back to the plain path, so the Interpolator must not
        build (and cache) a PackedParams tree it would discard."""
        from rrin_tpu.config import ModelConfig
        from rrin_tpu.models.unet import (
            packed_bf16_supported,
            packed_supported,
        )
        from rrin_tpu.pipeline import Interpolator

        cfg = ModelConfig()
        assert packed_bf16_supported(3840)  # 4K fits (A/B round 4)
        assert packed_supported(48, 4096, cfg)  # packed would apply...
        assert not packed_bf16_supported(4096)  # ...but bf16 can't fit
        interp = Interpolator(params, compute_dtype="float32",
                              use_pallas=True)
        pairs = np.zeros((1, 2, 48, 4096, 3), np.uint8)
        out = interp.step(pairs)
        assert interp._packed_params[(48, 4096)] is None
        assert out.shape == (1, 1, 48, 4096, 3)


class TestOddResolutions:
    @pytest.mark.parametrize("hw", [(222, 398), (50, 70)])
    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_non_multiple_video_end_to_end(self, params, tmp_path, hw):
        """Arbitrary video sizes pad to /16 on-device and crop back
        (SURVEY.md §1 L4); kernel dispatch falls back cleanly when the
        padded width doesn't fit a packing factor."""
        path = _make_video(str(tmp_path / "odd.mp4"), hw=hw)
        out = str(tmp_path / "odd_out.mp4")
        report = interpolate_video(path, out, params, compute_dtype="float32")
        assert report.frames_out == 2 * (N_FRAMES - 1) + 1
        meta = probe_video(out)
        assert (meta.height, meta.width) == hw


class TestSaturationReport:
    def test_int8_saturation_in_report(self, video, params, tmp_path):
        """interpolate_video(int8_saturation=True) measures first-batch
        clip rates under the serving grid; absmax calibration + margin
        clips NOTHING on its own calibration batch by construction."""
        out = str(tmp_path / "sat.mp4")
        report = interpolate_video(
            video, out, params, compute_dtype="float32", int8=True,
            int8_saturation=True,
        )
        sat = report.int8_saturation
        assert sat and "flow/c1" in sat
        assert all(0.0 <= v <= 1.0 for v in sat.values())
        assert max(sat.values()) == 0.0
        # the field is JSON-serializable through the report
        assert '"int8_saturation"' in report.to_json()

    def test_cli_new_int8_flag_validation(self, video, tmp_path, capsys):
        from rrin_tpu.cli import main as cm

        out = str(tmp_path / "o.mp4")
        rc = cm(["-i", video, "-o", out, "--int8-percentile", "99.9"])
        assert rc == 2
        assert "--int8" in capsys.readouterr().err
        rc = cm(["-i", video, "-o", out, "--int8-saturation"])
        assert rc == 2
        assert "--int8" in capsys.readouterr().err
        rc = cm(["-i", video, "-o", out, "--int8",
                 "--int8-percentile", "99.9", "--calib", "c.npz"])
        assert rc == 2
        assert "preset" in capsys.readouterr().err
        rc = cm(["-i", video, "-o", out, "--int8", "--int8-saturation",
                 "--segment-pairs", "4"])
        assert rc == 2
        assert "segment" in capsys.readouterr().err


class TestReviewRegressions:
    """Round-3 review findings (pipeline/eval surface)."""

    def test_dp_step_multi_resolution_shared_padded_size(self, params):
        """108 and 112 both pad to 112: the DP step cache must key on
        pad_hw, not the padded size, or the second resolution inherits
        the first one's baked-in pad and forward rejects the shape."""
        from rrin_tpu.pipeline import Interpolator

        interp = Interpolator(
            params, exp=1, compute_dtype="float32", data_parallel=0
        )
        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, (8, 2, 108, 64, 3), dtype=np.uint8)
        b = rng.integers(0, 255, (8, 2, 112, 64, 3), dtype=np.uint8)
        ya = np.asarray(interp.step(a))
        yb = np.asarray(interp.step(b))
        assert ya.shape == (8, 1, 108, 64, 3)
        assert yb.shape == (8, 1, 112, 64, 3)

    def test_times_mode_requires_factor_before_files_exist(
        self, video, params, tmp_path
    ):
        out = str(tmp_path / "times_nofactor.mp4")
        with pytest.raises(ValueError, match="retime_fps or slowmo"):
            interpolate_video(video, out, params, mode="times")
        assert not os.path.exists(out)

    def test_eval_calib_preset_ignored_without_int8(self, params, tmp_path):
        """A persisted calibration preset must not leak into a float
        eval (silently scoring the int8 path, or crashing when
        packed=False)."""
        from rrin_tpu.eval import evaluate, find_triplets, synthesize_triplets

        root = str(tmp_path / "trips_preset")
        synthesize_triplets(root, count=2, hw=(64, 96))
        dirs = find_triplets(root)
        base = evaluate(params, dirs, batch_size=2, compute_dtype="float32")
        withp = evaluate(
            params, dirs, batch_size=2, compute_dtype="float32",
            quant_stats={"bogus": object()},  # must be ignored entirely
        )
        assert withp["psnr_mean"] == base["psnr_mean"]

    def test_cli_calib_requires_int8(self, video, tmp_path, capsys):
        from rrin_tpu.cli import main as cm

        # Nonexistent --ckpt proves the usage error fires BEFORE the
        # checkpoint load (which can take minutes for a torch .pth over
        # the tunnel) — a late check would raise from _load_params.
        rc = cm(["-i", video, "-o", str(tmp_path / "o.mp4"),
                 "--ckpt", str(tmp_path / "missing.pth"),
                 "--calib", "c.npz"])
        assert rc == 2
        assert "only apply to --int8" in capsys.readouterr().err

    def test_int8_rejected_with_prebuilt_spatial_mesh(self, params):
        """int8 + a PREBUILT mesh carrying a >1 spatial axis must fail at
        construction with the clear composition error, not mid-step after
        a wasted calibration pass (the spatial arg alone was checked)."""
        from rrin_tpu.parallel.sharding import make_mesh
        from rrin_tpu.pipeline import Interpolator

        mesh = make_mesh(n_data=2, n_spatial=2)
        with pytest.raises(ValueError, match="spatial"):
            Interpolator(params, int8=True, mesh=mesh)

    def test_eval_percentile_range_validated(self, params, tmp_path):
        """0.999 (user means 99.9%) must raise, not calibrate near the
        |x| minimum and report a silently meaningless int8 score."""
        from rrin_tpu.eval import evaluate

        with pytest.raises(ValueError, match=r"\(50, 100\]"):
            evaluate(params, [], int8=True, int8_percentile=0.999)
