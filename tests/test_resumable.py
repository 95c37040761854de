"""Resumable segmented jobs (SURVEY.md §5): segment/manifest lifecycle,
crash-and-resume, concat equivalence, image-pair demo tool."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402

from rrin_tpu.io.video import VideoReader, probe_video  # noqa: E402
from rrin_tpu.models.rrin import init_params  # noqa: E402
from rrin_tpu.pipeline import interpolate_video  # noqa: E402
from rrin_tpu.resumable import (  # noqa: E402
    interpolate_video_resumable,
    job_status,
)

H, W, N, FPS = 64, 96, 11, 10.0


def _make_video(path, n=N):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    rng = np.random.default_rng(0)
    small = rng.random((H // 8, 2 * W // 8, 3)).astype(np.float32)
    base = (np.clip(cv2.resize(small, (2 * W, H), interpolation=cv2.INTER_CUBIC), 0, 1) * 255).astype(np.uint8)
    for i in range(n):
        writer.write(base[:, 2 * i : 2 * i + W])
    writer.release()
    return path


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    return _make_video(str(tmp_path_factory.mktemp("vid") / "in.mp4"))


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0))


class TestResumable:
    def test_segmented_matches_direct(self, video, params, tmp_path):
        direct = str(tmp_path / "direct.mp4")
        seg = str(tmp_path / "seg.mp4")
        interpolate_video(video, direct, params, compute_dtype="float32",
                          use_pallas=False)
        manifest = interpolate_video_resumable(
            video, seg, params, compute_dtype="float32", use_pallas=False,
            segment_pairs=4,
        )
        assert manifest["finished"]
        assert manifest["n_segments"] == 3  # 10 pairs in segments of 4
        assert probe_video(seg).frame_count == probe_video(direct).frame_count
        fd = list(VideoReader(direct))
        fs = list(VideoReader(seg))
        # segment path re-encodes once more; allow codec noise only
        for a, b in zip(fd, fs):
            assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 12.0

    def test_resume_after_partial_run(self, video, params, tmp_path, monkeypatch):
        out = str(tmp_path / "resume.mp4")

        # Crash the job after the first segment completes.
        import rrin_tpu.resumable as rmod

        real_interp = rmod.interpolate_video
        calls = {"n": 0}

        def crashing(*a, **kw):
            if calls["n"] >= 1:
                raise RuntimeError("simulated crash")
            calls["n"] += 1
            return real_interp(*a, **kw)

        monkeypatch.setattr(rmod, "interpolate_video", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            interpolate_video_resumable(
                video, out, params, compute_dtype="float32", use_pallas=False,
                segment_pairs=4,
            )
        status = job_status(out)
        assert status is not None and not status["finished"]
        assert status["segments_done"] == 1

        # Resume with the real implementation: only remaining segments run.
        monkeypatch.setattr(rmod, "interpolate_video", real_interp)
        manifest = interpolate_video_resumable(
            video, out, params, compute_dtype="float32", use_pallas=False,
            segment_pairs=4,
        )
        assert manifest["finished"]
        assert probe_video(out).frame_count == 2 * (N - 1) + 1
        assert job_status(out)["finished"]

    def test_mismatched_config_rejected(self, video, params, tmp_path):
        out = str(tmp_path / "mm.mp4")
        interpolate_video_resumable(
            video, out, params, compute_dtype="float32", use_pallas=False,
            segment_pairs=4,
        )
        with pytest.raises(ValueError, match="different job config"):
            interpolate_video_resumable(
                video, out, params, compute_dtype="float32", use_pallas=False,
                segment_pairs=5, resume=True,
            )

    def test_segments_cleaned_up(self, video, params, tmp_path):
        out = str(tmp_path / "clean.mp4")
        interpolate_video_resumable(
            video, out, params, compute_dtype="float32", use_pallas=False,
            segment_pairs=100,
        )
        leftovers = [p for p in os.listdir(tmp_path) if ".seg" in p]
        assert leftovers == []

    def test_int8_segments_share_one_calibration(
        self, video, params, tmp_path, monkeypatch
    ):
        """All segments must quantize under ONE int8 grid: the first
        computed segment calibrates (persisting to a job-local sidecar),
        later segments reuse those ranges instead of recalibrating on
        their own first batch, and --save-calib receives that single
        grid (round-3 review finding: every segment used to overwrite
        the calib file with its own fresh calibration)."""
        import rrin_tpu.resumable as rs

        calls = []
        real = rs.interpolate_video

        def spy(*a, **kw):
            calls.append({"quant_stats": kw.get("quant_stats"),
                          "save_calib": kw.get("save_calib")})
            return real(*a, **kw)

        monkeypatch.setattr(rs, "interpolate_video", spy)
        calib = str(tmp_path / "job_calib.npz")
        out = str(tmp_path / "seg_int8.mp4")
        manifest = interpolate_video_resumable(
            video, out, params, compute_dtype="float32",
            segment_pairs=4, int8=True, save_calib=calib,
        )
        assert manifest["finished"] and len(calls) == 3
        assert calls[0]["quant_stats"] is None
        assert calls[0]["save_calib"] == out + ".calib.npz"
        for c in calls[1:]:
            assert c["quant_stats"] is not None
            assert c["save_calib"] is None
        assert os.path.exists(calib)  # user-facing calib: the job's grid
        assert not os.path.exists(out + ".calib.npz")  # sidecar removed


class TestImagePairTool:
    def test_end_to_end_with_gt(self, tmp_path, capsys, rng):
        from rrin_tpu.interp_image import main as img_main

        base = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        paths = {}
        for i, name in enumerate(("im1", "im2", "im3")):
            p = str(tmp_path / f"{name}.png")
            cv2.imwrite(p, np.roll(base, 2 * i, axis=1))
            paths[name] = p
        out = str(tmp_path / "pred.png")
        rc = img_main([
            "--im1", paths["im1"], "--im3", paths["im3"], "-o", out,
            "--gt", paths["im2"], "--fp32", "--no-pallas",
        ])
        assert rc == 0
        assert cv2.imread(out) is not None
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "psnr" in metrics and "ssim" in metrics

    def test_shape_mismatch_rejected(self, tmp_path, rng):
        from rrin_tpu.interp_image import main as img_main

        a = str(tmp_path / "a.png")
        b = str(tmp_path / "b.png")
        cv2.imwrite(a, (rng.random((64, 96, 3)) * 255).astype(np.uint8))
        cv2.imwrite(b, (rng.random((32, 96, 3)) * 255).astype(np.uint8))
        rc = img_main(["--im1", a, "--im3", b, "-o", str(tmp_path / "o.png")])
        assert rc == 2


class TestReviewRegressionsR3:
    """Round-3 review findings (resumable int8 sidecar lifecycle)."""

    def test_int8_job_with_no_device_work(self, video, params, tmp_path):
        """slowmo=1.0 retimes to the input timeline: every segment is a
        pure frame copy, no calibration ever runs and no sidecar is
        written — the post-segment sidecar load must tolerate that
        (used to raise FileNotFoundError)."""
        out = str(tmp_path / "copy_int8.mp4")
        manifest = interpolate_video_resumable(
            video, out, params, compute_dtype="float32",
            segment_pairs=4, int8=True, slowmo=1.0,
        )
        assert manifest["finished"]
        assert probe_video(out).frame_count == N
        assert not os.path.exists(out + ".calib.npz")

    def test_resume_with_different_int8_config_rejected(
        self, video, params, tmp_path
    ):
        """The quantization config is part of the job signature: a resume
        under different int8 settings must be rejected, not silently mix
        quantization grids across segments."""
        out = str(tmp_path / "seg_cfg.mp4")
        interpolate_video_resumable(
            video, out, params, compute_dtype="float32",
            segment_pairs=4, int8=True, keep_segments=True,
        )
        with pytest.raises(ValueError, match="different job config"):
            interpolate_video_resumable(
                video, out, params, compute_dtype="float32",
                segment_pairs=4, int8=True, int8_percentile=99.9,
            )

    def test_stale_sidecar_removed_on_fresh_job(
        self, video, params, tmp_path, monkeypatch
    ):
        """A sidecar left by a killed job must not impose its grid on a
        NEW job at the same output path (fresh manifest = fresh grid)."""
        import rrin_tpu.resumable as rs

        out = str(tmp_path / "fresh.mp4")
        sidecar = out + ".calib.npz"
        with open(sidecar, "wb") as f:
            f.write(b"stale garbage, must never be parsed")

        calls = []
        real = rs.interpolate_video

        def spy(*a, **kw):
            calls.append(kw.get("quant_stats"))
            return real(*a, **kw)

        monkeypatch.setattr(rs, "interpolate_video", spy)
        manifest = interpolate_video_resumable(
            video, out, params, compute_dtype="float32",
            segment_pairs=8, int8=True,
        )
        assert manifest["finished"]
        assert calls[0] is None  # first segment calibrated fresh
