"""Native framepack library: build, correctness vs numpy, fallback."""

import numpy as np
import pytest

from rrin_tpu import native


class TestNative:
    def test_builds_in_this_env(self):
        # g++ is baked into the image; the library must build here.
        assert native.available(), "libframepack.so failed to build/load"

    def test_swap_rb_matches_numpy(self, rng):
        frame = (rng.random((256, 448, 3)) * 255).astype(np.uint8)
        got = native.swap_rb(frame)
        np.testing.assert_array_equal(got, frame[:, :, ::-1])

    def test_swap_rb_large_threaded(self, rng):
        frame = (rng.random((1088, 1920, 3)) * 255).astype(np.uint8)
        got = native.swap_rb(frame, threads=4)
        np.testing.assert_array_equal(got, frame[:, :, ::-1])

    def test_pack_pair(self, rng):
        prev = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        cur = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        batch = np.zeros((2, 2, 64, 96, 3), np.uint8)
        ok = native.pack_pair_bgr(prev, cur, batch, slot=1)
        if not ok:
            pytest.skip("native lib unavailable")
        np.testing.assert_array_equal(batch[1, 0], prev[:, :, ::-1])
        np.testing.assert_array_equal(batch[1, 1], cur[:, :, ::-1])
        assert not batch[0].any()

    def test_non_contiguous_falls_back(self, rng):
        frame = (rng.random((64, 96, 6)) * 255).astype(np.uint8)[:, :, ::2]
        got = native.swap_rb(frame)
        np.testing.assert_array_equal(got, frame[:, :, ::-1])
