"""Unit parity tests for the ops layer vs PyTorch native kernels
(SURVEY.md §4 "Unit": warp vs grid_sample, pad round-trip, resize algebra)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rrin_tpu.ops import (
    avg_pool_2x,
    pad_to_multiple,
    unpad,
    upsample_2x_bilinear,
    warp_bilinear,
)
from rrin_tpu.oracle.torch_ref import warp as torch_warp


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(x: torch.Tensor) -> np.ndarray:
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


class TestPad:
    def test_round_trip(self, rng):
        x = rng.standard_normal((2, 37, 53, 3), dtype=np.float32)
        padded, hw = pad_to_multiple(jnp.asarray(x), 16)
        assert padded.shape == (2, 48, 64, 3)
        assert hw == (37, 53)
        out = unpad(padded, hw)
        np.testing.assert_array_equal(np.asarray(out), x)

    def test_already_multiple(self, rng):
        x = rng.standard_normal((1, 32, 48, 3), dtype=np.float32)
        padded, hw = pad_to_multiple(jnp.asarray(x), 16)
        assert padded.shape == x.shape

    def test_edge_replicate(self):
        x = jnp.ones((1, 15, 16, 1))
        padded, _ = pad_to_multiple(x, 16)
        np.testing.assert_allclose(np.asarray(padded[0, -1, :, 0]), 1.0)


class TestResize:
    def test_avg_pool_matches_torch(self, rng):
        x = rng.standard_normal((2, 16, 24, 5), dtype=np.float32)
        got = np.asarray(avg_pool_2x(jnp.asarray(x)))
        want = _nhwc(F.avg_pool2d(_nchw(x), 2))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("hw", [(8, 8), (7, 9), (16, 24)])
    def test_upsample_matches_torch_bilinear(self, rng, hw):
        h, w = hw
        x = rng.standard_normal((2, h, w, 3), dtype=np.float32)
        got = np.asarray(upsample_2x_bilinear(jnp.asarray(x)))
        want = _nhwc(
            F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWarp:
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch_grid_sample(self, rng, align_corners):
        b, h, w, c = 2, 33, 49, 3
        img = rng.random((b, h, w, c), dtype=np.float32)
        flow = (rng.standard_normal((b, h, w, 2)) * 3.0).astype(np.float32)
        got = np.asarray(
            warp_bilinear(jnp.asarray(img), jnp.asarray(flow), align_corners=align_corners)
        )
        want = _nhwc(
            torch_warp(_nchw(img), _nchw(flow), align_corners=align_corners)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_zero_flow_roundtrip_align_true(self, rng):
        # align_corners=True with zero flow is the identity.
        img = rng.random((1, 17, 21, 3), dtype=np.float32)
        flow = np.zeros((1, 17, 21, 2), dtype=np.float32)
        got = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow), align_corners=True))
        np.testing.assert_allclose(got, img, atol=1e-6)

    def test_large_out_of_bounds_flow(self, rng):
        # Arbitrary-magnitude flow must be correct (zeros outside), not crash.
        img = rng.random((1, 16, 16, 3), dtype=np.float32)
        flow = np.full((1, 16, 16, 2), 100.0, dtype=np.float32)
        got = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, 0.0, atol=1e-7)

    def test_integer_shift(self, rng):
        # align_corners=True + integer flow == exact index shift.
        img = rng.random((1, 8, 8, 1), dtype=np.float32)
        flow = np.zeros((1, 8, 8, 2), dtype=np.float32)
        flow[..., 0] = 2.0  # sample from x+2
        got = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow), align_corners=True))
        np.testing.assert_allclose(got[0, :, :6], img[0, :, 2:], atol=1e-6)
        np.testing.assert_allclose(got[0, :, 6:], 0.0, atol=1e-7)
