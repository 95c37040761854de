"""Packed-layout ops vs their NHWC references (ops/resize.py): the packed
U-Net segment must be numerically identical to the plain path on the
unpacked view, and every op must preserve the zero-guard invariant.

Layout recap: P halves per pooling level (4 -> 2 -> 1) so M is constant
and pool/upsample are pure lane ops (ops/packed.py docstring)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.ops.packed import (
    PackedSpec,
    avg_pool_2x_packed,
    concat_packed,
    pack,
    pad_lanes,
    unpack,
    upsample_2x_packed,
)
from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear


def _rand(rng, shape):
    return rng.random(shape, dtype=np.float32)


def _guards_zero(x, spec):
    """All storage slots outside [off, off+w) must be exactly zero."""
    b, h, m, lanes = x.shape
    v = np.asarray(x[..., : spec.lanes]).reshape(b, h, m * spec.p, spec.c)
    left = v[:, :, : spec.off, :]
    right = v[:, :, spec.off + spec.w :, :]
    return (left == 0).all() and (right == 0).all()


class TestPackUnpack:
    @pytest.mark.parametrize("off,m", [(0, 8), (3, 8), (6, 16)])
    def test_round_trip(self, rng, off, m):
        x = jnp.asarray(_rand(rng, (2, 4, 24, 5)))
        y, spec = pack(x, p=4, off=off, m=m)
        assert y.shape == (2, 4, m, 20)
        assert _guards_zero(y, spec)
        np.testing.assert_array_equal(np.asarray(unpack(y, spec)), np.asarray(x))

    def test_round_trip_p1(self, rng):
        """P=1 packed is NHWC with a padded width; unpack is a slice."""
        x = jnp.asarray(_rand(rng, (1, 4, 20, 7)))
        y, spec = pack(x, p=1, off=2, m=32)
        assert y.shape == (1, 4, 32, 7)
        np.testing.assert_array_equal(np.asarray(unpack(y, spec)), np.asarray(x))

    def test_channel_pad(self, rng):
        """c_pad zero-extends channels inside the same pack pad."""
        x = jnp.asarray(_rand(rng, (1, 2, 16, 6)))
        y, spec = pack(x, p=4, off=1, m=8, c_pad=32)
        assert y.shape[-1] == 128 and spec.c == 32
        np.testing.assert_array_equal(
            np.asarray(unpack(y, spec, c=6)), np.asarray(x)
        )
        # padded channels are zero
        assert (np.asarray(unpack(y, spec))[..., 6:] == 0).all()

    def test_unpack_drops_lane_padding(self, rng):
        x = jnp.asarray(_rand(rng, (1, 2, 16, 6)))
        y, spec = pack(x, p=4, off=2, m=8)
        y128 = pad_lanes(y, 128)
        assert y128.shape[-1] == 128
        np.testing.assert_array_equal(np.asarray(unpack(y128, spec)), np.asarray(x))


class TestPoolPacked:
    @pytest.mark.parametrize("p", [4, 2])
    @pytest.mark.parametrize("off", [0, 1, 2, 3])
    def test_matches_nhwc_pool(self, rng, p, off):
        if off >= p:
            pytest.skip("offset exceeds packing")
        x = jnp.asarray(_rand(rng, (2, 8, 40, 3)))
        m = (40 + off + p - 1) // p + 1
        y, spec = pack(x, p=p, off=off, m=m)
        z, zspec = avg_pool_2x_packed(y, spec)
        assert zspec.p == p // 2 and zspec.m == m and zspec.off == off // 2
        assert _guards_zero(z, zspec)
        want = np.asarray(avg_pool_2x(x))
        np.testing.assert_allclose(np.asarray(unpack(z, zspec)), want, atol=1e-6)

    def test_two_pools_to_p1(self, rng):
        """Level 0 -> 1 -> 2: P 4 -> 2 -> 1, M constant throughout."""
        x = jnp.asarray(_rand(rng, (1, 8, 48, 3)))
        y, spec = pack(x, p=4, off=3, m=14)
        z, zs = avg_pool_2x_packed(y, spec)
        z2, zs2 = avg_pool_2x_packed(z, zs)
        assert zs2 == PackedSpec(p=1, c=3, w=12, off=0, m=14)
        want = np.asarray(avg_pool_2x(avg_pool_2x(x)))
        np.testing.assert_allclose(np.asarray(unpack(z2, zs2)), want, atol=1e-6)


class TestUpsamplePacked:
    @pytest.mark.parametrize("p,off", [(2, 0), (2, 1), (1, 0), (1, 2)])
    def test_matches_nhwc_upsample(self, rng, p, off):
        x = jnp.asarray(_rand(rng, (2, 4, 20, 3)))
        m = (20 + off + p - 1) // p + 1
        y, spec = pack(x, p=p, off=off, m=m)
        z, zspec = upsample_2x_packed(y, spec)
        assert zspec.p == 2 * p and zspec.m == m and zspec.off == 2 * off
        assert _guards_zero(z, zspec)
        want = np.asarray(upsample_2x_bilinear(x))
        np.testing.assert_allclose(
            np.asarray(unpack(z, zspec)), want, atol=1e-6
        )


class TestConcatPacked:
    @pytest.mark.parametrize("p", [4, 2, 1])
    def test_matches_nhwc_concat(self, rng, p):
        a = jnp.asarray(_rand(rng, (1, 4, 24, 3)))
        b = jnp.asarray(_rand(rng, (1, 4, 24, 5)))
        off = min(2, p - 1)
        m = (24 + off + p - 1) // p
        pa, sa = pack(a, p=p, off=off, m=m)
        pb, sb = pack(b, p=p, off=off, m=m)
        z, sz = concat_packed(pa, sa, pb, sb)
        assert sz.c == 8 and sz.lanes == 8 * p
        assert _guards_zero(z, sz)
        want = np.concatenate([np.asarray(a), np.asarray(b)], axis=-1)
        np.testing.assert_array_equal(np.asarray(unpack(z, sz)), want)
