"""Fused pool+conv kernel vs avg_pool_2x_packed + conv (interpret mode on
CPU; real-TPU numerics gated by bench.py selfcheck)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_packed as cpk
from rrin_tpu.ops.conv_packed import (
    _conv_pool_packed_xla,
    conv_pool_packed,
    supports_pool,
)
from rrin_tpu.ops.packed import pack, pad_lanes


def _run(x, spec, real_c, w, b, off_out, slope, absmax=None, oax=None,
         out_dtype=None):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_pool_packed(x, spec, real_c, w, b, off_out, slope,
                                    in_absmax=absmax, out_absmax=oax,
                                    out_dtype=out_dtype)
    finally:
        cpk._FORCE_KERNEL = False


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    peak = float(np.max(np.abs(np.asarray(b)))) or 1.0
    return 10 * np.log10(peak * peak / max(mse, 1e-20))


class TestConvPoolPacked:
    @pytest.mark.parametrize("p,k,cin,cout,off_in,off_out", [
        (4, 5, 32, 64, 3, 1),   # d1c1: s1@3 -> pool(P=2)@1 -> conv5 ->1
        (2, 3, 64, 128, 1, 0),  # d2c1: s2@1 -> pool(P=1)@0 -> conv3 ->0
        (4, 3, 32, 32, 2, 0),   # d=0 (even offset) pairing
    ])
    def test_matches_pool_then_conv(self, rng, p, k, cin, cout, off_in,
                                    off_out):
        h_src, m = 64, 16
        w_real = m * p - off_in - (1 + (off_in + 1) % 2)  # keep w even
        x = jnp.asarray(rng.random((1, h_src, w_real, cin), dtype=np.float32))
        xp, spec = pack(x, p=p, off=off_in, m=m)
        assert supports_pool(spec, k, cout, h_src), (spec, k)
        wgt = jnp.asarray(
            (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.4
        )
        bias = jnp.asarray(rng.random(cout, dtype=np.float32) - 0.5)
        got, gs = _run(xp, spec, cin, wgt, bias, off_out, 0.1)
        want = _conv_pool_packed_xla(
            pad_lanes(xp, -(-spec.lanes // 128) * 128), wgt, bias, spec,
            cin, off_out, 0.1,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )
        assert gs.p == p // 2 and gs.m == m and gs.w == spec.w // 2

    def test_int8_matches_fallback(self, rng):
        p, k, cin, cout = 4, 5, 32, 64
        h_src, m = 64, 16
        x = jnp.asarray(rng.random((1, h_src, 58, cin), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=p, off=3, m=m)
        wgt = jnp.asarray(
            (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.4
        )
        bias = jnp.asarray(rng.random(cout, dtype=np.float32))
        ax = jnp.max(jnp.abs(x))
        got, _ = _run(xp, spec, cin, wgt, bias, 1, 0.1, absmax=ax)
        want = _conv_pool_packed_xla(
            pad_lanes(xp, -(-spec.lanes // 128) * 128), wgt, bias, spec,
            cin, 1, 0.1, ax,
        )
        assert _psnr(got, want) > 40.0

    def test_carried_int8_in_and_out(self, rng):
        p, k, cin, cout = 2, 3, 64, 64
        h_src, m = 64, 16
        x = jnp.asarray(rng.random((1, h_src, 30, cin), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=p, off=1, m=m)
        ax = jnp.max(jnp.abs(x))
        xq = jnp.clip(jnp.round(xp.astype(jnp.float32) * (127.0 / ax)),
                      -127, 127).astype(jnp.int8)
        wgt = jnp.asarray(
            (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.4
        )
        bias = jnp.asarray(rng.random(cout, dtype=np.float32))
        oax = jnp.float32(6.0)
        got, _ = _run(xq, spec, cin, wgt, bias, 0, 0.1, absmax=ax, oax=oax)
        assert np.asarray(got).dtype == np.int8
        want = _conv_pool_packed_xla(xq, wgt, bias, spec, cin, 0, 0.1,
                                     ax, oax)
        assert (np.abs(np.asarray(got, np.int32)
                       - np.asarray(want, np.int32)) <= 1).all()

    def test_guards_stay_zero(self, rng):
        p, k = 4, 5
        h_src, m = 64, 16
        x = jnp.asarray(rng.random((1, h_src, 40, 32), dtype=np.float32))
        xp, spec = pack(x, p=p, off=3, m=m)
        wgt = jnp.asarray((rng.random((k, k, 32, 32), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(32, dtype=np.float32) + 3.0)
        got, gs = _run(xp, spec, 32, wgt, bias, 1, 0.1)
        v = np.asarray(got).reshape(1, h_src // 2, m * gs.p, 32)
        assert (v[:, :, gs.off + gs.w:] == 0).all()
        assert (v[:, :, :gs.off] == 0).all()

    def test_supports_gate(self):
        from rrin_tpu.ops.packed import PackedSpec

        ok = PackedSpec(p=4, c=32, w=56, off=3, m=16)
        assert supports_pool(ok, 5, 64, 64)
        assert not supports_pool(ok, 5, 64, 24)  # window too tall
        assert not supports_pool(
            PackedSpec(p=1, c=128, w=14, off=0, m=16), 3, 64, 64
        )  # P=1 cannot halve
        assert not supports_pool(
            PackedSpec(p=4, c=32, w=55, off=3, m=16), 5, 64, 64
        )  # odd width
