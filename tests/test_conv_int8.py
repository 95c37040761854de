"""int8 packed conv kernels vs the fake-quant XLA references (interpret
mode on CPU; real-TPU numerics gated by bench.py selfcheck). The fallback
quantizes through the SAME symmetric int8 grid, so kernel-vs-fallback
differences are only int32-exact vs f32 accumulation."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_packed as cpk
from rrin_tpu.ops.conv_packed import (
    _conv_packed_xla,
    _conv_up_packed_xla,
    conv_packed,
    conv_up_packed,
)
from rrin_tpu.ops.packed import pack, pad_lanes


def _run_q(parts, w, b, off_out, slope, absmax):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_packed(parts, w, b, off_out, slope,
                               in_absmax=absmax)
    finally:
        cpk._FORCE_KERNEL = False


def _run_up_q(x, spec, real_c, w, b, off_out, slope, absmax):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_up_packed(x, spec, real_c, w, b, off_out, slope,
                                  in_absmax=absmax)
    finally:
        cpk._FORCE_KERNEL = False


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    peak = float(np.max(np.abs(np.asarray(b)))) or 1.0
    return 10 * np.log10(peak * peak / max(mse, 1e-20))


class TestConvPackedInt8:
    @pytest.mark.parametrize("p,k,cin,cout,off_in,off_out", [
        (4, 7, 32, 32, 2, 3),    # stem
        (2, 5, 32, 64, 1, 1),    # down1
        (1, 3, 256, 128, 0, 0),  # up2 conv1 / level 3
    ])
    def test_matches_fake_quant_reference(self, rng, p, k, cin, cout,
                                          off_in, off_out):
        h, m = 32, 16
        w_real = m * p - max(off_in, off_out) - 1
        x = jnp.asarray(rng.random((1, h, w_real, cin), dtype=np.float32))
        xp, spec = pack(x, p=p, off=off_in, m=m)
        wgt = jnp.asarray(
            (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.5
        )
        bias = jnp.asarray(rng.random(cout, dtype=np.float32) - 0.5)
        ax = (jnp.max(jnp.abs(x)),)
        got, _ = _run_q([(xp, spec, cin)], wgt, bias, off_out, 0.1, ax)
        want = _conv_packed_xla(
            [pad_lanes(xp, -(-spec.lanes // 128) * 128)], wgt, bias,
            (spec,), (cin,), off_out, 0.1, ax,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3
        )

    def test_dual_operand_scale_fold(self, rng):
        """Operands with very different ranges: the ax_i/ax_0 fold into
        the joint weight quantization must keep both accurate."""
        h, m, p, k = 32, 16, 2, 3
        w_real = 28
        a = jnp.asarray(rng.random((1, h, w_real, 16), dtype=np.float32))
        b = jnp.asarray(
            rng.random((1, h, w_real, 16), dtype=np.float32) * 37.0
        )
        ap, aspec = pack(a, p=p, off=1, m=m)
        bp, bspec = pack(b, p=p, off=1, m=m)
        wgt = jnp.asarray((rng.random((k, k, 32, 16), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(16, dtype=np.float32))
        ax = (jnp.max(jnp.abs(a)), jnp.max(jnp.abs(b)))
        parts = [(ap, aspec, 16), (bp, bspec, 16)]
        got, _ = _run_q(parts, wgt, bias, 0, 0.1, ax)
        want = _conv_packed_xla(
            [ap, bp], wgt, bias, (aspec, bspec), (16, 16), 0, 0.1, ax
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3
        )
        # and the int8 result must approximate the f32 conv decently
        full = _conv_packed_xla(
            [ap, bp], wgt, bias, (aspec, bspec), (16, 16), 0, 0.1
        )
        assert _psnr(got, full) > 30.0

    def test_int8_approximates_f32(self, rng):
        h, m, p, k = 32, 16, 4, 7
        x = jnp.asarray(rng.random((1, h, 52, 32), dtype=np.float32)) * 2 - 1
        xp, spec = pack(x, p=p, off=2, m=m)
        wgt = jnp.asarray(
            (rng.random((k, k, 32, 32), dtype=np.float32) - 0.5) * 0.3
        )
        bias = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        ax = (jnp.max(jnp.abs(x)),)
        got, _ = _run_q([(xp, spec, 32)], wgt, bias, 3, 0.1, ax)
        full = _conv_packed_xla(
            [xp], wgt, bias, (spec,), (32,), 3, 0.1
        )
        assert _psnr(got, full) > 32.0

    def test_guards_stay_zero(self, rng):
        h, m, p, k = 32, 16, 2, 3
        x = jnp.asarray(rng.random((1, h, 25, 8), dtype=np.float32))
        xp, spec = pack(x, p=p, off=2, m=m)
        wgt = jnp.asarray((rng.random((k, k, 8, 16), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(16, dtype=np.float32) + 3.0)
        ax = (jnp.max(jnp.abs(x)),)
        got, gspec = _run_q([(xp, spec, 8)], wgt, bias, 1, 0.1, ax)
        v = np.asarray(got).reshape(1, h, m * p, 16)
        assert (v[:, :, gspec.off + gspec.w :] == 0).all()


class TestConvUpPackedInt8:
    @pytest.mark.parametrize("p_in,k,cin,cout,off_in,off_out", [
        (1, 3, 128, 64, 0, 1),   # up3 conv1
        (2, 3, 64, 32, 0, 3),    # up4 conv1
    ])
    def test_matches_fake_quant_reference(self, rng, p_in, k, cin, cout,
                                          off_in, off_out):
        h_src, m = 16, 16
        w_real = m * p_in - off_in - 2
        x = jnp.asarray(rng.random((1, h_src, w_real, cin), dtype=np.float32))
        xp, spec = pack(x, p=p_in, off=off_in, m=m)
        wgt = jnp.asarray(
            (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.5
        )
        bias = jnp.asarray(rng.random(cout, dtype=np.float32) - 0.5)
        ax = jnp.max(jnp.abs(x))
        got, _ = _run_up_q(xp, spec, cin, wgt, bias, off_out, 0.1, ax)
        want = _conv_up_packed_xla(
            pad_lanes(xp, -(-spec.lanes // 128) * 128), wgt, bias, spec,
            cin, off_out, 0.1, ax,
        )
        # kernel quantizes rows built from the f32 window; the fallback
        # quantizes the f32 packed upsample: same grid, tiny rounding skew
        assert _psnr(got, want) > 40.0

    def test_int8_approximates_f32(self, rng):
        x = jnp.asarray(rng.random((1, 16, 28, 64), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=2, off=0, m=16)
        wgt = jnp.asarray(
            (rng.random((3, 3, 64, 32), dtype=np.float32) - 0.5) * 0.4
        )
        bias = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        ax = jnp.max(jnp.abs(x))
        got, _ = _run_up_q(xp, spec, 64, wgt, bias, 3, 0.1, ax)
        full = _conv_up_packed_xla(xp, wgt, bias, spec, 64, 3, 0.1)
        assert _psnr(got, full) > 32.0
