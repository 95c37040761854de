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


def _run_q_out(parts, w, b, off_out, slope, absmax, out_absmax,
               out_dtype=None):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_packed(parts, w, b, off_out, slope,
                               in_absmax=absmax, out_absmax=out_absmax,
                               out_dtype=out_dtype)
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


class TestCarriedInt8:
    """Quant-out epilogue + already-int8 operands: the carried-int8 chain
    (producer emits int8 on its own grid, consumer skips the quantize
    pass) must match the XLA fake-quant fallback doing the same."""

    def test_quant_out_matches_fallback(self, rng):
        h, m, p, k = 32, 16, 2, 3
        x = jnp.asarray(rng.random((1, h, 28, 32), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=p, off=1, m=m)
        wgt = jnp.asarray((rng.random((k, k, 32, 16), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(16, dtype=np.float32))
        ax = (jnp.max(jnp.abs(x)),)
        oax = jnp.float32(3.0)
        got, _ = _run_q_out([(xp, spec, 32)], wgt, bias, 0, 0.1, ax, oax)
        assert np.asarray(got).dtype == np.int8
        want = _conv_packed_xla(
            [xp], wgt, bias, (spec,), (32,), 0, 0.1, ax, oax,
        )
        assert np.asarray(want).dtype == np.int8
        np.testing.assert_array_equal(
            np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
            <= 1,  # int32-exact vs f32 accumulation can shift one grid step
            True,
        )

    def test_int8_chain_kernel_vs_fallback(self, rng):
        """conv1 (quant-out) -> conv2 (int8-in): full carried chain."""
        h, m, p, k = 32, 16, 2, 3
        x = jnp.asarray(rng.random((1, h, 28, 16), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=p, off=1, m=m)
        w1 = jnp.asarray((rng.random((k, k, 16, 16), dtype=np.float32) - 0.5))
        b1 = jnp.asarray(rng.random(16, dtype=np.float32) * 0.1)
        w2 = jnp.asarray((rng.random((k, k, 16, 16), dtype=np.float32) - 0.5))
        b2 = jnp.asarray(rng.random(16, dtype=np.float32) * 0.1)
        ax = jnp.max(jnp.abs(x))
        a1 = jnp.float32(4.0)  # calibrated |y1| bound

        def chain(runner):
            y1, s1 = runner([(xp, spec, 16)], w1, b1, 0, 0.1, (ax,), a1)
            assert np.asarray(y1).dtype == np.int8
            return runner([(y1, s1, 16)], w2, b2, 1, 0.1, (a1,), None,
                          out_dtype=jnp.float32)

        def kern(parts, w, b, off, slope, am, oam, out_dtype=None):
            return _run_q_out(parts, w, b, off, slope, am, oam,
                              out_dtype=out_dtype)

        def fall(parts, w, b, off, slope, am, oam, out_dtype=None):
            xs = [pad_lanes(x_, -(-s_.lanes // 128) * 128)
                  for x_, s_, _ in parts]
            specs = tuple(s_ for _, s_, _ in parts)
            rcs = tuple(rc for _, _, rc in parts)
            y = _conv_packed_xla(xs, w, b, specs, rcs, off, slope,
                                 am, oam, out_dtype)
            from rrin_tpu.ops.packed import PackedSpec
            os_ = PackedSpec(p=specs[0].p, c=w.shape[3], w=specs[0].w,
                             off=off, m=specs[0].m)
            return y, os_

        got, _ = chain(kern)
        want, _ = chain(fall)
        assert _psnr(got, want) > 40.0

    def test_conv_up_int8_input(self, rng):
        x = jnp.asarray(rng.random((1, 16, 28, 64), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=2, off=0, m=16)
        ax = jnp.max(jnp.abs(x))
        # quantize on the grid by hand: the carried producer's output
        xq = jnp.clip(jnp.round(xp.astype(jnp.float32) * (127.0 / ax)),
                      -127, 127).astype(jnp.int8)
        wgt = jnp.asarray(
            (rng.random((3, 3, 64, 32), dtype=np.float32) - 0.5) * 0.4
        )
        bias = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        got, _ = _run_up_q(xq, spec, 64, wgt, bias, 3, 0.1, ax)
        want = _conv_up_packed_xla(xq, wgt, bias, spec, 64, 3, 0.1, ax)
        assert _psnr(got, want) > 40.0
        # and int8-out from an int8-in upsample conv
        oax = jnp.float32(8.0)
        cpk._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                gq, _ = conv_up_packed(xq, spec, 64, wgt, bias, 3, 0.1,
                                       in_absmax=ax, out_absmax=oax)
        finally:
            cpk._FORCE_KERNEL = False
        wq = _conv_up_packed_xla(xq, wgt, bias, spec, 64, 3, 0.1, ax, oax)
        assert np.asarray(gq).dtype == np.int8
        assert (np.abs(np.asarray(gq, np.int32)
                       - np.asarray(wq, np.int32)) <= 1).all()


class TestOutDtype:
    def test_out_dtype_epilogue_cast_only(self, rng):
        """out_dtype != input dtype: the window/B2 stay in the input
        dtype (the DMA source dtype) and only the epilogue casts."""
        h, m, p, k = 32, 16, 2, 3
        x = jnp.asarray(rng.random((1, h, 28, 32), dtype=np.float32),
                        jnp.bfloat16)
        xp, spec = pack(x, p=p, off=1, m=m)
        wgt = jnp.asarray((rng.random((k, k, 32, 16), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(16, dtype=np.float32))
        cpk._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got, _ = conv_packed([(xp, spec, 32)], wgt, bias, 0, 0.1,
                                     out_dtype=jnp.float32)
                ref, _ = conv_packed([(xp, spec, 32)], wgt, bias, 0, 0.1)
        finally:
            cpk._FORCE_KERNEL = False
        assert np.asarray(got).dtype == np.float32
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref, np.float32), atol=1e-2,
            rtol=1e-2,
        )
