"""M-doubling fused upsample+conv kernel (the l3->l2 re-entry) vs the
unpack -> upsample_2x_bilinear -> XLA-conv -> repack reference (interpret
mode on CPU; real-TPU execution covered by bench.py selfcheck and the
verify drives). Covers the real u2 site geometry, nonzero output offsets,
H-padded source arrays, bf16, batch, guards, and the int8 paths."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_packed as cpk
from rrin_tpu.ops.conv_packed import (
    _conv_up_m_xla,
    conv_up_m_packed,
    supports_up_m,
)
from rrin_tpu.ops.packed import PackedSpec, pack, pad_lanes, unpack


def _run_kernel(x, spec, real_c, w, b, m_out, off_out, h_src, slope,
                absmax=None, out_absmax=None):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_up_m_packed(
                x, spec, real_c, w, b, m_out, off_out, h_src, slope,
                in_absmax=absmax, out_absmax=out_absmax,
            )
    finally:
        cpk._FORCE_KERNEL = False


def _ref(x, spec, real_c, w, b, m_out, off_out, h_src, slope,
         absmax=None, out_absmax=None):
    xp = pad_lanes(x, -(-spec.lanes // 128) * 128)
    return _conv_up_m_xla(xp, w, b, spec, real_c, m_out, off_out, h_src,
                          slope, absmax, out_absmax)


def _case(rng, h_src, w_real, cin, cout, k, m_src, dtype=jnp.float32,
          h_pad=0):
    x = jnp.asarray(
        rng.random((1, h_src, w_real, cin), dtype=np.float32), dtype
    )
    if h_pad:
        x = jnp.pad(x, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
    xp, spec = pack(x, p=1, off=0, m=m_src)
    spec = PackedSpec(p=1, c=cin, w=w_real, off=0, m=m_src)
    wgt = jnp.asarray(
        (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.5, dtype
    )
    bias = jnp.asarray((rng.random(cout, dtype=np.float32) - 0.5),
                       jnp.float32)
    return xp, spec, wgt, bias


def _psnr(a, b):
    mse = float(np.mean(
        (np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    peak = float(np.max(np.abs(np.asarray(b)))) or 1.0
    return 10 * np.log10(peak * peak / max(mse, 1e-20))


# (k, cin, cout, m_src, m_out, off_out) — the real u2 site plus variants.
UM_SITES = [
    (3, 256, 128, 16, 32, 0),   # u2 conv1 geometry (small): off_out=_PK
    (3, 256, 128, 16, 40, 2),   # nonzero output offset
    (3, 64, 64, 16, 33 // 8 * 8 + 8, 1),  # smaller channels
    (5, 128, 64, 16, 42 // 8 * 8 + 8, 0),  # k=5
]


class TestConvUpMPackedParity:
    @pytest.mark.parametrize("k,cin,cout,m_src,m_out,off_out", UM_SITES)
    def test_matches_reference(self, rng, k, cin, cout, m_src, m_out,
                               off_out):
        h_src = 16
        w_real = m_src - 2
        xp, spec, wgt, bias = _case(rng, h_src, w_real, cin, cout, k, m_src)
        assert supports_up_m(spec, k, cout, h_src, m_out, off_out)
        got, gspec = _run_kernel(
            xp, spec, cin, wgt, bias, m_out, off_out, h_src, 0.1
        )
        want = _ref(xp, spec, cin, wgt, bias, m_out, off_out, h_src, 0.1)
        assert gspec == PackedSpec(
            p=1, c=cout, w=2 * w_real, off=off_out, m=m_out
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_h_padded_source_rows_never_read(self, rng):
        """The source array may carry H-pad rows past h_src (the padded
        level-3 path); results must match the unpadded reference."""
        h_src, m_src, m_out = 16, 16, 32
        xp, spec, wgt, bias = _case(rng, h_src, 14, 128, 64, 3, m_src)
        xp_pad = jnp.concatenate(
            [xp, jnp.full((1, 8) + xp.shape[2:], 7.0, xp.dtype)], axis=1
        )  # garbage pad rows: must never be read
        got, _ = _run_kernel(
            xp_pad, spec, 128, wgt, bias, m_out, 0, h_src, 0.1
        )
        want = _ref(xp, spec, 128, wgt, bias, m_out, 0, h_src, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_taller_interior_blocks(self, rng):
        xp, spec, wgt, bias = _case(rng, 32, 14, 128, 64, 3, 16)
        got, _ = _run_kernel(xp, spec, 128, wgt, bias, 32, 0, 32, 0.1)
        want = _ref(xp, spec, 128, wgt, bias, 32, 0, 32, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_batch(self, rng):
        x = jnp.asarray(rng.random((3, 16, 14, 128), dtype=np.float32))
        xp, spec = pack(x, p=1, off=0, m=16)
        wgt = jnp.asarray(
            (rng.random((3, 3, 128, 64), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(64, dtype=np.float32))
        got, _ = _run_kernel(xp, spec, 128, wgt, bias, 32, 0, 16, 0.1)
        want = _ref(xp, spec, 128, wgt, bias, 32, 0, 16, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_bf16(self, rng):
        xp, spec, wgt, bias = _case(
            rng, 16, 14, 128, 64, 3, 16, dtype=jnp.bfloat16
        )
        got, _ = _run_kernel(xp, spec, 128, wgt, bias, 32, 0, 16, 0.1)
        want = _ref(xp, spec, 128, wgt, bias, 32, 0, 16, 0.1)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05, rtol=0.05,
        )

    def test_output_guards_zero(self, rng):
        xp, spec, wgt, bias = _case(rng, 16, 14, 128, 64, 3, 16)
        bias = bias + 3.0  # nonzero conv output everywhere
        got, gspec = _run_kernel(xp, spec, 128, wgt, bias, 40, 2, 16, 0.1)
        v = np.asarray(got)
        assert (v[:, :, : gspec.off] == 0).all()
        assert (v[:, :, gspec.off + gspec.w:] == 0).all()

    def test_matches_nhwc_chain(self, rng):
        """Fused result must equal plain upsample_2x_bilinear -> conv on
        the unpacked view (the semantics the U-Net math is defined in)."""
        from rrin_tpu.ops.conv_phase import _conv_xla
        from rrin_tpu.ops.resize import upsample_2x_bilinear

        x = jnp.asarray(rng.random((1, 16, 14, 128), dtype=np.float32))
        xp, spec = pack(x, p=1, off=0, m=16)
        wgt = jnp.asarray(
            (rng.random((3, 3, 128, 64), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(64, dtype=np.float32))
        got, gspec = _run_kernel(xp, spec, 128, wgt, bias, 32, 0, 16, 0.1)
        want = _conv_xla(upsample_2x_bilinear(x), wgt, bias, 0.1)
        np.testing.assert_allclose(
            np.asarray(unpack(got, gspec)), np.asarray(want),
            atol=3e-4, rtol=3e-4,
        )


class TestConvUpMInt8:
    def test_matches_fake_quant_reference(self, rng):
        xp, spec, wgt, bias = _case(rng, 16, 14, 256, 128, 3, 16)
        ax = jnp.max(jnp.abs(xp)).astype(jnp.float32)
        got, _ = _run_kernel(
            xp, spec, 256, wgt, bias, 32, 0, 16, 0.1, absmax=ax
        )
        want = _ref(
            xp, spec, 256, wgt, bias, 32, 0, 16, 0.1, absmax=ax
        )
        assert _psnr(got, want) > 40.0

    def test_int8_input_and_output(self, rng):
        x = jnp.asarray(rng.random((1, 16, 14, 128), dtype=np.float32)) - 0.5
        xp, spec = pack(x, p=1, off=0, m=16)
        ax = jnp.max(jnp.abs(x))
        xq = jnp.clip(jnp.round(xp.astype(jnp.float32) * (127.0 / ax)),
                      -127, 127).astype(jnp.int8)
        wgt = jnp.asarray(
            (rng.random((3, 3, 128, 64), dtype=np.float32) - 0.5) * 0.4
        )
        bias = jnp.asarray(rng.random(64, dtype=np.float32) - 0.5)
        got, _ = _run_kernel(xq, spec, 128, wgt, bias, 32, 0, 16, 0.1,
                             absmax=ax)
        want = _ref(xq, spec, 128, wgt, bias, 32, 0, 16, 0.1, absmax=ax)
        assert _psnr(got, want) > 40.0
        # int8-out from an int8-in fused upsample conv: exact grid match
        oax = jnp.float32(8.0)
        gq, _ = _run_kernel(xq, spec, 128, wgt, bias, 32, 0, 16, 0.1,
                            absmax=ax, out_absmax=oax)
        wq = _ref(xq, spec, 128, wgt, bias, 32, 0, 16, 0.1, absmax=ax,
                  out_absmax=oax)
        assert np.asarray(gq).dtype == np.int8
        assert (np.abs(np.asarray(gq, np.int32)
                       - np.asarray(wq, np.int32)) <= 1).all()
