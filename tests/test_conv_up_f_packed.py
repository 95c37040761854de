"""Phase-folded fused upsample+conv kernel (the generation-2 up3/up4
fast path) vs the upsample_2x_bilinear -> XLA-conv reference (float is an
EXACT fold, validated ~1e-6) and the mirrored fake-quant fallback (int8).
Covers both real site geometries (P=1 off 0->1 and P=2 off 0->3), odd and
even output offsets, batch, bf16, the int8-in/int8-out carried path, and
the guard/edge handling (clamped W/H edges + corners are exact by
construction). Real-TPU execution is covered by bench.py selfcheck and
the verify drives."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_packed as cpk
from rrin_tpu.ops.conv_packed import (
    _conv_up_f_xla,
    conv_up_f_packed,
    supports_up_f,
)
from rrin_tpu.ops.conv_phase import _conv_xla
from rrin_tpu.ops.packed import PackedSpec, pack, unpack
from rrin_tpu.ops.resize import upsample_2x_bilinear


def _run_kernel(x, spec, real_c, w, b, off_out, slope,
                absmax=None, out_absmax=None):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_up_f_packed(
                x, spec, real_c, w, b, off_out, slope,
                in_absmax=absmax, out_absmax=out_absmax,
            )
    finally:
        cpk._FORCE_KERNEL = False


def _psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    peak = float(np.max(np.abs(b))) or 1.0
    return 10 * np.log10(peak * peak / max(mse, 1e-20))


# (p, c, cout, off_in, off_out, m, w_real, h_src) — the two real sites
# (u3c1: P=1 off 0->1, u4c1: P=2 off 0->3) plus offset variants.
SITES = [
    (1, 128, 64, 0, 1, 40, 38, 16),   # u3c1 geometry (odd off_out)
    (2, 64, 32, 0, 3, 40, 36, 16),    # u4c1 geometry (odd off_out)
    (2, 64, 32, 1, 2, 40, 30, 16),    # even off_out, nonzero off_in
    (1, 128, 64, 2, 0, 40, 30, 16),   # off_in > off_out
]


def _case(rng, p, c, cout, off_in, m, w_real, h_src, batch=1,
          dtype=jnp.float32):
    x = jnp.asarray(
        rng.random((batch, h_src, w_real, c), dtype=np.float32) - 0.5, dtype
    )
    xp, spec = pack(x, p, off_in, m)
    w = jnp.asarray(
        (rng.random((3, 3, c, cout), dtype=np.float32) - 0.5) * 0.3, dtype
    )
    b = jnp.asarray((rng.random(cout, dtype=np.float32) - 0.5), jnp.float32)
    return x, xp, spec, w, b


class TestConvUpFParity:
    @pytest.mark.parametrize("p,c,cout,off_in,off_out,m,w_real,h", SITES)
    def test_float_matches_upsample_conv(self, rng, p, c, cout, off_in,
                                         off_out, m, w_real, h):
        x, xp, spec, w, b = _case(rng, p, c, cout, off_in, m, w_real, h)
        assert supports_up_f(spec, 3, cout, h, off_out)
        ref = _conv_xla(upsample_2x_bilinear(x), w, b, 0.1)
        got, ospec = _run_kernel(xp, spec, c, w, b, off_out, 0.1)
        assert got.shape == (1, 2 * h, m, 2 * p * cout)
        assert _psnr(unpack(got, ospec), ref) > 100

    def test_batch_and_bf16(self, rng):
        p, c, cout, off_in, off_out, m, w_real, h = SITES[1]
        x, xp, spec, w, b = _case(rng, p, c, cout, off_in, m, w_real, h,
                                  batch=2, dtype=jnp.bfloat16)
        ref = _conv_xla(upsample_2x_bilinear(x.astype(jnp.float32)),
                        w.astype(jnp.float32), b, 0.1)
        got, ospec = _run_kernel(xp, spec, c, w, b, off_out, 0.1)
        assert got.dtype == jnp.bfloat16
        assert _psnr(unpack(got.astype(jnp.float32), ospec), ref) > 35

    def test_fallback_float_matches_upsample_conv(self, rng):
        p, c, cout, off_in, off_out, m, w_real, h = SITES[0]
        x, xp, spec, w, b = _case(rng, p, c, cout, off_in, m, w_real, h)
        ref = _conv_xla(upsample_2x_bilinear(x), w, b, 0.1)
        got = _conv_up_f_xla(xp, w, b, spec, c, off_out, 0.1)
        ospec = PackedSpec(p=2 * p, c=cout, w=2 * w_real, off=off_out, m=m)
        assert _psnr(unpack(got, ospec), ref) > 100

    @pytest.mark.parametrize("p,c,cout,off_in,off_out,m,w_real,h",
                             SITES[:2])
    def test_int8_in_out_matches_fallback(self, rng, p, c, cout, off_in,
                                          off_out, m, w_real, h):
        """Carried int8 input + int8 epilogue: the kernel's int32-exact
        dots vs the mirrored f32 fake-quant fallback."""
        x, xp, spec, w, b = _case(rng, p, c, cout, off_in, m, w_real, h)
        ax = jnp.max(jnp.abs(x))
        xq = jnp.clip(jnp.round(xp * (127.0 / ax)), -127, 127).astype(
            jnp.int8
        )
        oax = jnp.float32(8.0)
        got, _ = _run_kernel(xq, spec, c, w, b, off_out, 0.1,
                             absmax=ax, out_absmax=oax)
        assert got.dtype == jnp.int8
        ref = _conv_up_f_xla(xq, w, b, spec, c, off_out, 0.1, ax, oax)
        # The kernel's dots are int32-exact; the fallback accumulates the
        # same math in f32 — outputs landing exactly on a rounding tie
        # (.5 on the int8 grid) can flip by 1 code depending on the f32
        # summation order XLA picks (observed order-dependent under a
        # full-suite run: ~7e-5 of codes off by 1, 82.9 dB). Assert
        # tie-tolerant: codes match except for a tiny fraction of +-1s.
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 1e-3

    def test_int8_quality_vs_float(self, rng):
        p, c, cout, off_in, off_out, m, w_real, h = SITES[1]
        x, xp, spec, w, b = _case(rng, p, c, cout, off_in, m, w_real, h)
        ref = _conv_xla(upsample_2x_bilinear(x), w, b, 0.1)
        ax = jnp.max(jnp.abs(x))
        got, ospec = _run_kernel(xp, spec, c, w, b, off_out, 0.1, absmax=ax)
        assert got.dtype == jnp.float32
        assert _psnr(unpack(got, ospec), ref) > 35

    def test_supports_gate(self):
        sp = PackedSpec(p=1, c=128, w=38, off=0, m=40)
        assert supports_up_f(sp, 3, 64, 16, 1)
        assert not supports_up_f(sp, 5, 64, 16, 1)      # k != 3
        assert not supports_up_f(sp, 3, 64, 12, 1)      # h < WIN_SRC
        assert not supports_up_f(sp, 3, 300, 16, 1)     # lout > 4 tiles
        bad = PackedSpec(p=1, c=96, w=38, off=0, m=40)  # lane padding
        assert not supports_up_f(bad, 3, 64, 16, 1)
