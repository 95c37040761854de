"""Fused upsample+conv kernel vs the upsample_2x_packed -> XLA-conv
reference (interpret mode on CPU; real-TPU execution covered by bench.py
selfcheck and the verify drives). Covers the two U-Net sites (up3/up4),
generic k=5, batch, bf16, H-edge clamp rows, and the guard invariant."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_packed as cpk
from rrin_tpu.ops.conv_packed import (
    _conv_up_packed_xla,
    conv_up_packed,
    supports_up,
)
from rrin_tpu.ops.packed import PackedSpec, pack, pad_lanes


def _run_kernel(x, spec, real_c, w, b, off_out, slope):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_up_packed(x, spec, real_c, w, b, off_out, slope)
    finally:
        cpk._FORCE_KERNEL = False


def _ref(x, spec, real_c, w, b, off_out, slope):
    xp = pad_lanes(x, -(-spec.lanes // 128) * 128)
    return _conv_up_packed_xla(xp, w, b, spec, real_c, off_out, slope)


def _case(rng, h_src, w_real, cin, cout, k, off_in, m, p_in,
          dtype=jnp.float32):
    x = jnp.asarray(
        rng.random((1, h_src, w_real, cin), dtype=np.float32), dtype
    )
    xp, spec = pack(x, p=p_in, off=off_in, m=m)
    wgt = jnp.asarray(
        (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.5, dtype
    )
    bias = jnp.asarray((rng.random(cout, dtype=np.float32) - 0.5), jnp.float32)
    return xp, spec, wgt, bias


# (p_in, k, cin, cout, off_in, off_out) — the two fused up sites of the
# plan in models/unet.py plus generic variants.
UP_SITES = [
    (1, 3, 128, 64, 0, 1),   # up3 conv1: level2 P=1 -> level1 P=2, s=-1
    (2, 3, 64, 32, 0, 3),    # up4 conv1: level1 P=2 -> level0 P=4, s=-1
    (1, 3, 128, 64, 2, 1),   # nonzero input offset
    (2, 5, 64, 32, 1, 0),    # k=5 generic (s = (2-2-0)/4 = 0)
    (1, 5, 128, 32, 0, 2),   # k=5 at P_out=2
]


class TestConvUpPackedParity:
    @pytest.mark.parametrize("p_in,k,cin,cout,off_in,off_out", UP_SITES)
    def test_matches_reference(self, rng, p_in, k, cin, cout, off_in,
                               off_out):
        h_src, m = 16, 16
        w_real = (m * p_in) - off_in - 2
        xp, spec, wgt, bias = _case(
            rng, h_src, w_real, cin, cout, k, off_in, m, p_in
        )
        assert supports_up(spec, k, cout, 2 * h_src)
        got, gspec = _run_kernel(xp, spec, cin, wgt, bias, off_out, 0.1)
        want = _ref(xp, spec, cin, wgt, bias, off_out, 0.1)
        assert gspec == PackedSpec(
            p=2 * p_in, c=cout, w=2 * w_real, off=off_out, m=m
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_taller_interior_blocks(self, rng):
        """h_src > WIN_SRC exercises the clamped window start on interior
        and bottom blocks."""
        xp, spec, wgt, bias = _case(rng, 32, 28, 64, 32, 3, 0, 16, 2)
        got, _ = _run_kernel(xp, spec, 64, wgt, bias, 3, 0.1)
        want = _ref(xp, spec, 64, wgt, bias, 3, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_batch(self, rng):
        x = jnp.asarray(rng.random((3, 16, 28, 64), dtype=np.float32))
        xp, spec = pack(x, p=2, off=0, m=16)
        wgt = jnp.asarray((rng.random((3, 3, 64, 32), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(32, dtype=np.float32))
        got, _ = _run_kernel(xp, spec, 64, wgt, bias, 3, 0.1)
        want = _ref(xp, spec, 64, wgt, bias, 3, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_bf16(self, rng):
        xp, spec, wgt, bias = _case(
            rng, 16, 28, 64, 32, 3, 0, 16, 2, dtype=jnp.bfloat16
        )
        got, _ = _run_kernel(xp, spec, 64, wgt, bias, 3, 0.1)
        want = _ref(xp, spec, 64, wgt, bias, 3, 0.1)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05, rtol=0.05,
        )

    def test_no_activation(self, rng):
        xp, spec, wgt, bias = _case(rng, 16, 28, 64, 32, 3, 0, 16, 2)
        got, _ = _run_kernel(xp, spec, 64, wgt, bias, 3, None)
        want = _ref(xp, spec, 64, wgt, bias, 3, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4
        )

    def test_output_guards_zero(self, rng):
        xp, spec, wgt, bias = _case(rng, 16, 28, 64, 16, 3, 0, 16, 2)
        bias = bias + 3.0  # nonzero conv output everywhere
        got, gspec = _run_kernel(xp, spec, 64, wgt, bias, 3, 0.1)
        v = np.asarray(got).reshape(1, 32, 16 * 4, 16)
        assert (v[:, :, : gspec.off] == 0).all()
        assert (v[:, :, gspec.off + gspec.w :] == 0).all()

    def test_matches_nhwc_chain(self, rng):
        """Fused result must equal plain upsample_2x_bilinear -> conv on
        the unpacked view (the semantics the U-Net math is defined in)."""
        from rrin_tpu.ops.conv_phase import _conv_xla
        from rrin_tpu.ops.packed import unpack
        from rrin_tpu.ops.resize import upsample_2x_bilinear

        x = jnp.asarray(rng.random((1, 16, 28, 64), dtype=np.float32))
        xp, spec = pack(x, p=2, off=0, m=16)
        wgt = jnp.asarray((rng.random((3, 3, 64, 32), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(32, dtype=np.float32))
        got, gspec = _run_kernel(xp, spec, 64, wgt, bias, 3, 0.1)
        want = _conv_xla(upsample_2x_bilinear(x), wgt, bias, 0.1)
        np.testing.assert_allclose(
            np.asarray(unpack(got, gspec)), np.asarray(want),
            atol=3e-4, rtol=3e-4,
        )
