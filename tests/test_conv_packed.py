"""Pad-free packed conv kernel vs the unpack->concat->XLA-conv->repack
reference (interpret mode on CPU; real-TPU execution covered by bench.py
selfcheck and the verify drives). Covers every (k, P, shift) pattern the
U-Net offset plan (models/unet.py) produces, the dual-operand fused
concat, channel-padded operands, and the guard invariant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_packed as cpk
from rrin_tpu.ops.conv_packed import _conv_packed_xla, conv_packed, supports
from rrin_tpu.ops.packed import PackedSpec, pack, pad_lanes, unpack


def _run_kernel(parts, w, b, off_out, slope):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_packed(parts, w, b, off_out, slope)
    finally:
        cpk._FORCE_KERNEL = False


def _ref(parts, w, b, off_out, slope):
    xs, specs, rcs = zip(*parts)
    xs = [pad_lanes(x, -(-s.lanes // 128) * 128) for x, s in zip(xs, specs)]
    return _conv_packed_xla(xs, w, b, specs, rcs, off_out, slope)


def _case(rng, h, w_real, cin, cout, k, off_in, off_out, m, p=4,
          dtype=jnp.float32, c_pad=None):
    x = jnp.asarray(rng.random((1, h, w_real, cin), dtype=np.float32), dtype)
    xp, spec = pack(x, p=p, off=off_in, m=m, c_pad=c_pad)
    wgt = jnp.asarray(
        (rng.random((k, k, cin, cout), dtype=np.float32) - 0.5) * 0.5, dtype
    )
    bias = jnp.asarray((rng.random(cout, dtype=np.float32) - 0.5), jnp.float32)
    return xp, spec, wgt, bias


# (p, k, cin, cout, off_in, off_out) — the exact single-operand sites of
# the plan in models/unet.py (_PK) at every level.
PLAN_SITES = [
    (4, 7, 6, 32, 1, 2),     # stem conv1 (c_pad separately below)
    (4, 7, 32, 32, 2, 3),    # stem conv2, s=-1
    (2, 5, 32, 64, 1, 1),    # down1 conv1, s=-1
    (2, 5, 64, 64, 1, 1),    # down1 conv2, s=-1
    (1, 3, 64, 128, 0, 0),   # down2 conv1 (P=1 implicit GEMM), s=-1
    (1, 3, 128, 128, 0, 0),  # down2 conv2
    (1, 3, 256, 128, 0, 0),  # up2 conv1
    (2, 3, 128, 64, 0, 1),   # up3 conv1, s=-1
    (4, 3, 64, 32, 0, 3),    # up4 conv1, s=-1
    (4, 3, 32, 4, 2, 1),     # head (flow), s=0, small lout
    (4, 3, 32, 2, 2, 1),     # head (mask), tiny lout
]


class TestConvPackedParity:
    @pytest.mark.parametrize("p,k,cin,cout,off_in,off_out", PLAN_SITES)
    def test_matches_xla_reference(self, rng, p, k, cin, cout, off_in,
                                   off_out):
        h, m = 32, 16
        w_real = m * p - max(off_in, off_out) - 1
        parts_w = [(rng, h, w_real, cin, cout, k, off_in, off_out, m, p)]
        xp, spec, wgt, bias = _case(*parts_w[0])
        assert supports(spec, k, cout, h)
        parts = [(xp, spec, cin)]
        got, gspec = _run_kernel(parts, wgt, bias, off_out, 0.1)
        want = _ref(parts, wgt, bias, off_out, 0.1)
        assert gspec == PackedSpec(p=p, c=cout, w=w_real, off=off_out, m=m)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    def test_channel_padded_entry(self, rng):
        """Entry conv: 6 real channels packed with c_pad=32 (DMA-ready
        lanes in one pad) — B2's zero rows make it exact."""
        xp, spec, wgt, bias = _case(rng, 32, 52, 6, 32, 7, 1, 2, 16,
                                    c_pad=32)
        assert spec.c == 32 and xp.shape[-1] == 128
        parts = [(xp, spec, 6)]
        got, _ = _run_kernel(parts, wgt, bias, 2, 0.1)
        want = _ref(parts, wgt, bias, 2, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    @pytest.mark.parametrize("p,offs", [(4, (3, 3)), (2, (1, 1)), (1, (0, 0))])
    def test_dual_operand_fused_concat(self, rng, p, offs):
        """conv(concat(a, b)) via the K-split: must equal the reference
        on the materialized concat."""
        h, m, k = 32, 16, 3
        w_real = m * p - 4
        ca, cb, cout = 16, 8, 16
        a = jnp.asarray(rng.random((1, h, w_real, ca), dtype=np.float32))
        bb = jnp.asarray(rng.random((1, h, w_real, cb), dtype=np.float32))
        ap, aspec = pack(a, p=p, off=offs[0], m=m)
        bp, bspec = pack(bb, p=p, off=offs[1], m=m)
        wgt = jnp.asarray(
            (rng.random((k, k, ca + cb, cout), dtype=np.float32) - 0.5)
        )
        bias = jnp.asarray(rng.random(cout, dtype=np.float32))
        off_out = (offs[0] - 1) % p
        parts = [(ap, aspec, ca), (bp, bspec, cb)]
        got, _ = _run_kernel(parts, wgt, bias, off_out, 0.1)
        want = _ref(parts, wgt, bias, off_out, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    def test_dual_operand_different_offsets(self, rng):
        """Operands may sit at different offsets as long as both shifts
        are integer (off_1 === off_2 mod P)."""
        h, m, p, k = 32, 16, 2, 5
        w_real = 24
        a = jnp.asarray(rng.random((1, h, w_real, 8), dtype=np.float32))
        bb = jnp.asarray(rng.random((1, h, w_real, 8), dtype=np.float32))
        ap, aspec = pack(a, p=p, off=1, m=m)
        bp, bspec = pack(bb, p=p, off=3, m=m)
        wgt = jnp.asarray((rng.random((k, k, 16, 8), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(8, dtype=np.float32))
        parts = [(ap, aspec, 8), (bp, bspec, 8)]
        got, _ = _run_kernel(parts, wgt, bias, 1, 0.1)
        want = _ref(parts, wgt, bias, 1, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    def test_no_activation_head(self, rng):
        xp, spec, wgt, bias = _case(rng, 24, 40, 32, 4, 3, 2, 1, 16)
        got, _ = _run_kernel([(xp, spec, 32)], wgt, bias, 1, None)
        want = _ref([(xp, spec, 32)], wgt, bias, 1, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    def test_batch(self, rng):
        x = jnp.asarray(rng.random((3, 24, 44, 8), dtype=np.float32))
        xp, spec = pack(x, p=4, off=2, m=16)
        wgt = jnp.asarray((rng.random((5, 5, 8, 16), dtype=np.float32) - 0.5))
        bias = jnp.asarray(rng.random(16, dtype=np.float32))
        got, _ = _run_kernel([(xp, spec, 8)], wgt, bias, 0, 0.1)
        want = _ref([(xp, spec, 8)], wgt, bias, 0, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    def test_bf16(self, rng):
        xp, spec, wgt, bias = _case(rng, 32, 52, 32, 32, 7, 2, 3, 16,
                                    dtype=jnp.bfloat16)
        got, _ = _run_kernel([(xp, spec, 32)], wgt, bias, 3, 0.1)
        want = _ref([(xp, spec, 32)], wgt, bias, 3, 0.1)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.05, rtol=0.05,
        )

    def test_output_guards_zero(self, rng):
        """Bias+LeakyReLU must not leak into guard slots."""
        xp, spec, wgt, bias = _case(rng, 24, 41, 8, 16, 3, 2, 1, 16)
        bias = bias + 3.0  # guarantee nonzero conv output everywhere
        got, gspec = _run_kernel([(xp, spec, 8)], wgt, bias, 1, 0.1)
        v = np.asarray(got).reshape(1, 24, 16 * 4, 16)
        assert (v[:, :, : gspec.off] == 0).all()
        assert (v[:, :, gspec.off + gspec.w :] == 0).all()

    def test_chain_two_convs_no_repack(self, rng):
        """conv1 -> conv2 chained packed must equal the NHWC chain."""
        from rrin_tpu.ops.conv_phase import _conv_xla

        x = jnp.asarray(rng.random((1, 32, 52, 6), dtype=np.float32))
        xp, spec = pack(x, p=4, off=1, m=16, c_pad=32)
        w1 = jnp.asarray((rng.random((7, 7, 6, 32), dtype=np.float32) - 0.5) * 0.3)
        b1 = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        w2 = jnp.asarray((rng.random((7, 7, 32, 32), dtype=np.float32) - 0.5) * 0.3)
        b2 = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        y1, s1 = _run_kernel([(xp, spec, 6)], w1, b1, 2, 0.1)
        y2, s2 = _run_kernel([(y1, s1, 32)], w2, b2, 3, 0.1)
        want = _conv_xla(_conv_xla(x, w1, b1, 0.1), w2, b2, 0.1)
        np.testing.assert_allclose(
            np.asarray(unpack(y2, s2)), np.asarray(want), atol=3e-4, rtol=3e-4
        )
