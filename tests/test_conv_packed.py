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


class TestDenseEntry:
    """Dense-entry geometry (models/unet.py DENSE_ENTRY): P=8/C=16 pack,
    conv1 contraction at P=8 with the in-kernel P-halving interleave
    (m_double), conv2 trimming M back to the narrower plan (m_out)."""

    def _entry_case(self, rng, h=32, w_real=52, cin=6, dtype=jnp.float32):
        x = jnp.asarray(
            rng.random((1, h, w_real, cin), dtype=np.float32), dtype
        )
        wgt = jnp.asarray(
            (rng.random((7, 7, cin, 32), dtype=np.float32) - 0.5) * 0.3,
            dtype,
        )
        bias = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        return x, wgt, bias

    def test_m_double_matches_xla_reference(self, rng):
        x, wgt, bias = self._entry_case(rng)
        xp, spec = pack(x, p=8, off=5, m=8, c_pad=16)
        assert xp.shape[-1] == 128
        parts = [(xp, spec, 6)]
        cpk._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got, gspec = conv_packed(
                    parts, wgt, bias, 2, 0.1, m_double=True
                )
        finally:
            cpk._FORCE_KERNEL = False
        assert gspec == PackedSpec(p=4, c=32, w=52, off=2, m=16)
        assert got.shape == (1, 32, 16, 128)
        want = _conv_packed_xla(
            [xp], wgt, bias, (spec,), (6,), 2, 0.1, m_double=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )

    def test_dense_entry_equals_classic_entry(self, rng):
        """The P=8 dense entry must be numerically the P=4/C=32 classic
        entry (same conv, different packing): unpacked outputs equal."""
        x, wgt, bias = self._entry_case(rng)
        xd, sd = pack(x, p=8, off=5, m=8, c_pad=16)
        xc, sc = pack(x, p=4, off=1, m=16, c_pad=32)
        got_d, spec_d = _run_kernel_kw(
            [(xd, sd, 6)], wgt, bias, 2, 0.1, m_double=True
        )
        got_c, spec_c = _run_kernel_kw([(xc, sc, 6)], wgt, bias, 2, 0.1)
        np.testing.assert_allclose(
            np.asarray(unpack(got_d, spec_d)),
            np.asarray(unpack(got_c, spec_c)),
            atol=2e-4, rtol=2e-4,
        )

    def test_m_out_trims_tail_guards(self, rng):
        """conv2 of the dense-entry chain: wider-M input (from m_double),
        output trimmed to the plan's m0 — equals the reference on the
        same trim, and equals the untrimmed run on the kept groups."""
        x = jnp.asarray(rng.random((1, 32, 52, 32), dtype=np.float32))
        xp, spec = pack(x, p=4, off=2, m=24)  # wider than needed (m0=16)
        wgt = jnp.asarray(
            (rng.random((7, 7, 32, 32), dtype=np.float32) - 0.5) * 0.3
        )
        bias = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        got, gspec = _run_kernel_kw([(xp, spec, 32)], wgt, bias, 3, 0.1,
                                    m_out=16)
        assert gspec.m == 16 and got.shape == (1, 32, 16, 128)
        want = _conv_packed_xla(
            [xp], wgt, bias, (spec,), (32,), 3, 0.1, m_out=16
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )
        full, _ = _run_kernel_kw([(xp, spec, 32)], wgt, bias, 3, 0.1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full)[:, :, :16, :],
            atol=2e-4, rtol=2e-4,
        )

    def test_entry_chain_matches_nhwc(self, rng):
        """Full dense stem: pack(P8) -> conv1(m_double) -> conv2(m_out)
        equals the NHWC conv chain."""
        from rrin_tpu.ops.conv_phase import _conv_xla

        x, w1, b1 = self._entry_case(rng)
        w2 = jnp.asarray(
            (rng.random((7, 7, 32, 32), dtype=np.float32) - 0.5) * 0.3
        )
        b2 = jnp.asarray(rng.random(32, dtype=np.float32) - 0.5)
        xp, spec = pack(x, p=8, off=5, m=16, c_pad=16)  # wide entry
        y1, s1 = _run_kernel_kw([(xp, spec, 6)], w1, b1, 2, 0.1,
                                m_double=True)
        assert s1.m == 32
        y2, s2 = _run_kernel_kw([(y1, s1, 32)], w2, b2, 3, 0.1, m_out=16)
        want = _conv_xla(_conv_xla(x, w1, b1, 0.1), w2, b2, 0.1)
        np.testing.assert_allclose(
            np.asarray(unpack(y2, s2)), np.asarray(want),
            atol=3e-4, rtol=3e-4,
        )

    def test_m_double_int8_carry(self, rng):
        """Dense entry on the int8 path: quantized input contraction,
        int8 carried output (out_absmax), against the fake-quant ref."""
        x, wgt, bias = self._entry_case(rng)
        xp, spec = pack(x, p=8, off=5, m=8, c_pad=16)
        ax = (jnp.float32(1.0),)
        oax = jnp.float32(8.0)
        cpk._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got, gspec = conv_packed(
                    [(xp, spec, 6)], wgt, bias, 2, 0.1,
                    in_absmax=ax, out_absmax=oax, m_double=True,
                )
        finally:
            cpk._FORCE_KERNEL = False
        assert got.dtype == jnp.int8 and gspec.p == 4
        want = _conv_packed_xla(
            [xp], wgt, bias, (spec,), (6,), 2, 0.1, ax, oax,
            m_double=True,
        )
        # f32 accumulation-order can flip round-to-grid ties by 1 quantum
        # on isolated elements; anything larger is a real geometry bug.
        diff = np.abs(
            np.asarray(got, np.int32) - np.asarray(want, np.int32)
        )
        assert diff.max() <= 1 and (diff != 0).mean() < 0.01, (
            diff.max(), (diff != 0).mean()
        )


def _run_kernel_kw(parts, w, b, off_out, slope, **kw):
    cpk._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return conv_packed(parts, w, b, off_out, slope, **kw)
    finally:
        cpk._FORCE_KERNEL = False
