"""Phase-packed conv kernel vs the XLA conv (interpret mode on CPU;
real-TPU execution covered by bench.py and verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops import conv_phase
from rrin_tpu.ops.conv_phase import _conv_xla, conv2d_fused, supports


def _run_kernel(x, w, b, slope):
    conv_phase._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(conv2d_fused(x, w, b, slope))
    finally:
        conv_phase._FORCE_KERNEL = False


def _case(rng, b, h, w, cin, cout, k, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32)).astype(dtype)
    wgt = jnp.asarray((rng.standard_normal((k, k, cin, cout)) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal((cout,)) * 0.1).astype(np.float32))
    return x, wgt, bias


# The UNet's kernel-eligible shape classes (cin, cout, k) + packing factor.
SHAPES = [
    (6, 32, 7, 4),     # flow stem conv1
    (16, 32, 7, 4),    # mask stem conv1
    (32, 32, 7, 4),    # stem conv2 (the hot one)
    (32, 64, 5, 2),    # down1 conv1
    (64, 64, 5, 2),    # down1 conv2
    (64, 32, 3, 4),    # up4 conv1 / conv2 (K = 256: multi-tile contraction)
    (128, 64, 3, 2),   # up3 conv1 (cin > 128/P: relies on K > 128)
    (32, 2, 3, 4),     # mask head
]


class TestSupports:
    @pytest.mark.parametrize("cin,cout,k,p", SHAPES)
    def test_packing_factor(self, cin, cout, k, p):
        assert supports((1, 32, 64, cin), (k, k, cin, cout)) == p

    def test_big_channels_fall_back(self):
        assert supports((1, 32, 64, 128), (3, 3, 128, 128)) is None

    def test_even_kernel_rejected(self):
        assert supports((1, 32, 64, 32), (4, 4, 32, 32)) is None

    def test_width_not_divisible(self):
        # odd W is not divisible by any P in {2,4,8,16} -> None
        assert supports((1, 32, 65, 32), (3, 3, 32, 32)) is None


class TestKernelParity:
    @pytest.mark.parametrize("cin,cout,k,p", SHAPES)
    def test_matches_xla_conv(self, rng, cin, cout, k, p):
        x, w, b = _case(rng, 1, 16, 64, cin, cout, k)
        got = _run_kernel(x, w, b, 0.1)
        want = np.asarray(_conv_xla(x, w, b, 0.1)).astype(np.float32)
        np.testing.assert_allclose(got.astype(np.float32), want, atol=3e-2, rtol=3e-2)

    def test_no_activation_head(self, rng):
        x, w, b = _case(rng, 1, 16, 64, 32, 3, 3)
        got = _run_kernel(x, w, b, None)
        want = np.asarray(_conv_xla(x, w, b, None)).astype(np.float32)
        np.testing.assert_allclose(got.astype(np.float32), want, atol=3e-2, rtol=3e-2)
        assert (got < 0).any(), "head conv output must keep negative values"

    def test_batch_and_tall(self, rng):
        x, w, b = _case(rng, 2, 32, 128, 32, 32, 7)
        got = _run_kernel(x, w, b, 0.1)
        want = np.asarray(_conv_xla(x, w, b, 0.1)).astype(np.float32)
        np.testing.assert_allclose(got.astype(np.float32), want, atol=3e-2, rtol=3e-2)

    def test_fp32_uses_xla_path(self, rng):
        # fp32 never routes to the kernel (parity path): exact equality.
        x, w, b = _case(rng, 1, 16, 64, 32, 32, 7, dtype=jnp.float32)
        got = np.asarray(conv2d_fused(x, w, b, 0.1))
        want = np.asarray(_conv_xla(x, w, b, 0.1))
        np.testing.assert_array_equal(got, want)

    def test_gradients_match_xla(self, rng):
        x, w, b = _case(rng, 1, 16, 64, 32, 32, 3, dtype=jnp.float32)

        def loss_fused(w_):
            return jnp.sum(conv2d_fused(x, w_, b, 0.1) ** 2)

        def loss_xla(w_):
            return jnp.sum(_conv_xla(x, w_, b, 0.1) ** 2)

        gf = jax.grad(loss_fused)(w)
        gx = jax.grad(loss_xla)(w)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-4, atol=1e-4)


class TestUNetWithKernel:
    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_unet_interpret_matches_fp32(self, rng):
        """Full U-Net with the kernel forced (bf16) vs fp32 XLA reference."""
        from rrin_tpu.config import ModelConfig
        from rrin_tpu.models.unet import unet_apply, unet_init

        cfg = ModelConfig()
        params = unet_init(jax.random.key(0), 6, 4, cfg)
        x = jnp.asarray(rng.standard_normal((1, 32, 64, 6)).astype(np.float32))
        want = np.asarray(unet_apply(params, x, cfg))
        conv_phase._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(
                    unet_apply(params, x.astype(jnp.bfloat16), cfg)
                ).astype(np.float32)
        finally:
            conv_phase._FORCE_KERNEL = False
        # bf16 through 19 convs: loose tolerance, but must correlate tightly.
        assert np.abs(got - want).mean() < 0.05
        cc = np.corrcoef(got.ravel(), want.ravel())[0, 1]
        assert cc > 0.999, f"correlation {cc}"
