"""Packed U-Net fast path vs the plain path: the carried-layout segment
(stem/down1/up3/up4/head + packed pool/upsample/concat) must reproduce
unet_apply exactly on the XLA fallback, and through the Mosaic kernel in
interpret mode. Also gates forward(packed=True) at the cascade level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import forward, init_params
from rrin_tpu.models.unet import (
    packed_supported,
    unet_apply,
    unet_apply_packed,
    unet_init,
)
from rrin_tpu.ops import conv_packed as cpk

CFG = ModelConfig()


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return np.inf
    peak = float(np.abs(np.asarray(a, np.float64)).max()) or 1.0
    return 10 * np.log10(peak * peak / mse)


class TestPackedUnet:
    @pytest.mark.parametrize("cin,cout", [(6, 4), (16, 2)])
    def test_xla_fallback_matches_plain_fp32(self, rng, cin, cout):
        """On CPU conv_packed routes to the unpack->conv->pack fallback;
        the packed plumbing (pool/upsample/concat/offsets) must be exact."""
        p = unet_init(jax.random.key(0), cin, cout, CFG)
        x = jnp.asarray(rng.random((1, 48, 64, cin), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        got = np.asarray(unet_apply_packed(p, x, CFG))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_xla_fallback_level2_kernel_branch(self, rng):
        """h=96 takes the l2_kernel branch (P=1 convs at level 2)."""
        p = unet_init(jax.random.key(2), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 96, 64, 6), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        got = np.asarray(unet_apply_packed(p, x, CFG))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_xla_fallback_level3_kernel_branch(self, rng):
        """h=192 takes the l3_kernel branch too (P=1 convs at level 3)."""
        p = unet_init(jax.random.key(3), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 192, 64, 6), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        got = np.asarray(unet_apply_packed(p, x, CFG))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_xla_fallback_level2_padded_height(self, rng):
        """h=112: level-2 H (28) is not 8-aligned — the in-path H pad +
        re-zero at level 2 must keep exact SAME semantics (360p-class)."""
        p = unet_init(jax.random.key(5), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 112, 64, 6), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        got = np.asarray(unet_apply_packed(p, x, CFG))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_xla_fallback_level3_padded_height(self, rng):
        """h=160: level-3 H (20) is not 8-aligned — the in-path H pad +
        re-zero must keep exact SAME semantics (the 720p-class case)."""
        p = unet_init(jax.random.key(4), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 160, 64, 6), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        got = np.asarray(unet_apply_packed(p, x, CFG))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_kernel_interpret_matches_plain(self, rng):
        p = unet_init(jax.random.key(1), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 48, 64, 6), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        cpk._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(unet_apply_packed(p, x, CFG))
        finally:
            cpk._FORCE_KERNEL = False
        assert _psnr(want, got) > 60, _psnr(want, got)

    @pytest.mark.slow
    def test_kernel_interpret_matches_plain_l3_fused_u2(self, rng):
        """h=192 in interpret mode: the l3 branch plus the M-doubling
        fused u2 re-entry (fuse_u2) through the Mosaic kernel path."""
        from rrin_tpu.models.unet import packed_branch_flags

        assert packed_branch_flags(192, 64, CFG)[7]  # fuse_u2 on
        p = unet_init(jax.random.key(6), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 192, 64, 6), dtype=np.float32))
        want = np.asarray(unet_apply(p, x, CFG))
        cpk._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(unet_apply_packed(p, x, CFG))
        finally:
            cpk._FORCE_KERNEL = False
        assert _psnr(want, got) > 60, _psnr(want, got)

    def test_supported_gate(self):
        assert packed_supported(48, 64, CFG)
        assert not packed_supported(32, 64, CFG)  # level-1 H below window
        assert not packed_supported(48, 64, ModelConfig(base_width=16))


class TestForwardPacked:
    def test_cascade_packed_matches_plain(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        want = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG))
        got = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG, packed=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_packed_bf16_close_to_plain_bf16(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        want = np.asarray(
            forward(params, i0, i1, 0.5, cfg=CFG, compute_dtype=jnp.bfloat16)
        )
        got = np.asarray(
            forward(params, i0, i1, 0.5, cfg=CFG, compute_dtype=jnp.bfloat16,
                    packed=True)
        )
        assert _psnr(want, got) > 40, _psnr(want, got)

    def test_packed_falls_back_on_small_shapes(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 32, 48, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 32, 48, 3), dtype=np.float32))
        want = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG))
        got = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG, packed=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_packed_remat_rejected(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.zeros((1, 48, 64, 3), jnp.float32)
        with pytest.raises(ValueError, match="inference-only"):
            forward(params, i0, i0, 0.5, cfg=CFG, packed=True, remat=True)


class TestDenseEntryFlag:
    """DENSE_ENTRY on/off must be numerically interchangeable (both are
    the same conv; only the entry packing geometry differs) — protects
    BOTH entry paths now that dense is the default."""

    def _run(self, x, dense, kernel=False):
        import rrin_tpu.models.unet as un

        p = unet_init(jax.random.key(2), 6, 4, CFG)
        old = un.DENSE_ENTRY
        un.DENSE_ENTRY = dense
        try:
            if kernel:
                cpk._FORCE_KERNEL = True
                try:
                    with pltpu.force_tpu_interpret_mode():
                        return np.asarray(unet_apply_packed(p, x, CFG))
                finally:
                    cpk._FORCE_KERNEL = False
            return np.asarray(unet_apply_packed(p, x, CFG))
        finally:
            un.DENSE_ENTRY = old

    def test_flag_off_equals_on_xla(self, rng):
        x = jnp.asarray(rng.random((1, 48, 64, 6), dtype=np.float32))
        a = self._run(x, dense=True)
        b = self._run(x, dense=False)
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    def test_flag_off_equals_on_interpret_kernel(self, rng):
        x = jnp.asarray(rng.random((1, 48, 64, 6), dtype=np.float32))
        a = self._run(x, dense=True, kernel=True)
        b = self._run(x, dense=False, kernel=True)
        assert _psnr(a, b) > 60, _psnr(a, b)
