"""Pallas warp kernel vs the XLA reference path (interpret mode on CPU;
real-TPU execution is covered by bench.py and the verify drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from rrin_tpu.ops.warp import warp_bilinear
from rrin_tpu.ops.warp_pallas import (
    RB,
    WIN_MAX,
    _dy_fast_path_ok,
    warp_one_pallas,
)


def _run_pallas_interpret(img, flow, align_corners=False):
    from rrin_tpu.ops import warp_pallas as wp

    wp._FORCE_KERNEL = True
    try:
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(
                warp_one_pallas(jnp.asarray(img), jnp.asarray(flow), align_corners)
            )
    finally:
        wp._FORCE_KERNEL = False


@pytest.fixture()
def case(rng):
    def make(b=1, h=64, w=128, flow_scale=3.0, flow_bias=(0.0, 0.0)):
        img = rng.random((b, h, w, 3), dtype=np.float32)
        flow = (rng.standard_normal((b, h, w, 2)) * flow_scale).astype(np.float32)
        flow[..., 0] += flow_bias[0]
        flow[..., 1] += flow_bias[1]
        return img, flow

    return make


class TestWarpPallasParity:
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_small_flow(self, case, align_corners):
        img, flow = case()
        got = _run_pallas_interpret(img, flow, align_corners)
        want = np.asarray(
            warp_bilinear(jnp.asarray(img), jnp.asarray(flow), align_corners)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_non_128_width(self, case):
        img, flow = case(h=64, w=200)
        got = _run_pallas_interpret(img, flow)
        want = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batch(self, case):
        img, flow = case(b=3, h=32, w=128)
        got = _run_pallas_interpret(img, flow)
        want = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_large_horizontal_flow_stays_fast_path(self, case):
        # dx is unbounded on the fast path (full-width windows).
        img, flow = case(h=64, w=256, flow_scale=1.0, flow_bias=(90.0, 0.0))
        assert bool(_dy_fast_path_ok(
            jnp.asarray(np.zeros((1, 64, 256)) + np.arange(64)[None, :, None],
                        dtype=jnp.float32), 64))
        got = _run_pallas_interpret(img, flow)
        want = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        # large |sx| values put floor() on 1-ulp boundaries: allow tap flips
        # whose bilinear weight is ~0.
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_large_vertical_flow_falls_back(self, case):
        # |dy| beyond the window bound must route to the XLA path (exact).
        img, flow = case(h=64, w=128, flow_scale=1.0, flow_bias=(0.0, 50.0))
        got = _run_pallas_interpret(img, flow)
        want = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_out_of_bounds_zero_padding(self, case):
        img, _ = case(h=32, w=128)
        flow = np.full((1, 32, 128, 2), 7.3, dtype=np.float32)
        got = _run_pallas_interpret(img, flow)
        want = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, want, atol=1e-5)
        # bottom-right region must be exactly zero
        assert np.all(got[0, -4:, -4:, :] == 0.0)

    def test_integer_shift_exact(self, rng):
        img = rng.random((1, 32, 128, 3), dtype=np.float32)
        flow = np.zeros((1, 32, 128, 2), dtype=np.float32)
        flow[..., 1] = 5.0
        got = _run_pallas_interpret(img, flow, align_corners=True)
        np.testing.assert_allclose(got[0, :-5], img[0, 5:], atol=1e-6)
        np.testing.assert_allclose(got[0, -5:], 0.0, atol=1e-7)


class TestWarpPairsVariant:
    """Channel-paired bf16 gather variant: must match the XLA reference
    computed on the bf16-rounded image exactly (f32 accumulation)."""

    def _run_pairs(self, img, flow, align_corners=False):
        from rrin_tpu.ops import warp_pallas as wp

        wp._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                return np.asarray(
                    warp_one_pallas(
                        jnp.asarray(img), jnp.asarray(flow), align_corners,
                        True,
                    )
                )
        finally:
            wp._FORCE_KERNEL = False

    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_bf16_rounded_reference(self, case, align_corners):
        img, flow = case()
        want = np.asarray(
            warp_bilinear(
                jnp.asarray(img).astype(jnp.bfloat16).astype(jnp.float32),
                jnp.asarray(flow), align_corners=align_corners,
            )
        )
        got = self._run_pairs(img, flow, align_corners)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bitcast_pair_order(self):
        """The (c0,c1)->f32 bitcast must put c0 in the low 16 bits (the
        kernel's lo()/hi() split depends on it)."""
        v = jnp.asarray([[0.5, 2.0]], jnp.bfloat16)  # c0=0.5, c1=2.0
        u = jax.lax.bitcast_convert_type(v, jnp.float32)
        bits = np.asarray(jax.lax.bitcast_convert_type(u, jnp.uint32))[0]
        lo = np.uint32(bits << np.uint32(16)).view(np.float32)
        hi = np.uint32(bits & np.uint32(0xFFFF0000)).view(np.float32)
        assert lo == 0.5 and hi == 2.0, (lo, hi)

    def test_out_of_bounds_zero_padding_pairs(self, case):
        img, flow = case(flow_bias=(6.0, 5.0))
        got = self._run_pairs(img, flow)
        want = np.asarray(
            warp_bilinear(
                jnp.asarray(img).astype(jnp.bfloat16).astype(jnp.float32),
                jnp.asarray(flow),
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWarpU8Variant:
    """Byte-packed single-plane variant (pairs="u8"): must match the XLA
    reference computed on the u8-quantized image; EXACT (f32 rounding) for
    u8-derived sources — the production case (frames are u8 * (1/255))."""

    def _run_u8(self, img, flow, align_corners=False):
        from rrin_tpu.ops import warp_pallas as wp

        wp._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                return np.asarray(
                    warp_one_pallas(
                        jnp.asarray(img), jnp.asarray(flow), align_corners,
                        "u8",
                    )
                )
        finally:
            wp._FORCE_KERNEL = False

    @staticmethod
    def _u8_round_trip(img):
        return np.round(np.clip(img, 0.0, 1.0) * 255.0).astype(
            np.float32) * np.float32(1.0 / 255.0)

    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_u8_rounded_reference(self, case, align_corners):
        img, flow = case()
        want = np.asarray(
            warp_bilinear(
                jnp.asarray(self._u8_round_trip(img)),
                jnp.asarray(flow), align_corners=align_corners,
            )
        )
        got = self._run_u8(img, flow, align_corners)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_u8_source_exact(self, rng):
        """u8-derived frames (the production source) lose nothing."""
        raw = rng.integers(0, 256, (1, 32, 128, 3)).astype(np.float32)
        img = raw * np.float32(1.0 / 255.0)
        flow = (rng.standard_normal((1, 32, 128, 2)) * 2.5).astype(np.float32)
        got = self._run_u8(img, flow)
        want = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_out_of_bounds_zero_padding_u8(self, case):
        img, flow = case(h=32, w=200, flow_bias=(6.0, 5.0))
        got = self._run_u8(img, flow)
        want = np.asarray(
            warp_bilinear(
                jnp.asarray(self._u8_round_trip(img)), jnp.asarray(flow))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert np.all(got[0, -4:, -4:, :] == 0.0)

    def test_large_vertical_flow_falls_back_u8(self, case):
        """|dy| beyond the window: XLA fallback on the quantized source."""
        img, flow = case(h=64, w=128, flow_scale=1.0, flow_bias=(0.0, 50.0))
        got = self._run_u8(img, flow)
        want = np.asarray(
            warp_bilinear(
                jnp.asarray(self._u8_round_trip(img)), jnp.asarray(flow))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batch_u8(self, case):
        img, flow = case(b=2, h=32, w=256)
        got = self._run_u8(img, flow)
        want = np.asarray(
            warp_bilinear(
                jnp.asarray(self._u8_round_trip(img)), jnp.asarray(flow))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWarpU8ModelGate:
    """RRIN_WARP_U8 env gate: the cascade selects pairs="u8" for bf16
    forwards and the u8 kernel actually runs (models/rrin._warp_pairs_mode)."""

    def test_forward_routes_u8_and_matches_pairs(self, rng):
        from rrin_tpu.config import ModelConfig
        from rrin_tpu.models import rrin as rr
        from rrin_tpu.models.rrin import forward, init_params
        from rrin_tpu.ops import warp_pallas as wp

        cfg = ModelConfig()
        params = init_params(jax.random.key(0), cfg)
        # u8-derived frames: the production source (pipeline normalizes
        # uint8 as u8 * (1/255)), for which the u8 kernel is exact.
        i0 = jnp.asarray(
            rng.integers(0, 256, (1, 64, 96, 3)).astype(np.float32) / 255.0)
        i1 = jnp.asarray(
            rng.integers(0, 256, (1, 64, 96, 3)).astype(np.float32) / 255.0)

        # Interpret mode is scoped to the warp planar calls only: a
        # process-wide interpret context would poison the conv sites'
        # lax.platform_dependent branches with IO-effect mismatches.
        calls = []

        def interp_wrap(orig, tag):
            def wrapped(*a, **k):
                calls.append(tag)
                with pltpu.force_tpu_interpret_mode():
                    return orig(*a, **k)
            return wrapped

        def run():
            wp._FORCE_KERNEL = True
            try:
                return np.asarray(forward(
                    params, i0, i1, jnp.float32(0.5), cfg=cfg,
                    compute_dtype=jnp.bfloat16, use_pallas=True,
                ).astype(jnp.float32))
            finally:
                wp._FORCE_KERNEL = False

        old_pairs = wp._warp_planar_pallas_pairs
        old_u8 = wp._warp_planar_pallas_u8
        old_env = rr._WARP_U8
        wp._warp_planar_pallas_pairs = interp_wrap(old_pairs, "pairs")
        wp._warp_planar_pallas_u8 = interp_wrap(old_u8, "u8")
        try:
            # Default flipped ON in round 4 per benchmarks/AB_R4.json.
            rr._WARP_U8 = False
            assert rr._warp_pairs_mode(jnp.bfloat16) is True
            rr._forward_jit.clear_cache()
            want = run()  # pairs variant
            assert "pairs" in calls and "u8" not in calls, calls
            rr._WARP_U8 = True
            assert rr._warp_pairs_mode(jnp.bfloat16) == "u8"
            # The gate is read at trace time (env is import-time in
            # production); drop the cached executable so the flip retraces.
            rr._forward_jit.clear_cache()
            got = run()
        finally:
            rr._WARP_U8 = old_env
            wp._warp_planar_pallas_pairs = old_pairs
            wp._warp_planar_pallas_u8 = old_u8
            # Don't leave a u8-traced executable in the cache for later
            # same-signature bf16 forwards in this process.
            rr._forward_jit.clear_cache()
        assert "u8" in calls, "u8 kernel variant was never traced"
        # Same bf16 conv path on both sides; only the warp source rounding
        # differs (bf16 vs exact bytes) — outputs must agree closely.
        mse = float(np.mean((got - want) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 45.0, psnr


class TestPlanarOut:
    """planar_out returns (B, C, H, W) with identical values (the kernel
    computes in planes; the flag only skips/relocates the transpose)."""

    def test_kernel_planar_matches_nhwc(self, case):
        from rrin_tpu.ops import warp_pallas as wp

        img, flow = case()
        wp._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                nhwc = np.asarray(warp_one_pallas(
                    jnp.asarray(img), jnp.asarray(flow), False, "u8"))
                plnr = np.asarray(warp_one_pallas(
                    jnp.asarray(img), jnp.asarray(flow), False, "u8", True))
        finally:
            wp._FORCE_KERNEL = False
        assert plnr.shape == (img.shape[0], 3, img.shape[1], img.shape[2])
        np.testing.assert_array_equal(np.moveaxis(plnr, 1, -1), nhwc)

    def test_fallback_planar_matches_nhwc(self, case):
        # tiny H routes to the pure-XLA fallback before any cond
        img, flow = case(h=16)
        nhwc = np.asarray(warp_one_pallas(
            jnp.asarray(img), jnp.asarray(flow), False, False))
        plnr = np.asarray(warp_one_pallas(
            jnp.asarray(img), jnp.asarray(flow), False, False, True))
        np.testing.assert_array_equal(np.moveaxis(plnr, 1, -1), nhwc)

    def test_cascade_planar_blend_bit_identical(self, rng):
        """RRIN_PLANAR_BLEND glue (models/rrin._cascade) is pure layout:
        forward output must be bit-identical with the flag on."""
        import jax

        from rrin_tpu.config import ModelConfig
        from rrin_tpu.models import rrin

        cfg = ModelConfig()
        params = rrin.init_params(jax.random.key(3), cfg)
        i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        kw = dict(cfg=cfg, compute_dtype=jnp.float32, use_pallas=True,
                  packed=True)
        want = np.asarray(rrin.forward(params, i0, i1, 0.4, **kw))
        old = rrin._PLANAR_BLEND
        rrin._PLANAR_BLEND = True
        # the flag is read at trace time — drop the cached trace so the
        # planar glue actually compiles
        rrin._forward_jit.clear_cache()
        try:
            got = np.asarray(rrin.forward(params, i0, i1, 0.4, **kw))
        finally:
            rrin._PLANAR_BLEND = old
            rrin._forward_jit.clear_cache()
        np.testing.assert_array_equal(got, want)
