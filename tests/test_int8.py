"""int8 inference mode at the U-Net / cascade / pipeline level
(docs/PERFORMANCE.md lever 4; VERDICT r1 item 8).

On CPU the packed convs route to the XLA fake-quant fallback, which
quantizes through the SAME symmetric int8 grid as the Mosaic kernel
(kernel-vs-fallback parity is gated per-site in tests/test_conv_int8.py
and on real TPU by bench.py --selfcheck), so these tests gate the exact
int8 math of the full calibrate -> quantize -> infer flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import (
    forward,
    forward_calibrate,
    init_params,
    merge_quant_stats,
    scale_quant_stats,
)
from rrin_tpu.models.unet import (
    QUANT_SITES,
    unet_apply,
    unet_apply_packed,
    unet_apply_stats,
    unet_init,
)

CFG = ModelConfig()


def _psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return np.inf
    peak = float(np.abs(b).max()) or 1.0
    return 10 * np.log10(peak * peak / mse)


class TestUnetStats:
    def test_stats_cover_all_quant_sites(self, rng):
        p = unet_init(jax.random.key(0), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, 48, 64, 6), dtype=np.float32))
        out, stats = unet_apply_stats(p, x, CFG)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(unet_apply(p, x, CFG)),
            atol=1e-6, rtol=1e-6,
        )
        needed = {n for ins in QUANT_SITES.values() for n in ins}
        assert needed <= set(stats), needed - set(stats)
        # stats really are the |x| maxima: the input one is checkable
        np.testing.assert_allclose(
            float(stats["in"]), float(jnp.max(jnp.abs(x))), rtol=1e-6
        )

    @pytest.mark.parametrize("h", [48, 96, 160, 192])  # plain / l2 / l3-padded / l3
    def test_unet_int8_quality(self, rng, h):
        p = unet_init(jax.random.key(1), 6, 4, CFG)
        x = jnp.asarray(rng.random((1, h, 64, 6), dtype=np.float32)) - 0.5
        _, stats = unet_apply_stats(p, x, CFG)
        want = np.asarray(unet_apply(p, x, CFG))
        got = np.asarray(unet_apply_packed(p, x, CFG, absmax=stats))
        assert _psnr(got, want) > 35.0, _psnr(got, want)


class TestForwardInt8:
    def test_calibrated_forward_quality(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 96, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 96, 64, 3), dtype=np.float32))
        want = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG))
        out_c, stats = forward_calibrate(params, i0, i1, 0.5, cfg=CFG)
        # the calibration pass IS the plain forward
        np.testing.assert_allclose(np.asarray(out_c), want, atol=1e-5)
        stats = scale_quant_stats(stats, 1.2)
        got = np.asarray(
            forward(params, i0, i1, 0.5, cfg=CFG, packed=True,
                    quant_stats=stats)
        )
        assert _psnr(got, want) > 35.0, _psnr(got, want)

    def test_merge_stats(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        _, s1 = forward_calibrate(params, i0, i1, 0.25, cfg=CFG)
        _, s2 = forward_calibrate(params, i1, i0, 0.75, cfg=CFG)
        m = merge_quant_stats(s1, s2)
        a = float(s1["flow"]["c1"])
        b = float(s2["flow"]["c1"])
        assert float(m["flow"]["c1"]) == max(a, b)

    def test_quant_requires_packed(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.zeros((1, 48, 64, 3), jnp.float32)
        _, stats = forward_calibrate(params, i0, i0, 0.5, cfg=CFG)
        with pytest.raises(ValueError, match="packed"):
            forward(params, i0, i0, 0.5, cfg=CFG, quant_stats=stats)


class TestPipelineInt8:
    def test_interpolator_int8_step(self, rng):
        from rrin_tpu.pipeline import Interpolator, device_step

        params = init_params(jax.random.key(0), CFG)
        pairs = rng.integers(0, 256, (1, 2, 48, 64, 3), dtype=np.uint8)
        interp = Interpolator(params, CFG, compute_dtype="float32",
                              int8=True)
        out = np.asarray(interp.step(pairs))
        # calibrated on first batch, keyed by padded resolution
        assert (48, 64) in interp._quant_stats
        want = np.asarray(device_step(
            params, jnp.asarray(pairs), cfg=CFG,
            compute_dtype=jnp.float32, pad_hw=(0, 0),
        ))
        assert out.shape == want.shape and out.dtype == np.uint8
        assert _psnr(out / 255.0, want / 255.0) > 35.0
        # second step reuses the per-resolution stats (no recalibration)
        stats = interp._quant_stats[(48, 64)]
        interp.step(pairs)
        assert interp._quant_stats[(48, 64)] is stats

    def test_int8_rejects_spatial_sharding(self):
        # int8 + batch DP composes (shard_map of the single-device fast
        # path, tests/test_sharding.py TestShardMapDP); spatial H-sharding
        # still cannot carry the packed kernels and must reject.
        from rrin_tpu.pipeline import Interpolator

        params = init_params(jax.random.key(0), CFG)
        with pytest.raises(ValueError, match="spatial"):
            Interpolator(params, CFG, int8=True, spatial=2)

    def test_int8_rejects_unsupported_shape(self, rng):
        from rrin_tpu.pipeline import Interpolator

        params = init_params(jax.random.key(0), CFG)
        interp = Interpolator(params, CFG, int8=True)
        pairs = rng.integers(0, 256, (1, 2, 32, 48, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="int8"):
            interp.step(pairs)


class TestInt8Tools:
    def test_eval_int8(self, rng, tmp_path):
        from rrin_tpu.eval import evaluate, find_triplets, synthesize_triplets

        params = init_params(jax.random.key(0), CFG)
        root = str(tmp_path / "trips")
        synthesize_triplets(root, count=2, hw=(64, 96))
        dirs = find_triplets(root)
        rep = evaluate(params, dirs, batch_size=2, compute_dtype="float32",
                       int8=True)
        ref = evaluate(params, dirs, batch_size=2, compute_dtype="float32")
        assert rep["count"] == 2
        # random weights produce a blend; int8 must stay within ~1 dB of it
        assert abs(rep["psnr_mean"] - ref["psnr_mean"]) < 1.0
        # percentile-clipped calibration is scorable through the same
        # harness (quality impact measured BEFORE production adopts it)
        rep_p = evaluate(params, dirs, batch_size=2,
                         compute_dtype="float32", int8=True,
                         int8_percentile=99.0)
        assert abs(rep_p["psnr_mean"] - ref["psnr_mean"]) < 2.0

    def test_interp_image_int8(self, rng, tmp_path):
        import cv2

        from rrin_tpu.interp_image import main as img_main

        base = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
        a = str(tmp_path / "a.png")
        b = str(tmp_path / "b.png")
        cv2.imwrite(a, base)
        cv2.imwrite(b, np.roll(base, 4, axis=1))
        out = str(tmp_path / "mid.png")
        rc = img_main(["--im1", a, "--im3", b, "-o", out, "--fp32",
                       "--no-pallas", "--int8"])
        assert rc == 0
        assert cv2.imread(out) is not None

    def test_device_step_int8_exp2_modes(self, rng):
        """int8 carried path under 4x interpolation in both time modes."""
        from rrin_tpu.pipeline import Interpolator

        params = init_params(jax.random.key(0), CFG)
        pairs = rng.integers(0, 256, (1, 2, 48, 64, 3), dtype=np.uint8)
        for mode in ("direct", "cascade"):
            interp = Interpolator(params, CFG, exp=2, mode=mode,
                                  compute_dtype="float32", int8=True)
            out = np.asarray(interp.step(pairs))
            assert out.shape == (1, 3, 48, 64, 3) and out.dtype == np.uint8


class TestPercentileCalibration:
    """Percentile-clipped calibration + saturation telemetry (VERDICT r2
    weak #2: per-tensor absmax is fragile for trained weights with
    outlier activation channels; percentile clipping trades a bounded,
    MEASURABLE clip rate for a finer grid)."""

    def test_quantile_stats_bound_by_absmax(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        _, st_max = forward_calibrate(params, i0, i1, 0.5, cfg=CFG)
        _, st_q = forward_calibrate(params, i0, i1, 0.5, cfg=CFG,
                                    quantile=0.99)
        q = np.array([float(x) for x in jax.tree.leaves(st_q)])
        m = np.array([float(x) for x in jax.tree.leaves(st_max)])
        assert np.all(q <= m + 1e-6)
        assert np.any(q < m * 0.999)  # a 1% tail clip is a real clip
        # q=1.0 IS the max
        _, st_1 = forward_calibrate(params, i0, i1, 0.5, cfg=CFG,
                                    quantile=1.0)
        np.testing.assert_allclose(
            np.array([float(x) for x in jax.tree.leaves(st_1)]), m,
            rtol=1e-6,
        )

    def test_forward_quality_with_percentile_stats(self, rng):
        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 96, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 96, 64, 3), dtype=np.float32))
        want = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG))
        _, stats = forward_calibrate(params, i0, i1, 0.5, cfg=CFG,
                                     quantile=0.995)
        got = np.asarray(forward(
            params, i0, i1, 0.5, cfg=CFG, packed=True,
            quant_stats=scale_quant_stats(stats, 1.2),
        ))
        assert _psnr(got, want) > 28.0, _psnr(got, want)

    def test_saturation_rates_absmax_vs_clipped(self, rng):
        from rrin_tpu.models.rrin import forward_saturation

        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
        _, st = forward_calibrate(params, i0, i1, 0.5, cfg=CFG)
        # absmax ranges on the SAME input: nothing exceeds them
        sat = forward_saturation(params, i0, i1, st, 0.5, cfg=CFG)
        assert max(float(x) for x in jax.tree.leaves(sat)) == 0.0
        # halved ranges: measurable clipping, valid rates
        sat2 = forward_saturation(
            params, i0, i1, jax.tree.map(lambda s: s * 0.5, st), 0.5,
            cfg=CFG,
        )
        vals = [float(x) for x in jax.tree.leaves(sat2)]
        assert max(vals) > 0.0
        assert all(0.0 <= v <= 1.0 for v in vals)

    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_interpolator_percentile_end_to_end(self, rng):
        from rrin_tpu.pipeline import Interpolator, device_step

        params = init_params(jax.random.key(0), CFG)
        pairs = rng.integers(0, 256, (2, 2, 48, 64, 3), dtype=np.uint8)
        ia = Interpolator(params, CFG, compute_dtype="float32", int8=True)
        ip = Interpolator(params, CFG, compute_dtype="float32", int8=True,
                          int8_percentile=99.0)
        out = np.asarray(ip.step(pairs))
        ia.step(pairs)
        qa = np.array([float(x) for x in
                       jax.tree.leaves(ia._quant_stats[(48, 64)])])
        qp = np.array([float(x) for x in
                       jax.tree.leaves(ip._quant_stats[(48, 64)])])
        assert np.all(qp <= qa + 1e-6) and np.any(qp < qa * 0.999)
        want = np.asarray(device_step(
            params, jnp.asarray(pairs), cfg=CFG,
            compute_dtype=jnp.float32, pad_hw=(0, 0),
        ))
        assert _psnr(out / 255.0, want / 255.0) > 28.0
        # telemetry: absmax+margin clips nothing on its own calibration
        # batch; the percentile grid shows a real but bounded rate
        sa = ia.saturation_rates(pairs)
        sp = ip.saturation_rates(pairs)
        assert set(sa) == set(sp) and "flow/c1" in sa
        assert max(sa.values()) == 0.0
        assert 0.0 < max(sp.values()) <= 0.05  # ~1% tail, margin-shrunk

    def test_percentile_validation(self, rng):
        from rrin_tpu.pipeline import Interpolator

        params = init_params(jax.random.key(0), CFG)
        with pytest.raises(ValueError, match="requires int8"):
            Interpolator(params, CFG, int8_percentile=99.9)
        with pytest.raises(ValueError, match="preset"):
            Interpolator(params, CFG, int8=True, int8_percentile=99.9,
                         quant_stats={"flow": {}})
        for bad in (0.0, 50.0, 100.1, -1.0):
            with pytest.raises(ValueError, match="50, 100"):
                Interpolator(params, CFG, int8=True, int8_percentile=bad)
        with pytest.raises(ValueError, match="int8"):
            Interpolator(params, CFG).saturation_rates(
                np.zeros((1, 2, 48, 64, 3), np.uint8)
            )


class TestPreparedParams:
    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_prepared_matches_inline(self, rng):
        """forward with prepare-once packed_params == forward without, in
        both float and int8 modes (the prep arrays are the SAME values the
        per-frame graph would rebuild)."""
        from rrin_tpu.models.rrin import prepare_packed_params

        params = init_params(jax.random.key(0), CFG)
        i0 = jnp.asarray(rng.random((1, 192, 64, 3), dtype=np.float32))
        i1 = jnp.asarray(rng.random((1, 192, 64, 3), dtype=np.float32))
        want = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG, packed=True))
        pp = prepare_packed_params(params, CFG, jnp.float32, hw=(192, 64))
        got = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG, packed=True,
                                 packed_params=pp))
        np.testing.assert_allclose(got, want, atol=1e-6)

        _, stats = forward_calibrate(params, i0, i1, 0.5, cfg=CFG)
        stats = scale_quant_stats(stats, 1.2)
        want_q = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG,
                                    packed=True, quant_stats=stats))
        ppq = prepare_packed_params(params, CFG, jnp.float32,
                                    quant_stats=stats, hw=(192, 64))
        got_q = np.asarray(forward(params, i0, i1, 0.5, cfg=CFG,
                                   packed=True, quant_stats=stats,
                                   packed_params=ppq))
        np.testing.assert_allclose(got_q, want_q, atol=1e-6)

    def test_branch_mismatch_rejected(self, rng):
        from rrin_tpu.models.rrin import prepare_packed_params

        params = init_params(jax.random.key(0), CFG)
        pp = prepare_packed_params(params, CFG, jnp.float32, hw=(192, 64))
        i0 = jnp.zeros((1, 48, 64, 3), jnp.float32)  # l2/l3 branches off
        with pytest.raises(ValueError, match="prepared for shape"):
            forward(params, i0, i0, 0.5, cfg=CFG, packed=True,
                    packed_params=pp)

    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_interpolator_prepares_once(self, rng):
        from rrin_tpu.pipeline import Interpolator

        params = init_params(jax.random.key(0), CFG)
        pairs = rng.integers(0, 256, (1, 2, 192, 64, 3), dtype=np.uint8)
        interp = Interpolator(params, CFG, compute_dtype="float32",
                              int8=True)
        out1 = np.asarray(interp.step(pairs))
        assert interp._packed_params  # collected on first step
        prep = next(iter(interp._packed_params.values()))
        assert prep is not None
        out2 = np.asarray(interp.step(pairs))
        np.testing.assert_array_equal(out1, out2)

    def test_branch_mismatch_same_coarse_flags(self, rng):
        """hw=(320,64) vs 256x64 share every flag except the level-4
        kernel condition — the guard must still catch it (a stale prep
        would silently miss the d4 constants or carry wrong roles)."""
        from rrin_tpu.models.rrin import prepare_packed_params
        from rrin_tpu.models.unet import packed_branch_flags

        assert (packed_branch_flags(320, 64, CFG)[:6]
                == packed_branch_flags(256, 64, CFG)[:6])
        assert (packed_branch_flags(320, 64, CFG)
                != packed_branch_flags(256, 64, CFG))
        params = init_params(jax.random.key(0), CFG)
        pp = prepare_packed_params(params, CFG, jnp.float32, hw=(320, 64))
        i0 = jnp.zeros((1, 256, 64, 3), jnp.float32)
        with pytest.raises(ValueError, match="prepared for shape"):
            forward(params, i0, i0, 0.5, cfg=CFG, packed=True,
                    packed_params=pp)
