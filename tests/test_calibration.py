"""Calibration persistence + prep/stats consistency guards (VERDICT r2
items 8-9; ADVICE r2 items on eval/pipeline/prep validation).

CPU-runnable: the packed convs route to the XLA fake-quant fallback, which
uses the same int8 grids as the Mosaic kernels (tests/test_conv_int8.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import (
    forward,
    forward_calibrate,
    init_params,
    prepare_packed_params,
    scale_quant_stats,
)
from rrin_tpu.params import load_calibration, save_calibration

CFG = ModelConfig()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def frames(rng):
    i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
    return i0, i1


@pytest.fixture(scope="module")
def stats(params, frames):
    _, st = forward_calibrate(params, *frames, 0.5, cfg=CFG)
    return scale_quant_stats(st, 1.2)


class TestCalibrationPersistence:
    def test_roundtrip(self, stats, tmp_path):
        path = str(tmp_path / "calib.npz")
        save_calibration(path, jax.tree.map(np.asarray, stats))
        loaded = load_calibration(path)
        flat_a = jax.tree_util.tree_leaves_with_path(stats)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
        assert len(flat_a) == len(flat_b)
        for path_k, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[path_k]), rtol=1e-6
            )

    def test_loaded_stats_give_identical_output(
        self, params, frames, stats, tmp_path
    ):
        path = str(tmp_path / "calib.npz")
        save_calibration(path, jax.tree.map(np.asarray, stats))
        loaded = load_calibration(path)
        a = forward(params, *frames, 0.5, cfg=CFG, packed=True,
                    quant_stats=stats)
        b = forward(params, *frames, 0.5, cfg=CFG, packed=True,
                    quant_stats=loaded)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_empty_file_rejected(self, tmp_path):
        path = str(tmp_path / "empty.npz")
        np.savez(path)
        with pytest.raises(ValueError, match="no calibration"):
            load_calibration(path)


class TestPrepStatsConsistency:
    def test_prep_without_stats_served_with_stats_raises(
        self, params, frames, stats
    ):
        prep = prepare_packed_params(params, CFG, jnp.float32, hw=(48, 64))
        with pytest.raises(ValueError, match="mismatch"):
            forward(params, *frames, 0.5, cfg=CFG, packed=True,
                    quant_stats=stats, packed_params=prep)

    def test_prep_with_stats_served_without_raises(
        self, params, frames, stats
    ):
        prep = prepare_packed_params(
            params, CFG, jnp.float32, quant_stats=stats, hw=(48, 64)
        )
        with pytest.raises(ValueError, match="mismatch"):
            forward(params, *frames, 0.5, cfg=CFG, packed=True,
                    packed_params=prep)

    def test_prep_with_different_stats_values_raises(
        self, params, frames, stats
    ):
        prep = prepare_packed_params(
            params, CFG, jnp.float32, quant_stats=stats, hw=(48, 64)
        )
        other = scale_quant_stats(stats, 2.0)
        with pytest.raises(ValueError, match="DIFFERENT quant_stats"):
            forward(params, *frames, 0.5, cfg=CFG, packed=True,
                    quant_stats=other, packed_params=prep)

    def test_matching_prep_and_stats_ok(self, params, frames, stats):
        prep = prepare_packed_params(
            params, CFG, jnp.float32, quant_stats=stats, hw=(48, 64)
        )
        ref = forward(params, *frames, 0.5, cfg=CFG, packed=True,
                      quant_stats=stats)
        got = forward(params, *frames, 0.5, cfg=CFG, packed=True,
                      quant_stats=stats, packed_params=prep)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-2
        )


class TestInterpolatorCalibration:
    def _pairs(self, rng, h, w, b=1):
        return (rng.random((b, 2, h, w, 3)) * 255).astype(np.uint8)

    def test_preset_stats_skip_calibration(self, params, stats, rng):
        from rrin_tpu.pipeline import Interpolator

        interp = Interpolator(params, CFG, int8=True,
                              quant_stats=stats)
        out = np.asarray(interp.step(self._pairs(rng, 48, 64)))
        assert out.shape == (1, 1, 48, 64, 3)
        # the preset tree was installed verbatim (no device_calibrate ran)
        assert interp._quant_stats[(48, 64)] is stats

    def test_int8_new_unsupported_shape_raises_friendly(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        interp = Interpolator(params, CFG, int8=True)
        interp.step(self._pairs(rng, 48, 64))
        # 30x60 pads to 32x64, which the packed path does not support —
        # must get the friendly shape error, not forward()'s internal one.
        with pytest.raises(ValueError, match="does not\\s+support 30x60"):
            interp.step(self._pairs(rng, 30, 60))

    def test_int8_second_resolution_recalibrates(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        interp = Interpolator(params, CFG, int8=True)
        interp.step(self._pairs(rng, 48, 64))
        interp.step(self._pairs(rng, 64, 80))
        assert set(interp._quant_stats) == {(48, 64), (64, 80)}
        a = interp._quant_stats[(48, 64)]
        b = interp._quant_stats[(64, 80)]
        # independent calibrations: at least one range differs
        la = np.array([float(x) for x in jax.tree_util.tree_leaves(a)])
        lb = np.array([float(x) for x in jax.tree_util.tree_leaves(b)])
        assert not np.allclose(la, lb)

    def test_exp3_warns_about_batch_growth(self, params):
        from rrin_tpu.pipeline import Interpolator

        with pytest.warns(UserWarning, match="batch forwards"):
            Interpolator(params, CFG, exp=3, mode="cascade")


class TestEvalPerResolutionInt8:
    def test_mixed_resolution_int8_eval(self, params, tmp_path, rng):
        from rrin_tpu.eval import evaluate, synthesize_triplets

        root = str(tmp_path / "trips")
        synthesize_triplets(os.path.join(root, "a"), 2, hw=(48, 64), seed=0)
        synthesize_triplets(os.path.join(root, "b"), 2, hw=(64, 80), seed=1)
        from rrin_tpu.eval import find_triplets

        dirs = find_triplets(root)
        assert len(dirs) == 4
        report = evaluate(params, dirs, batch_size=2, int8=True)
        assert report["count"] == 4
        assert report["psnr_mean"] is not None

    def test_preset_stats_eval(self, params, stats, tmp_path):
        from rrin_tpu.eval import evaluate, find_triplets, synthesize_triplets

        root = str(tmp_path / "trips")
        synthesize_triplets(root, 2, hw=(48, 64), seed=0)
        report = evaluate(
            params, find_triplets(root), batch_size=2, int8=True,
            quant_stats=stats,
        )
        assert report["count"] == 2
