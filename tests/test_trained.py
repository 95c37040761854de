"""Trained-weights evidence (VERDICT r2 item 5): the committed checkpoint
(benchmarks/trained_synth_f16.npz, produced by benchmarks/train_artifact.py
on TPU) must actually interpolate — beat the naive average on held-out
linear-motion data — and its committed eval artifact's gates must hold.

Skipped cleanly if the artifact has not been generated yet."""

import json
import os

import jax
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "..", "benchmarks", "trained_synth_f16.npz")
REPORT = os.path.join(HERE, "..", "benchmarks", "TRAINED_EVAL.json")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.exists(REPORT)),
    reason="trained artifact not generated (benchmarks/train_artifact.py)",
)


@pytest.fixture(scope="module")
def trained_params():
    from rrin_tpu.params import flatten_params, load_params, unflatten_params

    return unflatten_params({
        k: np.asarray(v, np.float32)
        for k, v in flatten_params(load_params(CKPT)).items()
    })


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


class TestTrainedArtifact:
    def test_report_gates_hold(self):
        with open(REPORT) as f:
            r = json.load(f)
        g = r["gates"]
        assert g["ok"], g
        assert g["trained_beats_random_by_db"] > 3.0, g
        assert abs(g["int8_vs_fp32_db"]) < 0.5, g

    def test_ckpt_beats_naive_blend_on_fresh_data(self, trained_params, rng):
        """Weights generalize: on a triplet the training never saw (host
        numpy recipe, not the on-device feed), the prediction must beat
        the frame average — proof of real learned flow + blending."""
        from rrin_tpu.data import synthetic_triplet_batch
        from rrin_tpu.models.rrin import forward

        i0, gt, i1 = synthetic_triplet_batch(
            jax.random.key(99_991), 1, (128, 192)
        )
        pred = forward(trained_params, i0, i1, 0.5)
        p_model = _psnr(pred, gt)
        p_blend = _psnr((np.asarray(i0) + np.asarray(i1)) / 2, gt)
        assert p_model > p_blend + 2.0, (p_model, p_blend)

    def test_int8_close_to_fp32_with_trained_weights(self, trained_params):
        """The int8 calibration quality gate with REAL (non-random)
        activation statistics, on CPU via the fake-quant fallback (same
        int8 grids as the Mosaic kernels)."""
        import jax.numpy as jnp

        from rrin_tpu.data import synthetic_triplet_batch
        from rrin_tpu.models.rrin import forward, forward_calibrate, scale_quant_stats

        i0, gt, i1 = synthetic_triplet_batch(
            jax.random.key(7_777), 1, (96, 128)
        )
        ref = forward(trained_params, i0, i1, 0.5)
        _, st = forward_calibrate(trained_params, i0, i1, 0.5,
                                  compute_dtype=jnp.bfloat16)
        q = forward(trained_params, i0, i1, 0.5,
                    compute_dtype=jnp.bfloat16, packed=True,
                    quant_stats=scale_quant_stats(st, 1.2))
        p_ref = _psnr(ref, gt)
        p_q = _psnr(q, gt)
        assert p_q > p_ref - 1.0, (p_ref, p_q)

    def test_int8_percentile_with_trained_weights(self, trained_params):
        """Percentile-clipped calibration against REAL activation
        statistics: quality holds within the same 1 dB envelope and the
        saturation telemetry confirms the clip stays tiny (the feature's
        whole premise: outlier tails are safe to trade for grid
        resolution)."""
        import jax.numpy as jnp

        from rrin_tpu.data import synthetic_triplet_batch
        from rrin_tpu.models.rrin import (
            forward,
            forward_calibrate,
            forward_saturation,
            scale_quant_stats,
        )

        i0, gt, i1 = synthetic_triplet_batch(
            jax.random.key(7_777), 1, (96, 128)
        )
        ref = forward(trained_params, i0, i1, 0.5)
        _, st = forward_calibrate(trained_params, i0, i1, 0.5,
                                  compute_dtype=jnp.bfloat16,
                                  quantile=0.999)
        serving = scale_quant_stats(st, 1.2)
        q = forward(trained_params, i0, i1, 0.5,
                    compute_dtype=jnp.bfloat16, packed=True,
                    quant_stats=serving)
        p_ref = _psnr(ref, gt)
        p_q = _psnr(q, gt)
        assert p_q > p_ref - 1.0, (p_ref, p_q)
        sat = forward_saturation(trained_params, i0, i1, serving, 0.5,
                                 compute_dtype=jnp.bfloat16)
        rates = [float(x) for x in jax.tree.leaves(sat)]
        assert all(0.0 <= r <= 1.0 for r in rates)
        assert max(rates) < 0.02, max(rates)  # 0.1% tail, margin-shrunk
