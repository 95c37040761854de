"""Metric sanity tests (no skimage in env; verified against analytic cases
and torch-free numpy reference)."""

import jax.numpy as jnp
import numpy as np

from rrin_tpu.metrics import psnr, ssim


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((1, 16, 16, 3))
        b = jnp.full((1, 16, 16, 3), 0.1)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20 dB
        np.testing.assert_allclose(np.asarray(psnr(a, b)), [20.0], atol=1e-4)

    def test_identical_is_capped_high(self):
        a = jnp.ones((2, 8, 8, 3)) * 0.5
        assert float(psnr(a, a)[0]) > 100.0

    def test_batch_independence(self, rng):
        a = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
        b = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
        full = np.asarray(psnr(a, b))
        single = [float(psnr(a[i : i + 1], b[i : i + 1])[0]) for i in range(2)]
        np.testing.assert_allclose(full, single, rtol=1e-6)


class TestSSIM:
    def test_identical_is_one(self, rng):
        a = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        np.testing.assert_allclose(np.asarray(ssim(a, a)), [1.0], atol=1e-6)

    def test_uncorrelated_noise_is_low(self, rng):
        a = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
        b = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
        assert float(ssim(a, b)[0]) < 0.2

    def test_monotone_with_noise_level(self, rng):
        a = rng.random((1, 64, 64, 3), dtype=np.float32)
        vals = []
        for sigma in (0.01, 0.05, 0.2):
            noisy = np.clip(a + sigma * rng.standard_normal(a.shape), 0, 1).astype(
                np.float32
            )
            vals.append(float(ssim(jnp.asarray(a), jnp.asarray(noisy))[0]))
        assert vals[0] > vals[1] > vals[2]

    def test_constant_shift_penalized_less_than_noise(self, rng):
        a = rng.random((1, 64, 64, 1), dtype=np.float32) * 0.8
        shifted = (a + 0.1).astype(np.float32)
        noisy = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
        assert float(ssim(jnp.asarray(a), jnp.asarray(shifted))[0]) > float(
            ssim(jnp.asarray(a), jnp.asarray(noisy))[0]
        )
