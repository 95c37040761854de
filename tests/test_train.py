"""Training subsystem tests: loss math, descent, grad-through-pallas-vjp,
data feed, checkpoint save from trainer (SURVEY.md §2.1 'not present in
reference' — new capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.config import ModelConfig
from rrin_tpu.train import Trainer, charbonnier, triplet_batches

CFG = ModelConfig()


class TestLoss:
    def test_charbonnier_at_zero(self):
        x = jnp.zeros((2, 4, 4, 3))
        assert float(charbonnier(x, x)) < 2e-6

    def test_charbonnier_approx_l1(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.5)
        np.testing.assert_allclose(float(charbonnier(a, b)), 0.5, atol=1e-4)

    def test_l1_and_laplacian_zero_at_identity(self, rng):
        from rrin_tpu.train import l1, laplacian

        x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        assert float(l1(x, x)) == 0.0
        assert float(laplacian(x, x)) == 0.0

    def test_laplacian_penalizes_blur_more_than_l1_ratio(self, rng):
        """A blurred prediction keeps low-band energy but loses detail;
        the Laplacian loss must see the detail bands explicitly."""
        from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear
        from rrin_tpu.train import l1, laplacian

        gt = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        blurred = upsample_2x_bilinear(avg_pool_2x(gt))
        assert float(laplacian(blurred, gt)) > float(l1(blurred, gt))

    def test_losses_all_differentiable(self, rng):
        from rrin_tpu.train import LOSSES

        a = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        b = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
        for name, fn in LOSSES.items():
            g = jax.grad(lambda x: fn(x, b))(a)
            assert np.all(np.isfinite(np.asarray(g))), name


class TestSyntheticFeed:
    def test_shapes_and_determinism(self):
        from rrin_tpu.data import synthetic_triplet_batch

        k = jax.random.key(3)
        a = synthetic_triplet_batch(k, 2, (48, 64))
        b = synthetic_triplet_batch(k, 2, (48, 64))
        for x, y in zip(a, b):
            assert x.shape == (2, 48, 64, 3) and x.dtype == jnp.float32
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert float(jnp.min(a[0])) >= 0.0 and float(jnp.max(a[0])) <= 1.0

    def test_gt_is_linear_midpoint(self):
        """gt must be the half-shift frame: warping i0 by half the full
        i0->i1 displacement reproduces gt far better than the plain
        average does (there IS real motion to learn)."""
        from rrin_tpu.data import synthetic_triplet_batch

        i0, gt, i1 = synthetic_triplet_batch(jax.random.key(5), 2, (64, 96))
        blend_err = float(jnp.mean(jnp.abs((i0 + i1) / 2 - gt)))
        assert blend_err > 0.01  # non-trivial motion
        # i0 and i1 are shifts of the SAME texture: per-sample errors of
        # gt vs i0 and vs i1 should be comparable (midpoint, not endpoint)
        e0 = float(jnp.mean(jnp.abs(gt - i0)))
        e1 = float(jnp.mean(jnp.abs(gt - i1)))
        assert 0.5 < e0 / e1 < 2.0


@pytest.mark.slow
class TestTrainer:
    def test_single_device_descends(self, rng):
        trainer = Trainer.create(
            key=jax.random.key(0), learning_rate=1e-3,
            compute_dtype=jnp.float32,
        )
        i0 = rng.random((2, 32, 32, 3), dtype=np.float32)
        i1 = rng.random((2, 32, 32, 3), dtype=np.float32)
        gt = ((i0 + i1) / 2).astype(np.float32)
        losses = [trainer.step(i0, gt, i1) for _ in range(6)]
        assert losses[-1] < losses[0]
        assert trainer.step_count == 6

    def test_grad_through_pallas_custom_vjp(self, rng):
        """The warp custom_vjp must produce the same gradients as the pure
        XLA path (it delegates to jax.vjp of warp_bilinear)."""
        from rrin_tpu.ops.warp import warp_bilinear
        from rrin_tpu.ops.warp_pallas import warp_one_pallas

        img = jnp.asarray(rng.random((1, 32, 128, 3), dtype=np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((1, 32, 128, 2)) * 2).astype(np.float32)
        )

        def loss_p(fl):
            return jnp.sum(warp_one_pallas(img, fl, False) ** 2)

        def loss_x(fl):
            return jnp.sum(warp_bilinear(img, fl) ** 2)

        gp = jax.grad(loss_p)(flow)
        gx = jax.grad(loss_x)(flow)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)


class TestDataFeed:
    def test_triplet_batches(self, tmp_path, rng):
        from rrin_tpu.eval import synthesize_triplets

        root = str(tmp_path / "trips")
        synthesize_triplets(root, count=5, hw=(64, 96))
        it = triplet_batches(root, batch_size=2, crop_hw=(32, 48), seed=1)
        i0, gt, i1 = next(it)
        assert i0.shape == (2, 32, 48, 3)
        assert i0.dtype == np.float32
        assert 0.0 <= i0.min() and i0.max() <= 1.0

    def test_bad_crop_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="multiples of 16"):
            next(triplet_batches("/nonexistent", 1, crop_hw=(30, 48)))

    def test_train_cli_smoke(self, tmp_path, capsys):
        from rrin_tpu.eval import synthesize_triplets
        from rrin_tpu.train import main as train_main

        root = str(tmp_path / "trips2")
        synthesize_triplets(root, count=4, hw=(64, 96))
        ckpt = str(tmp_path / "w.npz")
        rc = train_main([
            "--data", root, "--steps", "3", "--batch", "2",
            "--crop", "32", "48", "--ckpt-out", ckpt, "--fp32",
            "--data-parallel", "1",
        ])
        assert rc == 0
        from rrin_tpu.params import load_params

        params = load_params(ckpt)
        assert "flow" in params and "final" in params


class TestRemat:
    def test_remat_matches_plain_gradients(self, rng):
        """jax.checkpoint must not change the math, only the memory plan."""
        import optax

        from rrin_tpu.models.rrin import init_params
        from rrin_tpu.train import train_step

        params = init_params(jax.random.key(5), CFG)
        opt = optax.sgd(1e-2)
        i0 = rng.random((1, 32, 32, 3), dtype=np.float32)
        i1 = rng.random((1, 32, 32, 3), dtype=np.float32)
        gt = rng.random((1, 32, 32, 3), dtype=np.float32)
        outs = []
        for remat in (False, True):
            p = jax.tree.map(jnp.copy, params)
            s = opt.init(p)
            p2, _, loss = train_step(
                p, s, jnp.asarray(i0), jnp.asarray(gt), jnp.asarray(i1),
                0.5, opt, cfg=CFG, remat=remat,
            )
            outs.append((float(loss), p2))
        assert abs(outs[0][0] - outs[1][0]) < 1e-6
        for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestReviewRegressions:
    """Round-3 review findings (training surface)."""

    def test_laplacian_no_bands_degenerates_to_plain_l1(self):
        """A crop too odd/small for any pyramid level must weight the
        low-pass residual 2**0, not 2**levels (a 32x-scaled L1)."""
        from rrin_tpu.train import l1, laplacian

        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.random((1, 17, 17, 3)), jnp.float32)
        b = jnp.asarray(rng.random((1, 17, 17, 3)), jnp.float32)
        np.testing.assert_allclose(
            float(laplacian(a, b)), float(l1(a, b)), rtol=1e-6
        )

    def test_cli_data_source_checked_before_model_build(self, monkeypatch):
        import rrin_tpu.train as tr

        def boom(*a, **k):
            raise AssertionError("Trainer.create ran before validation")

        monkeypatch.setattr(tr.Trainer, "create", staticmethod(boom))
        with pytest.raises(SystemExit):
            tr.main(["--steps", "1"])
