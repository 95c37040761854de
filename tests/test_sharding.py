"""Multi-chip correctness on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded vs single-device outputs identical; training step runs under DP and
DP+spatial shardings; dryrun_multichip entry contract."""

import importlib.util
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import forward, init_params
from rrin_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicate_params,
    shard_pairs,
)

CFG = ModelConfig()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), CFG)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices; got "
        f"{jax.devices()}"
    )


class TestShardedForward:
    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_dp_matches_single_device(self, params, rng):
        mesh = make_mesh()  # 8x1
        i0 = rng.random((8, 32, 48, 3), dtype=np.float32)
        i1 = rng.random((8, 32, 48, 3), dtype=np.float32)
        want = np.asarray(forward(params, jnp.asarray(i0), jnp.asarray(i1), 0.5, cfg=CFG))
        pr = replicate_params(mesh, params)
        s0, s1 = shard_pairs(mesh, i0, i1)
        got = np.asarray(forward(pr, s0, s1, 0.5, cfg=CFG))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_dp_spatial_matches_single_device(self, params, rng):
        mesh = make_mesh(n_data=4, n_spatial=2)
        i0 = rng.random((4, 64, 48, 3), dtype=np.float32)
        i1 = rng.random((4, 64, 48, 3), dtype=np.float32)
        want = np.asarray(forward(params, jnp.asarray(i0), jnp.asarray(i1), 0.5, cfg=CFG))
        pr = replicate_params(mesh, params)
        s0, s1 = shard_pairs(mesh, i0, i1, spatial_dim=1)
        got = np.asarray(forward(pr, s0, s1, 0.5, cfg=CFG))
        # Spatial sharding changes conv reduction order at halos -> small fp drift.
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_output_sharding_preserved(self, params, rng):
        mesh = make_mesh()
        i0 = rng.random((8, 32, 48, 3), dtype=np.float32)
        i1 = rng.random((8, 32, 48, 3), dtype=np.float32)
        pr = replicate_params(mesh, params)
        s0, s1 = shard_pairs(mesh, i0, i1)
        out = forward(pr, s0, s1, 0.5, cfg=CFG)
        # Output stays batch-sharded: no implicit full gather.
        assert out.sharding.is_equivalent_to(batch_sharding(mesh), out.ndim)


class TestShardMapDP:
    """Pure batch DP serves the FULL fast path via shard_map of the
    single-device program (VERDICT r2 item 1): packed layout, int8,
    prepare-once constants — all per device, no jit-SPMD restrictions."""

    def _pairs(self, rng, b, h, w):
        return (rng.random((b, 2, h, w, 3)) * 255).astype(np.uint8)

    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_dp_packed_bf16_matches_single_device(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        pairs = self._pairs(rng, 4, 48, 64)
        single = Interpolator(params, CFG, use_pallas=True, packed=True)
        multi = Interpolator(params, CFG, use_pallas=True, packed=True,
                             data_parallel=4)
        assert multi._dp_fast
        want = np.asarray(single.step(pairs))
        got = np.asarray(multi.step(pairs))
        # uint8-quantized outputs absorb fp noise up to the last bit;
        # batch-4-at-once vs per-shard batch-1 XLA convs differ in
        # vectorization order, so ~0.5% of pixels flip by one count.
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 1 and (diff != 0).mean() < 0.02, (
            diff.max(), (diff != 0).mean())

    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_dp_int8_matches_single_device(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        pairs = self._pairs(rng, 4, 48, 64)
        single = Interpolator(params, CFG, use_pallas=True, int8=True)
        multi = Interpolator(params, CFG, use_pallas=True, int8=True,
                             data_parallel=4)
        want = np.asarray(single.step(pairs))
        got = np.asarray(multi.step(pairs))
        # int8 grids can amplify an LSB flip across a conv chain slightly.
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 3 and (diff != 0).mean() < 0.05, (
            diff.max(), (diff != 0).mean())

    def test_dp_padded_height_bf16_matches_single_device(self, params, rng):
        """h % 64 != 0 (VERDICT r3 #8): at 176x128 the level-2/3 packed
        kernels run with IN-PATH H padding (h//4=44 and h//8=22 both pad
        to the next multiple of 8) — the 48x64 tests above never reach
        them (h//4 < min_h). Proves the padded-level branch composes
        with shard_map."""
        from rrin_tpu.models.unet import packed_branch_flags
        from rrin_tpu.pipeline import Interpolator

        flags = packed_branch_flags(176, 128, CFG)
        assert flags[0] and flags[1], f"l2/l3 kernels not active: {flags}"
        pairs = self._pairs(rng, 4, 176, 128)
        single = Interpolator(params, CFG, use_pallas=True, packed=True)
        multi = Interpolator(params, CFG, use_pallas=True, packed=True,
                             data_parallel=4)
        want = np.asarray(single.step(pairs))
        got = np.asarray(multi.step(pairs))
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 1 and (diff != 0).mean() < 0.02, (
            diff.max(), (diff != 0).mean())

    @pytest.mark.slow  # >60s (durations run r5) — full suite still runs it
    def test_dp_padded_height_int8_matches_single_device(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        pairs = self._pairs(rng, 4, 176, 128)
        single = Interpolator(params, CFG, use_pallas=True, int8=True)
        multi = Interpolator(params, CFG, use_pallas=True, int8=True,
                             data_parallel=4)
        want = np.asarray(single.step(pairs))
        got = np.asarray(multi.step(pairs))
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 3 and (diff != 0).mean() < 0.05, (
            diff.max(), (diff != 0).mean())

    @pytest.mark.slow
    def test_dp_720p_class_int8_matches_single_device(self, params, rng):
        """The VERDICT-suggested 368x640 shape: adds the l4 packed kernel
        (and its padded H) to the shard_map composition, int8 included."""
        from rrin_tpu.models.unet import packed_branch_flags
        from rrin_tpu.pipeline import Interpolator

        assert packed_branch_flags(368, 640, CFG)[6], "l4 kernel inactive"
        pairs = self._pairs(rng, 2, 368, 640)
        single = Interpolator(params, CFG, use_pallas=True, int8=True)
        multi = Interpolator(params, CFG, use_pallas=True, int8=True,
                             data_parallel=2)
        want = np.asarray(single.step(pairs))
        got = np.asarray(multi.step(pairs))
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 3 and (diff != 0).mean() < 0.05, (
            diff.max(), (diff != 0).mean())

    def test_dp_calibration_equals_full_batch(self, params, rng):
        """pmax-folded sharded calibration == single-device full-batch."""
        from rrin_tpu.pipeline import Interpolator, device_calibrate

        pairs = self._pairs(rng, 4, 48, 64)
        multi = Interpolator(params, CFG, int8=True, data_parallel=4)
        got = multi._dp_calibrate(pairs, (0, 0))
        want = device_calibrate(
            params, jnp.asarray(pairs), cfg=CFG,
            compute_dtype=jnp.bfloat16, pad_hw=(0, 0),
        )
        # bf16 convs: batch-4-at-once vs per-shard batch-1 accumulation
        # differs by a bf16 ulp (~0.4% relative) on the |x| maxima.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-6
            ),
            want, got,
        )

    @pytest.mark.slow
    def test_dp_percentile_calibration(self, params, rng):
        """jnp.quantile composes with shard_map (pmax of per-shard
        quantiles = safe upper approximation): ranges must be bounded by
        the DP absmax ranges and the int8 DP step must still run."""
        from rrin_tpu.pipeline import Interpolator

        pairs = self._pairs(rng, 4, 48, 64)
        mp = Interpolator(params, CFG, use_pallas=True, int8=True,
                          int8_percentile=99.0, data_parallel=4)
        ma = Interpolator(params, CFG, use_pallas=True, int8=True,
                          data_parallel=4)
        out = np.asarray(mp.step(pairs))
        ma.step(pairs)
        assert out.shape == (4, 1, 48, 64, 3)
        qp = np.array([float(x) for x in
                       jax.tree.leaves(mp._quant_stats[(48, 64)])])
        qa = np.array([float(x) for x in
                       jax.tree.leaves(ma._quant_stats[(48, 64)])])
        assert np.all(qp <= qa * 1.01) and np.any(qp < qa * 0.999)

    def test_dp_output_stays_batch_sharded(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        multi = Interpolator(params, CFG, use_pallas=True, packed=True,
                             data_parallel=4)
        out = multi.step(self._pairs(rng, 4, 48, 64))
        assert out.sharding.is_equivalent_to(
            batch_sharding(multi.mesh), out.ndim
        )

    def test_dp_int8_uses_prepared_params(self, params, rng):
        from rrin_tpu.pipeline import Interpolator

        multi = Interpolator(params, CFG, use_pallas=True, int8=True,
                             data_parallel=2)
        multi.step(self._pairs(rng, 2, 48, 64))
        prep = multi._packed_params[(48, 64)]
        assert prep is not None and prep.quant_fp not in (None, "unverified")

    def test_int8_spatial_still_rejected(self, params):
        from rrin_tpu.pipeline import Interpolator

        with pytest.raises(ValueError, match="spatial"):
            Interpolator(params, CFG, int8=True, spatial=2)

    @pytest.mark.slow
    def test_dp_forced_kernels_interpret_mode(self, params, rng):
        """The sharded step with the Mosaic kernels FORCED (interpret
        mode): proves pallas_call executes inside shard_map — the exact
        mechanism a real multi-chip deployment relies on."""
        import rrin_tpu.ops.conv_packed as cpk
        import rrin_tpu.ops.warp_pallas as wp
        from jax.experimental.pallas import tpu as pltpu
        from rrin_tpu.pipeline import Interpolator

        pairs = self._pairs(rng, 2, 48, 64)
        single = Interpolator(params, CFG, use_pallas=True, packed=True)
        want = np.asarray(single.step(pairs))

        cpk._FORCE_KERNEL = True
        wp._FORCE_KERNEL = True
        try:
            with pltpu.force_tpu_interpret_mode():
                multi = Interpolator(params, CFG, use_pallas=True,
                                     packed=True, data_parallel=2)
                # prepare-once is skipped: interpret-mode pallas lowers to
                # io_callback, which the SPMD partitioner rejects in the
                # jitted prepare pass (the shard_map step itself is fine —
                # and on real TPU/CPU there is no callback at all).
                multi._packed_params[(48, 64)] = None
                got = np.asarray(multi.step(pairs))
        finally:
            cpk._FORCE_KERNEL = False
            wp._FORCE_KERNEL = False
        # forced-kernel (interpret) vs XLA-fallback numerics differ on
        # many pixels (bf16 pair gathers, kernel accumulation order) but
        # only at the last uint8 count — gate the magnitude, not the
        # count of one-LSB flips.
        diff = np.abs(want.astype(int) - got.astype(int))
        assert diff.max() <= 2 and (diff > 1).mean() < 0.01, (
            diff.max(), (diff > 1).mean())


@pytest.mark.slow
class TestShardedTraining:
    def test_dp_train_step_runs_and_descends(self, rng):
        from rrin_tpu.train import Trainer

        mesh = make_mesh()
        trainer = Trainer.create(
            key=jax.random.key(1), mesh=mesh, compute_dtype=jnp.float32,
            learning_rate=1e-3,
        )
        i0 = rng.random((8, 32, 32, 3), dtype=np.float32)
        i1 = rng.random((8, 32, 32, 3), dtype=np.float32)
        gt = ((i0 + i1) / 2).astype(np.float32)
        losses = [trainer.step(i0, gt, i1) for _ in range(5)]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], f"no descent: {losses}"

    def test_dp_grads_match_single_device(self, rng):
        """The ICI psum must reproduce single-device gradients exactly."""
        import optax

        from rrin_tpu.train import train_step

        mesh = make_mesh()
        params = init_params(jax.random.key(2), CFG)
        opt = optax.sgd(1e-2)
        opt_state = opt.init(params)
        i0 = rng.random((8, 32, 32, 3), dtype=np.float32)
        i1 = rng.random((8, 32, 32, 3), dtype=np.float32)
        gt = rng.random((8, 32, 32, 3), dtype=np.float32)

        # train_step donates params/opt_state; keep pristine copies for the
        # sharded run.
        pr = replicate_params(mesh, jax.tree.map(jnp.copy, params))
        osr = replicate_params(mesh, jax.tree.map(jnp.copy, opt_state))
        p1, _, loss1 = train_step(
            params, opt_state, jnp.asarray(i0), jnp.asarray(gt), jnp.asarray(i1),
            0.5, opt, cfg=CFG,
        )
        s0, sg, s1 = shard_pairs(mesh, i0, gt, i1)
        p2, _, loss2 = train_step(pr, osr, s0, sg, s1, 0.5, opt, cfg=CFG)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
class TestGraftEntry:
    @pytest.fixture(scope="class")
    def graft(self):
        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_entry_compiles_and_runs(self, graft):
        fn, args = graft.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 256, 448, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_dryrun_multichip_8(self, graft, capsys):
        graft.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    def test_dryrun_multichip_4(self, graft, capsys):
        graft.dryrun_multichip(4)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    def test_dryrun_self_provisions_without_flags(self):
        """Driver scenario: fresh process, NO XLA_FLAGS, default backend
        whatever the machine has — the dryrun must self-provision CPU
        devices and never dispatch on a non-CPU device (its body asserts
        every param buffer is on CPU)."""
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        entry = os.path.join(
            os.path.dirname(__file__), "..", "__graft_entry__.py"
        )
        res = subprocess.run(
            [sys.executable, os.path.abspath(entry), "--dryrun", "8"],
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "dryrun_multichip OK" in res.stdout
