"""Shared-flows multi-time forward (models/rrin flows/flows_only;
pipeline._step_body._run_times).

SURVEY.md App-A step 1: the coarse flow U-Net consumes only (I0, I1) — no
t — so one pair interpolated at m times can compute it ONCE and feed the
m per-time cascades. These tests pin that the reuse is exactly the same
math on the plain float path, the packed fast path, and int8: flow-UNet
outputs are deterministic per (program, inputs), so sharing within one
compiled program must be bit-identical (TestForwardFlowsArg). Across
DIFFERENT compiled programs (the scan-wrapped device_step vs standalone
forwards) XLA's f32 reassociation allows an ulp — see
TestDeviceStepSharedFlows._assert_one_ulp_step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import forward, init_params
from rrin_tpu.pipeline import device_step

CFG = ModelConfig()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(7), CFG)


@pytest.fixture(scope="module")
def frames(rng):
    i0 = jnp.asarray(rng.random((2, 48, 64, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((2, 48, 64, 3), dtype=np.float32))
    return i0, i1


class TestForwardFlowsArg:
    def test_flows_only_shape_dtype(self, params, frames):
        i0, i1 = frames
        fl = forward(params, i0, i1, 0.5, cfg=CFG, flows_only=True)
        assert fl.shape == (2, 48, 64, 4)
        assert fl.dtype == jnp.float32

    @pytest.mark.parametrize("packed", [False, True])
    def test_roundtrip_bit_identical(self, params, frames, packed):
        """forward(flows=forward(flows_only)) == forward() exactly."""
        i0, i1 = frames
        kw = dict(cfg=CFG, compute_dtype=jnp.float32, packed=packed,
                  use_pallas=packed)
        fl = forward(params, i0, i1, 0.5, flows_only=True, **kw)
        want = np.asarray(forward(params, i0, i1, 0.3, **kw))
        got = np.asarray(forward(params, i0, i1, 0.3, flows=fl, **kw))
        np.testing.assert_array_equal(got, want)

    def test_roundtrip_int8(self, params, frames):
        from rrin_tpu.models.rrin import forward_calibrate

        i0, i1 = frames
        kw = dict(cfg=CFG, compute_dtype=jnp.float32, packed=True,
                  use_pallas=True)
        _, stats = forward_calibrate(params, i0, i1, 0.5, cfg=CFG,
                                     compute_dtype=jnp.float32)
        fl = forward(params, i0, i1, 0.5, flows_only=True,
                     quant_stats=stats, **kw)
        want = np.asarray(
            forward(params, i0, i1, 0.25, quant_stats=stats, **kw))
        got = np.asarray(
            forward(params, i0, i1, 0.25, flows=fl, quant_stats=stats,
                    **kw))
        np.testing.assert_array_equal(got, want)

    def test_flows_only_matches_cascade_stage1(self, params, frames):
        """flows_only returns exactly what the full cascade's step 1
        computes: interpolating with flows=that must equal plain forward
        (covered above); here pin the tensor itself against the plain
        U-Net applied to concat(i0, i1)."""
        from rrin_tpu.models.unet import unet_apply

        i0, i1 = frames
        fl = forward(params, i0, i1, 0.5, cfg=CFG, flows_only=True)
        want = unet_apply(
            params["flow"], jnp.concatenate([i0, i1], axis=-1), CFG)
        np.testing.assert_array_equal(
            np.asarray(fl), np.asarray(want.astype(jnp.float32)))


class TestDeviceStepSharedFlows:
    """m > 1 device steps share the flow U-Net per pair and run the
    times sequentially; outputs must match the per-time forwards to
    within one u8 rounding step (same math, different compiled
    programs — see _assert_one_ulp_step)."""

    def _per_t_reference(self, params, pairs, t_list, **kw):
        x = jnp.asarray(pairs, jnp.float32) / 255.0
        outs = []
        for t in t_list:
            o = forward(params, x[:, 0], x[:, 1], t, cfg=CFG, **kw)
            outs.append(jnp.round(jnp.clip(o, 0, 1) * 255).astype(
                jnp.uint8))
        return np.stack([np.asarray(o) for o in outs], axis=1)

    def _assert_one_ulp_step(self, out, want):
        """Same MATH, two COMPILED PROGRAMS: the sequential lax.scan
        wraps the cascade in a loop body that XLA may schedule with
        different f32/bf16 reassociation than the standalone forward —
        values agree to an ulp, and the *255-round amplifies that to at
        most one u8 step on isolated rounding-boundary pixels (measured
        1-2 / 55296 on ~27% of random draws in f32 on CPU; the round-4
        strict-equality version of this test was data-dependently
        flaky). Bitwise identity WITHIN one program structure is pinned
        by test_seq_matches_legacy_batched / test_roundtrip_*."""
        diff = np.abs(out.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()
        assert (diff != 0).mean() < 1e-3, (diff != 0).mean()

    @pytest.mark.parametrize("compute_dtype", [jnp.float32, jnp.bfloat16])
    def test_direct_exp2(self, params, rng, compute_dtype):
        pairs = rng.integers(0, 256, (2, 2, 48, 64, 3), dtype=np.uint8)
        out = np.asarray(device_step(
            params, jnp.asarray(pairs), exp=2, mode="direct", cfg=CFG,
            compute_dtype=compute_dtype, pad_hw=(0, 0)))
        want = self._per_t_reference(
            params, pairs, [0.25, 0.5, 0.75], compute_dtype=compute_dtype)
        assert out.shape == (2, 3, 48, 64, 3)
        self._assert_one_ulp_step(out, want)

    def test_times_mode(self, params, rng):
        pairs = rng.integers(0, 256, (1, 2, 48, 64, 3), dtype=np.uint8)
        ts = jnp.asarray([[0.2, 0.5, 0.9]], jnp.float32)
        out = np.asarray(device_step(
            params, jnp.asarray(pairs), mode="times", cfg=CFG,
            compute_dtype=jnp.float32, pad_hw=(0, 0), ts=ts))
        want = self._per_t_reference(
            params, pairs, [0.2, 0.5, 0.9], compute_dtype=jnp.float32)
        self._assert_one_ulp_step(out, want)

    def test_seq_matches_legacy_batched(self, params, rng, monkeypatch):
        """RRIN_MF_SEQ=0 (the round-4 maximal-batch forward) and the
        default sequential lax.scan agree to one u8 rounding step — the
        valve is an A/B knob, not a semantics switch. Env is read at
        trace time, so the jit cache is cleared between flips."""
        pairs = rng.integers(0, 256, (2, 2, 48, 64, 3), dtype=np.uint8)
        kw = dict(exp=2, mode="direct", cfg=CFG,
                  compute_dtype=jnp.float32, pad_hw=(0, 0))
        out_seq = np.asarray(device_step(params, jnp.asarray(pairs), **kw))
        monkeypatch.setenv("RRIN_MF_SEQ", "0")
        device_step.clear_cache()
        try:
            out_leg = np.asarray(
                device_step(params, jnp.asarray(pairs), **kw))
        finally:
            monkeypatch.undo()
            device_step.clear_cache()
        self._assert_one_ulp_step(out_seq, out_leg)

    def test_unroll_matches_rolled_scan(self, params, rng, monkeypatch):
        """RRIN_MF_UNROLL=1 (scan unrolled, no while loop in the HLO)
        agrees with the rolled default to one u8 rounding step — the
        valve only changes program shape (used to exonerate while-loop
        overhead in the round-5 TPU A/B)."""
        pairs = rng.integers(0, 256, (1, 2, 48, 64, 3), dtype=np.uint8)
        kw = dict(exp=2, mode="direct", cfg=CFG,
                  compute_dtype=jnp.float32, pad_hw=(0, 0))
        out_rolled = np.asarray(
            device_step(params, jnp.asarray(pairs), **kw))
        monkeypatch.setenv("RRIN_MF_UNROLL", "1")
        device_step.clear_cache()
        try:
            out_unrolled = np.asarray(
                device_step(params, jnp.asarray(pairs), **kw))
        finally:
            monkeypatch.undo()
            device_step.clear_cache()
        self._assert_one_ulp_step(out_rolled, out_unrolled)

    def test_direct_exp2_packed_int8(self, params, rng):
        """The sharing composes with the packed fast path + int8 (CPU
        routes the kernels to the exact-grid XLA fallback)."""
        from rrin_tpu.pipeline import device_calibrate

        pairs = rng.integers(0, 256, (1, 2, 48, 64, 3), dtype=np.uint8)
        stats = device_calibrate(
            params, jnp.asarray(pairs), cfg=CFG,
            compute_dtype=jnp.float32, pad_hw=(0, 0))
        kw = dict(cfg=CFG, compute_dtype=jnp.float32, use_pallas=True,
                  packed=True)
        out = np.asarray(device_step(
            params, jnp.asarray(pairs), exp=2, mode="direct",
            pad_hw=(0, 0), quant_stats=stats, **kw))
        want = self._per_t_reference(
            params, pairs, [0.25, 0.5, 0.75],
            compute_dtype=jnp.float32, use_pallas=True, packed=True,
            quant_stats=stats)
        self._assert_one_ulp_step(out, want)
