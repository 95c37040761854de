"""RRIN_ENTRY_GROUPS valve (models/rrin._cascade step 3): carrying
I0 ∥ I1 and the refined Ft0 ∥ Ft1 as single tensors is a pure regrouping
of the same values — every U-Net entry sees the identical channel concat
and the warp consumes bitwise-equal flow slices. These tests pin the
grouped (default) and ungrouped paths bitwise-equal so the A/B escape
hatch cannot silently rot (ADVICE r4), on the plain float path, bf16,
and the packed/int8 fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrin_tpu.config import ModelConfig
from rrin_tpu.models import rrin

CFG = ModelConfig()


@pytest.fixture(scope="module")
def params():
    return rrin.init_params(jax.random.key(11), CFG)


@pytest.fixture(scope="module")
def frames(rng):
    i0 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
    i1 = jnp.asarray(rng.random((1, 48, 64, 3), dtype=np.float32))
    return i0, i1


def _both_ways(params, i0, i1, **kw):
    """forward() with _ENTRY_GROUPS forced ON then OFF (the flag is read
    at trace time — the jit cache is dropped around each flip)."""
    old = rrin._ENTRY_GROUPS
    outs = {}
    try:
        for flag in (True, False):
            rrin._ENTRY_GROUPS = flag
            rrin._forward_jit.clear_cache()
            outs[flag] = np.asarray(
                rrin.forward(params, i0, i1, 0.4, **kw))
    finally:
        rrin._ENTRY_GROUPS = old
        rrin._forward_jit.clear_cache()
    return outs[True], outs[False]


class TestEntryGroupsEquivalence:
    @pytest.mark.parametrize("compute_dtype", [jnp.float32, jnp.bfloat16])
    def test_plain_path_bit_identical(self, params, frames, compute_dtype):
        i0, i1 = frames
        on, off = _both_ways(params, i0, i1, cfg=CFG,
                             compute_dtype=compute_dtype)
        np.testing.assert_array_equal(on, off)

    def test_packed_path_bit_identical(self, params, frames):
        i0, i1 = frames
        on, off = _both_ways(params, i0, i1, cfg=CFG,
                             compute_dtype=jnp.float32, use_pallas=True,
                             packed=True)
        np.testing.assert_array_equal(on, off)

    def test_int8_path_bit_identical(self, params, frames):
        from rrin_tpu.models.rrin import forward_calibrate

        i0, i1 = frames
        _, stats = forward_calibrate(params, i0, i1, 0.5, cfg=CFG,
                                     compute_dtype=jnp.float32)
        on, off = _both_ways(params, i0, i1, cfg=CFG,
                             compute_dtype=jnp.float32, use_pallas=True,
                             packed=True, quant_stats=stats)
        np.testing.assert_array_equal(on, off)
