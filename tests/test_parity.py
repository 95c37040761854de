"""Golden parity: JAX cascade vs the PyTorch oracle with shared random
weights (SURVEY.md §4 "Parity/golden" — substitutes for the unavailable
pretrained checkpoint). Also locks the state-dict converter round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rrin_tpu import ModelConfig, init_params
from rrin_tpu.models.rrin import forward
from rrin_tpu.models.unet import unet_apply
from rrin_tpu.oracle.torch_ref import Net as TorchNet
from rrin_tpu.oracle.torch_ref import UNet as TorchUNet
from rrin_tpu.params import (
    convert_torch_state_dict,
    flatten_params,
    load_params,
    params_to_torch_state_dict,
    save_params,
)

CFG = ModelConfig()


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(x):
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def shared_net():
    """One torch Net + its converted JAX params."""
    torch.manual_seed(7)
    tnet = TorchNet().eval()
    params = convert_torch_state_dict(tnet.state_dict())
    return tnet, params


class TestConverter:
    def test_round_trip(self, shared_net):
        tnet, params = shared_net
        sd = params_to_torch_state_dict(params)
        for k, v in tnet.state_dict().items():
            np.testing.assert_array_equal(sd[k].numpy(), v.numpy())

    def test_module_prefix_stripped(self, shared_net):
        tnet, params = shared_net
        prefixed = {"module." + k: v for k, v in tnet.state_dict().items()}
        params2 = convert_torch_state_dict(prefixed)
        for k, v in flatten_params(params).items():
            np.testing.assert_array_equal(flatten_params(params2)[k], v)

    def test_npz_round_trip(self, shared_net, tmp_path):
        _, params = shared_net
        p = str(tmp_path / "ckpt.npz")
        save_params(p, params)
        loaded = load_params(p)
        for k, v in flatten_params(params).items():
            np.testing.assert_array_equal(flatten_params(loaded)[k], v)

    def test_init_shapes_match_torch(self):
        params = init_params(jax.random.key(0), CFG)
        tnet = TorchNet()
        converted = convert_torch_state_dict(tnet.state_dict())
        ours = flatten_params(params)
        theirs = flatten_params(converted)
        assert set(ours) == set(theirs)
        for k in ours:
            assert ours[k].shape == theirs[k].shape, k


class TestUNetParity:
    def test_single_unet(self, rng):
        torch.manual_seed(3)
        tun = TorchUNet(6, 4).eval()
        params = convert_torch_state_dict(tun.state_dict())
        x = rng.standard_normal((1, 32, 48, 6), dtype=np.float32)
        with torch.no_grad():
            want = _nhwc(tun(_nchw(x)))
        got = np.asarray(unet_apply(params, jnp.asarray(x), CFG))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


class TestFullCascadeParity:
    @pytest.mark.parametrize("t", [0.5, 0.25])
    def test_cascade(self, shared_net, rng, t):
        tnet, params = shared_net
        i0 = rng.random((1, 64, 96, 3), dtype=np.float32)
        i1 = np.clip(i0 + 0.05 * rng.standard_normal((1, 64, 96, 3)), 0, 1).astype(
            np.float32
        )
        with torch.no_grad():
            want = _nhwc(tnet(_nchw(i0), _nchw(i1), t=t))
        got = np.asarray(forward(params, jnp.asarray(i0), jnp.asarray(i1), t, cfg=CFG))
        # 4 cascaded U-Nets amplify fp differences; output is in [0,1].
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_per_batch_t_vector(self, shared_net, rng):
        tnet, params = shared_net
        i0 = rng.random((2, 32, 32, 3), dtype=np.float32)
        i1 = rng.random((2, 32, 32, 3), dtype=np.float32)
        ts = np.array([0.25, 0.75], dtype=np.float32)
        got = np.asarray(
            forward(params, jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(ts), cfg=CFG)
        )
        for b, t in enumerate(ts):
            with torch.no_grad():
                want = _nhwc(tnet(_nchw(i0[b : b + 1]), _nchw(i1[b : b + 1]), t=float(t)))
            np.testing.assert_allclose(got[b : b + 1], want, atol=2e-4)

    def test_bf16_close_to_fp32(self, shared_net, rng):
        _, params = shared_net
        i0 = rng.random((1, 32, 48, 3), dtype=np.float32)
        i1 = rng.random((1, 32, 48, 3), dtype=np.float32)
        full = np.asarray(forward(params, jnp.asarray(i0), jnp.asarray(i1), 0.5, cfg=CFG))
        half = np.asarray(
            forward(
                params,
                jnp.asarray(i0),
                jnp.asarray(i1),
                0.5,
                cfg=CFG,
                compute_dtype=jnp.bfloat16,
            )
        )
        assert half.dtype == np.float32
        # bf16 convs: expect ~1e-2 agreement on [0,1] outputs.
        assert np.abs(full - half).mean() < 2e-2


class TestParityMetrics:
    """BASELINE.json metric 3: PSNR/SSIM parity with the PyTorch reference
    expressed in the metric itself (not just elementwise tolerance)."""

    def test_psnr_vs_oracle_fp32(self, shared_net, rng):
        from rrin_tpu.metrics import psnr, ssim

        tnet, params = shared_net
        i0 = rng.random((1, 64, 96, 3), dtype=np.float32)
        i1 = np.clip(i0 + 0.1 * rng.standard_normal(i0.shape), 0, 1).astype(
            np.float32
        )
        with torch.no_grad():
            want = _nhwc(tnet(_nchw(i0), _nchw(i1), t=0.5))
        got = forward(params, jnp.asarray(i0), jnp.asarray(i1), 0.5, cfg=CFG)
        p = float(psnr(got, jnp.asarray(want))[0])
        s = float(ssim(got, jnp.asarray(want))[0])
        assert p > 60.0, f"fp32 parity PSNR {p} dB"
        assert s > 0.999, f"fp32 parity SSIM {s}"

    def test_psnr_vs_oracle_bf16(self, shared_net, rng):
        from rrin_tpu.metrics import psnr

        tnet, params = shared_net
        i0 = rng.random((1, 64, 96, 3), dtype=np.float32)
        i1 = np.clip(i0 + 0.1 * rng.standard_normal(i0.shape), 0, 1).astype(
            np.float32
        )
        with torch.no_grad():
            want = _nhwc(tnet(_nchw(i0), _nchw(i1), t=0.5))
        got = forward(
            params, jnp.asarray(i0), jnp.asarray(i1), 0.5, cfg=CFG,
            compute_dtype=jnp.bfloat16,
        )
        p = float(psnr(got, jnp.asarray(want))[0])
        # bf16 production path: comfortably above perceptual thresholds.
        assert p > 40.0, f"bf16 parity PSNR {p} dB"


class TestOrbaxCheckpoint:
    def test_orbax_round_trip(self, shared_net, tmp_path):
        _, params = shared_net
        p = str(tmp_path / "ckpt.orbax")
        save_params(p, params)
        loaded = load_params(p)
        for k, v in flatten_params(params).items():
            np.testing.assert_array_equal(flatten_params(loaded)[k], v)
