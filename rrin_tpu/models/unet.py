"""The shared U-Net encoder-decoder (SURVEY.md §2.1 row 2, App-B).

One generic ``UNet(in_ch, out_ch)`` instantiated four times by the cascade
with different channel signatures (flow 6->4, refine 10->4, mask 16->2,
residue 9->3). Architecture per SURVEY.md App-B:

  stem:    conv7x7(in->32)  + LReLU(0.1), conv7x7(32->32) + LReLU
  down_i:  avgpool2x2 -> convKxK + LReLU -> convKxK + LReLU
           widths 32->64 (K=5), 64->128 (3), 128->256 (3), 256->512 (3)
  up_i:    bilinear 2x up -> conv3x3 + LReLU -> concat(skip) -> conv3x3 + LReLU
           widths 512->256->128->64->32
  head:    conv3x3(32->out), no activation (flows/residues are signed; the
           weight-map instance applies sigmoid outside, SURVEY.md App-A.5).

TPU-first design notes:
  * Pure functional: params are a nested dict pytree; ``unet_apply`` is a
    jit-traceable pure function. NHWC activations, HWIO weights so convs
    map straight onto the MXU without layout transposes.
  * ``compute_dtype=bfloat16`` runs every conv in bf16 (MXU native) while
    params stay float32; the caller keeps warp/blend math in fp32.
  * All shapes static; the whole cascade compiles to one fused XLA graph.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from rrin_tpu.config import ModelConfig
from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear

Params = Dict[str, Any]


def _conv_init(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> Params:
    """PyTorch Conv2d-style default init (kaiming_uniform a=sqrt(5)).

    Matching the reference's init distribution keeps random-weight parity
    tests meaningful and makes from-scratch training behave like the paper's
    setup (SURVEY.md §3.4).
    """
    wkey, bkey = jax.random.split(key)
    fan_in = kh * kw * cin
    # kaiming_uniform(a=sqrt(5)): bound = gain*sqrt(3/fan_in) with
    # gain = sqrt(2/(1+a^2)) = sqrt(1/3)  =>  bound = 1/sqrt(fan_in).
    bound_w = float(1.0 / (fan_in**0.5))
    w = jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32, -bound_w, bound_w)
    bound_b = bound_w
    b = jax.random.uniform(bkey, (cout,), jnp.float32, -bound_b, bound_b)
    return {"w": w, "b": b}


def _conv(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """conv + bias, no activation (head convs)."""
    from rrin_tpu.ops.conv_phase import conv2d_fused

    return conv2d_fused(x, p["w"], p["b"], None)


def _conv_act(x: jnp.ndarray, p: Params, slope: float) -> jnp.ndarray:
    """conv + bias + LeakyReLU, fused. Low-channel bf16 convs route to the
    phase-packed Pallas kernel (ops/conv_phase.py); everything else is the
    XLA conv (fp32 parity path uses HIGHEST-precision MXU passes)."""
    from rrin_tpu.ops.conv_phase import conv2d_fused

    return conv2d_fused(x, p["w"], p["b"], slope)


def unet_init(key: jax.Array, in_ch: int, out_ch: int, cfg: ModelConfig) -> Params:
    """Initialize one U-Net's parameter pytree."""
    w1, w2, w3, w4, w5 = cfg.widths
    keys = iter(jax.random.split(key, 19))
    k = cfg.down_kernels
    p: Params = {
        "conv1": _conv_init(next(keys), cfg.stem_kernel, cfg.stem_kernel, in_ch, w1),
        "conv2": _conv_init(next(keys), cfg.stem_kernel, cfg.stem_kernel, w1, w1),
        "down1": {
            "conv1": _conv_init(next(keys), k[0], k[0], w1, w2),
            "conv2": _conv_init(next(keys), k[0], k[0], w2, w2),
        },
        "down2": {
            "conv1": _conv_init(next(keys), k[1], k[1], w2, w3),
            "conv2": _conv_init(next(keys), k[1], k[1], w3, w3),
        },
        "down3": {
            "conv1": _conv_init(next(keys), k[2], k[2], w3, w4),
            "conv2": _conv_init(next(keys), k[2], k[2], w4, w4),
        },
        "down4": {
            "conv1": _conv_init(next(keys), k[3], k[3], w4, w5),
            "conv2": _conv_init(next(keys), k[3], k[3], w5, w5),
        },
        "up1": {
            "conv1": _conv_init(next(keys), 3, 3, w5, w4),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w4, w4),
        },
        "up2": {
            "conv1": _conv_init(next(keys), 3, 3, w4, w3),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w3, w3),
        },
        "up3": {
            "conv1": _conv_init(next(keys), 3, 3, w3, w2),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w2, w2),
        },
        "up4": {
            "conv1": _conv_init(next(keys), 3, 3, w2, w1),
            "conv2": _conv_init(next(keys), 3, 3, 2 * w1, w1),
        },
        "conv3": _conv_init(next(keys), 3, 3, w1, out_ch),
    }
    return p


def _down(x: jnp.ndarray, p: Params, slope: float) -> jnp.ndarray:
    x = avg_pool_2x(x)
    x = _conv_act(x, p["conv1"], slope)
    x = _conv_act(x, p["conv2"], slope)
    return x


def _up(x: jnp.ndarray, skip: jnp.ndarray, p: Params, slope: float) -> jnp.ndarray:
    x = upsample_2x_bilinear(x)
    x = _conv_act(x, p["conv1"], slope)
    x = _conv_act(jnp.concatenate([x, skip], axis=-1), p["conv2"], slope)
    return x


def unet_apply(p: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Apply one U-Net. x: (B, H, W, in_ch), H and W divisible by 16."""
    s = cfg.leaky_slope
    x = _conv_act(x, p["conv1"], s)
    s1 = _conv_act(x, p["conv2"], s)
    s2 = _down(s1, p["down1"], s)
    s3 = _down(s2, p["down2"], s)
    s4 = _down(s3, p["down3"], s)
    x = _down(s4, p["down4"], s)
    x = _up(x, s4, p["up1"], s)
    x = _up(x, s3, p["up2"], s)
    x = _up(x, s2, p["up3"], s)
    x = _up(x, s1, p["up4"], s)
    return _conv(x, p["conv3"])
