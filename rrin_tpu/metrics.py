"""Image quality metrics: PSNR and SSIM (SURVEY.md §4/§6 eval metrics).

Pure JAX so batched metric evaluation jits and runs on-device next to the
model (BASELINE.json config 2: batched Vimeo triplet eval). SSIM follows
Wang et al. 2004 with the standard 11x11 Gaussian window (sigma 1.5),
C1=(0.01 L)^2, C2=(0.03 L)^2 — the convention used by paper-style
Vimeo-90K reporting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR in dB per batch item. pred/target: (B, H, W, C) in [0, max_val]."""
    mse = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, axis=(1, 2, 3)
    )
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("max_val",))
def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM per batch item. pred/target: (B, H, W, C) in [0, max_val].

    Separable 11x11 Gaussian filtering, valid padding (edges excluded, as in
    the standard implementation).
    """
    win = jnp.asarray(_gaussian_window())

    def blur(x: jnp.ndarray) -> jnp.ndarray:
        # Separable depthwise filtering via two 1-D convs (VPU-friendly).
        # precision=HIGHEST: TPU convs default to bf16-ish passes, whose
        # ~3-decimal-digit error destroys the blur(x*x) - mu^2 variance
        # cancellation below (sigma^2 comes out negative at the scale of
        # C2 and SSIM can exceed 1 — seen as ssim_mean 1.39 in a TPU eval
        # before this fix; CPU convs are exact f32 and never showed it).
        b, h, w, c = x.shape
        kh = win.reshape(1, 11, 1, 1)
        kw = win.reshape(11, 1, 1, 1)
        dn = ("NHWC", "HWIO", "NHWC")
        x = jnp.moveaxis(x, -1, 1).reshape(b * c, h, w, 1)
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST,
        )
        x = jax.lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST,
        )
        hw2, ww2 = x.shape[1], x.shape[2]
        return jnp.moveaxis(x.reshape(b, c, hw2, ww2), 1, -1)

    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_x = blur(x)
    mu_y = blur(y)
    mu_x2 = mu_x * mu_x
    mu_y2 = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x2 = blur(x * x) - mu_x2
    sigma_y2 = blur(y * y) - mu_y2
    sigma_xy = blur(x * y) - mu_xy

    s = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))
