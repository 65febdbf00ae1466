"""SSIM and L1 losses (utils/loss_utils.py:17-63 semantics).

SSIM uses the standard 11x11 Gaussian window (sigma 1.5), per-channel
depthwise convolution with zero ('same') padding — exactly the reference's
torch conv2d(groups=C, padding=window//2) behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C1 = 0.01**2
C2 = 0.03**2


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def _filter2d(img, window):
    """Depthwise 'same' conv. img: (C,H,W)."""
    k = window[None, None]  # (1,1,kh,kw)
    pad = window.shape[0] // 2

    def one(ch):
        return jax.lax.conv_general_dilated(
            ch[None, None], k, (1, 1), [(pad, pad), (pad, pad)]
        )[0, 0]

    return jax.vmap(one)(img)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over a (C,H,W) image pair (utils/loss_utils.py:23-63)."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, w) - mu1_sq
    s2 = _filter2d(img2 * img2, w) - mu2_sq
    s12 = _filter2d(img1 * img2, w) - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(m)
