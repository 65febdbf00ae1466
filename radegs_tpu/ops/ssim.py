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


def _gaussian_taps(size: int = 11, sigma: float = 1.5):
    import numpy as np

    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur1d(img, taps, axis):
    """'same' 1D correlation along ``axis`` as static shift-and-adds.

    XLA lowers channels=1 depthwise conv_general_dilated to a ~70ms/image
    monster on TPU; k shifted multiply-adds on the VPU are ~1ms and fuse.
    """
    k = taps.shape[0]
    half = k // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (half, half)
    padded = jnp.pad(img, pad)
    out = jnp.zeros_like(img)
    n = img.shape[axis]
    for i in range(k):
        out = out + float(taps[i]) * jax.lax.slice_in_dim(padded, i, i + n, axis=axis)
    return out


def _filter2d(img, taps):
    """Separable depthwise 'same' Gaussian filter. img: (C,H,W)."""
    return _blur1d(_blur1d(img, taps, axis=1), taps, axis=2)


def ssim_map(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Per-pixel SSIM map (C,H,W) with 'same' zero padding."""
    w = _gaussian_taps(window_size, sigma)
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, w) - mu1_sq
    s2 = _filter2d(img2 * img2, w) - mu2_sq
    s12 = _filter2d(img1 * img2, w) - mu12
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over a (C,H,W) image pair (utils/loss_utils.py:23-63)."""
    return jnp.mean(ssim_map(img1, img2, window_size, sigma))
