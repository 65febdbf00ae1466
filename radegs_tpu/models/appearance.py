"""Decoupled appearance model (GOF), TPU-native.

Reference: scene/appearance_network.py:18-46 — a CNN mapping the x32
downsampled render concatenated with a 64-d per-view embedding to a
full-resolution per-pixel RGB multiplier, via 4 pixel-shuffle upsample
blocks + a bilinear x2 + two convs + sigmoid. Embedding table: 2048 x 64,
std 1e-4 init (scene/gaussian_model.py:65-69).

Implemented in flax.linen with NHWC layout (TPU conv layout); pixel shuffle
is a reshape/transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_EMBEDDINGS = 2048
EMBED_DIM = 64


def pixel_shuffle(x, factor: int = 2):
    """NHWC pixel shuffle: (N,H,W,C*r^2) -> (N,H*r,W*r,C)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, r, r, c // (r * r))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c // (r * r))


def bilinear_x2_align_corners(x):
    """NHWC bilinear x2 with align_corners=True (matches F.interpolate)."""
    n, h, w, c = x.shape
    nh, nw = 2 * h, 2 * w

    def grid(src, dst):
        if src == 1:
            return jnp.zeros((dst,), jnp.float32)
        return jnp.arange(dst, dtype=jnp.float32) * (src - 1) / (dst - 1)

    gy, gx = grid(h, nh), grid(w, nw)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (gy - y0)[None, :, None, None]
    wx = (gx - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c_ = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c_ * wy * (1 - wx) + d * wy * wx


class UpsampleBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = pixel_shuffle(x, 2)
        x = nn.Conv(self.out_ch, (3, 3), padding=1)(x)
        return nn.relu(x)


class AppearanceNetwork(nn.Module):
    """Input (N, H/32, W/32, 3+64) -> multiplier (N, H, W, 3)."""

    out_ch: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1)(x))
        x = UpsampleBlock(128)(x)
        x = UpsampleBlock(64)(x)
        x = UpsampleBlock(32)(x)
        x = UpsampleBlock(16)(x)
        x = bilinear_x2_align_corners(x)
        x = nn.relu(nn.Conv(16, (3, 3), padding=1)(x))
        x = nn.Conv(self.out_ch, (3, 3), padding=1)(x)
        return nn.sigmoid(x)


def init_appearance(key, height: int, width: int):
    """Returns (net, params_dict) with params = {net, embeddings}."""
    net = AppearanceNetwork()
    k1, k2 = jax.random.split(key)
    h32, w32 = max(height // 32, 1), max(width // 32, 1)
    dummy = jnp.zeros((1, h32, w32, 3 + EMBED_DIM), jnp.float32)
    net_params = net.init(k1, dummy)
    emb = jax.random.normal(k2, (NUM_EMBEDDINGS, EMBED_DIM)) * 1e-4
    return net, {"net": net_params, "embeddings": emb}


def appearance_transform(net, app_params, image, view_idx):
    """L1_loss_appearance's image path (train.py:37-58): center-crop to a /32
    multiple, downsample x32 (bilinear, align_corners), concat embedding, run
    the CNN, multiply the crop. Returns (transformed_crop, gt_crop_slices).

    image: (3, H, W). Returns (transformed (3, Hc, Wc), (top, left, Hc, Wc)).
    """
    _, origH, origW = image.shape
    Hc, Wc = origH // 32 * 32, origW // 32 * 32
    top, left = origH // 2 - Hc // 2, origW // 2 - Wc // 2
    crop = jax.lax.dynamic_slice(image, (0, top, left), (3, Hc, Wc))

    nhwc = crop[None].transpose(0, 2, 3, 1)
    down = jax.image.resize(nhwc, (1, Hc // 32, Wc // 32, 3), "linear")
    emb = app_params["embeddings"][view_idx]
    emb_map = jnp.broadcast_to(emb[None, None, None, :], (1, Hc // 32, Wc // 32, emb.shape[0]))
    inp = jnp.concatenate([down, emb_map], axis=-1)
    mult = net.apply(app_params["net"], inp)  # (1, Hc, Wc, 3)
    mult = mult[0].transpose(2, 0, 1)
    return mult * crop, (top, left, Hc, Wc)
