"""LPIPS-in-JAX vs an independent NumPy oracle with random weights.

The real VGG weights can't ship in this image (zero egress); the
architecture + math are validated with tiny random weights against a
from-scratch NumPy forward pass written here (explicit padded-patch conv,
so it shares no code with the jax implementation)."""

import numpy as np
import pytest

from radegs_tpu.eval.lpips import (
    N_CHANNELS,
    TAP_AFTER_CONV,
    VGG16_CFG,
    lpips_pair,
)

RNG = np.random.default_rng(7)


def random_weights(scale=0.3):
    w = {}
    cin = 3
    ci = 0
    for item in VGG16_CFG:
        if item == "M":
            continue
        w[f"conv{ci}_w"] = RNG.normal(size=(item, cin, 3, 3)).astype(np.float32) * scale
        w[f"conv{ci}_b"] = RNG.normal(size=(item,)).astype(np.float32) * scale
        cin = item
        ci += 1
    for k, c in enumerate(N_CHANNELS):
        w[f"lin{k}"] = np.abs(RNG.normal(size=(c,)).astype(np.float32))
    return w


def np_conv3x3(x, w, b):
    """(C,H,W) -> (O,H,W), zero padding 1: explicit patch loop."""
    C, H, W = x.shape
    xp = np.zeros((C, H + 2, W + 2), np.float32)
    xp[:, 1:-1, 1:-1] = x
    out = np.zeros((w.shape[0], H, W), np.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + H, dx : dx + W]  # (C,H,W)
            out += np.einsum("oc,chw->ohw", w[:, :, dy, dx], patch)
    return out + b[:, None, None]


def np_lpips(x, y, weights):
    shift = np.array([-0.030, -0.088, -0.188], np.float32)[:, None, None]
    scale = np.array([0.458, 0.448, 0.450], np.float32)[:, None, None]

    def taps(img):
        z = (img - shift) / scale
        outs = []
        ci = 0
        for item in VGG16_CFG:
            if item == "M":
                C, H, W = z.shape
                z = z.reshape(C, H // 2, 2, W // 2, 2).max(axis=(2, 4))
                continue
            z = np.maximum(np_conv3x3(z, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"]), 0)
            if ci in TAP_AFTER_CONV:
                outs.append(z.copy())
            ci += 1
            if len(outs) == len(TAP_AFTER_CONV):
                break
        return outs

    fx, fy = taps(x), taps(y)
    total = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        na = a / (np.sqrt((a * a).sum(0, keepdims=True)) + 1e-10)
        nb = b / (np.sqrt((b * b).sum(0, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        total += (d * weights[f"lin{k}"][:, None, None]).sum(0).mean()
    return total


def test_lpips_matches_numpy_oracle():
    w = random_weights()
    x = RNG.uniform(0, 1, size=(3, 32, 32)).astype(np.float32)
    y = np.clip(x + RNG.normal(size=x.shape).astype(np.float32) * 0.1, 0, 1)
    import jax.numpy as jnp

    wj = {k: jnp.asarray(v) for k, v in w.items()}
    got = float(lpips_pair(jnp.asarray(x), jnp.asarray(y), wj))
    want = float(np_lpips(x, y, w))
    assert got == pytest.approx(want, rel=2e-3, abs=1e-5), (got, want)
    # identical images -> 0
    same = float(lpips_pair(jnp.asarray(x), jnp.asarray(x), wj))
    assert same == pytest.approx(0.0, abs=1e-6)
    # more corruption -> larger distance
    z = np.clip(x + RNG.normal(size=x.shape).astype(np.float32) * 0.4, 0, 1)
    far = float(lpips_pair(jnp.asarray(x), jnp.asarray(z), wj))
    assert far > got
