"""LPIPS v0.1 (VGG16 backbone) in pure JAX.

Re-implements the reference's bundled lpipsPyTorch
(`lpipsPyTorch/modules/lpips.py:17-36`, `modules/networks.py:86-96`,
`modules/utils.py:6-8`): z-score the inputs with the official shift/scale,
run VGG16 features, tap the 5 ReLU outputs (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), channel-unit-normalize, square the difference, apply the
learned non-negative 1x1 linear heads, spatially average, and sum the 5
layer scores.

Protocol note: the reference's `metric.py:74` feeds [0, 1] images directly
(no rescale to [-1, 1]); this module reproduces that behavior byte-for-byte
— pass the same [0, 1] images.

Weights come from a local ``.npz`` produced by
``scripts/convert_lpips_weights.py`` (torchvision VGG16 IMAGENET1K_V1 +
the official LPIPS v0.1 vgg linear heads). This image has no egress, so the
converter must be run on a machine that does; everything else is local.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 "features" conv channel progression (torchvision layout); M = maxpool
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# index (into the conv list) of the last conv of each tapped block
TAP_AFTER_CONV = [1, 3, 6, 9, 12]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
N_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS_PATH = os.environ.get(
    "RADEGS_LPIPS_WEIGHTS",
    os.path.join(os.path.dirname(__file__), "..", "..", "weights", "lpips_vgg.npz"),
)


def load_weights(path: str | None = None) -> dict:
    """Load the converted weight file into a jnp pytree, or raise
    FileNotFoundError with conversion instructions."""
    path = path or DEFAULT_WEIGHTS_PATH
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {path}. Run "
            "scripts/convert_lpips_weights.py on a machine with network "
            "access (needs torchvision) and copy the npz here, or set "
            "RADEGS_LPIPS_WEIGHTS."
        )
    raw = np.load(path)
    return {k: jnp.asarray(raw[k]) for k in raw.files}


def _conv3x3(x, w, b):
    """NCHW 3x3 same-padding conv. w: (out, in, 3, 3), b: (out,)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def vgg16_taps(x, weights):
    """x: (N, 3, H, W) z-scored input -> list of 5 tapped ReLU activations."""
    taps = []
    ci = 0
    for item in VGG16_CFG:
        if item == "M":
            x = _maxpool2(x)
            continue
        x = _conv3x3(x, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"])
        x = jnp.maximum(x, 0.0)
        if ci in TAP_AFTER_CONV:
            taps.append(x)
        ci += 1
        if len(taps) == len(TAP_AFTER_CONV):
            break
    return taps


def _unit_normalize(x, eps=1e-10):
    """Channel-wise unit normalization (modules/utils.py:6-8)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips_pair(x, y, weights):
    """LPIPS distance between two (3, H, W) images (same [0,1] protocol as
    the reference's metric.py:74). Returns a scalar."""
    xb = (x[None] - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    yb = (y[None] - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    fx = vgg16_taps(xb, weights)
    fy = vgg16_taps(yb, weights)
    score = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin = weights[f"lin{k}"]  # (C,)
        score = score + jnp.mean(jnp.sum(d * lin[None, :, None, None], axis=1))
    return score


class LPIPSMetric:
    """Stateful convenience wrapper: loads weights once, scores pairs."""

    def __init__(self, weights_path: str | None = None):
        self.weights = load_weights(weights_path)

    def __call__(self, x, y) -> float:
        return float(lpips_pair(jnp.asarray(x), jnp.asarray(y), self.weights))
