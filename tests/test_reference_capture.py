"""Cross-implementation parity vs CAPTURED CUDA-reference outputs.

This image has no CUDA device and zero egress, so nothing the reference
itself produced exists locally; every other parity test chains to self-built
oracles. This test closes that gap the moment a capture appears (BASELINE.md
"Known evidence gaps" #1): drop ``tests/fixtures/reference_capture/
{inputs,outputs}.npz`` produced on any CUDA machine by running the
reference's render path (train.py:124-165) on the inputs file, and the test
diffs our full pipeline against it. Skipped (not passed) while absent.

Capture format — ``inputs.npz``:
  xyz (P,3) f32, scaling (P,3) log-scales, rotation (P,4) unnormalized,
  opacity (P,1) logits, f_dc (P,1,3), f_rest (P,15,3), filter_3d (P,1),
  R (3,3), T (3,), fovx, fovy (scalars, radians), width, height (ints),
  kernel_size (scalar), bg (3,), sh_degree (int)
``outputs.npz`` (from the reference's render() dict + backward with
all-ones cotangent on the rendered color):
  render (3,H,W), expected_depth (1,H,W), median_depth (1,H,W),
  normal (3,H,W), mask (1,H,W); optional grad_xy (P,2), grad_opacity (P,1)
"""

import os

import numpy as np
import pytest

CAPTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "reference_capture")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(CAPTURE_DIR, "inputs.npz")),
    reason="no CUDA-reference capture present (BASELINE.md evidence gap #1)",
)
def test_matches_reference_capture():
    import jax.numpy as jnp

    from radegs_tpu.core.camera import Camera
    from radegs_tpu.models import gaussian_model as gm
    from radegs_tpu.renderer import render

    inp = np.load(os.path.join(CAPTURE_DIR, "inputs.npz"))
    out_ref = np.load(os.path.join(CAPTURE_DIR, "outputs.npz"))

    P = inp["xyz"].shape[0]
    sh_degree = int(inp["sh_degree"])
    cap = gm.round_capacity(P)
    state = gm.create_from_points(inp["xyz"], np.zeros((P, 3), np.float32),
                                  sh_degree=sh_degree, capacity=cap)

    def pad(x):
        return jnp.asarray(np.concatenate(
            [x, np.zeros((cap - P,) + x.shape[1:], np.float32)]))

    state = state.replace(
        params=state.params.replace(
            xyz=pad(inp["xyz"]), scaling=pad(inp["scaling"]),
            rotation=pad(inp["rotation"]), opacity=pad(inp["opacity"]),
            f_dc=pad(inp["f_dc"]), f_rest=pad(inp["f_rest"]),
        ),
        filter_3d=pad(inp["filter_3d"]),
        active_sh_degree=jnp.asarray(sh_degree, jnp.int32),
    )
    cam = Camera.create(inp["R"], inp["T"], float(inp["fovx"]),
                        float(inp["fovy"]), int(inp["width"]),
                        int(inp["height"]))
    out = render(state, cam, jnp.asarray(inp["bg"]),
                 kernel_size=float(inp["kernel_size"]))

    for k, tol in [("render", 1e-3), ("expected_depth", 1e-2),
                   ("median_depth", 1e-2), ("normal", 1e-2), ("mask", 1e-3)]:
        if k in out_ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), out_ref[k], atol=tol,
                err_msg=f"CUDA-reference mismatch in {k}")
