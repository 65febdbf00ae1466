"""Image-space geometry helpers: backprojection and depth/coord -> normal.

Reference: utils/graphics_utils.py:97-126 (`depths_double_to_points`,
`depth_double_to_normal`, `point_double_to_normal`) — the inputs of the
normal-consistency loss (train.py:141-155).
"""

from __future__ import annotations

import jax.numpy as jnp


def depths_to_points(camera, depthmap):
    """Backproject a (H,W) or (1,H,W) depth map to camera-space points (3,H,W).

    Matches utils/graphics_utils.py:97-111: rays through pixel centers
    (x+0.5, y+0.5) with principal point at W/2, H/2.
    """
    H, W = camera.height, camera.width
    fx = W / (2.0 * jnp.tan(camera.fovx / 2.0))
    fy = H / (2.0 * jnp.tan(camera.fovy / 2.0))
    gx = (jnp.arange(W, dtype=jnp.float32) + 0.5 - W / 2.0) / fx
    gy = (jnp.arange(H, dtype=jnp.float32) + 0.5 - H / 2.0) / fy
    rays = jnp.stack(
        [
            jnp.broadcast_to(gx[None, :], (H, W)),
            jnp.broadcast_to(gy[:, None], (H, W)),
            jnp.ones((H, W), jnp.float32),
        ],
        axis=0,
    )
    d = depthmap.reshape(1, H, W)
    return d * rays


def points_to_normal(points):
    """Central-difference cross-product normals (graphics_utils.py:115-122).

    points: (..., 3, H, W) -> unit normals (..., 3, H, W), zero on the border.
    NOTE the reference's axis naming: its `dx` differences image *rows* and
    `dy` image *columns*; we reproduce that exactly.
    """
    d_row = points[..., :, 2:, 1:-1] - points[..., :, :-2, 1:-1]
    d_col = points[..., :, 1:-1, 2:] - points[..., :, 1:-1, :-2]
    n = jnp.cross(d_row, d_col, axisa=-3, axisb=-3, axisc=-3)
    # double-where: degenerate (flat/empty) pixels give zero, not NaN, grads
    n2 = jnp.sum(jnp.square(n), axis=-3, keepdims=True)
    ok = n2 > 1e-24
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    n = n * inv
    pad = [(0, 0)] * (points.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(n, pad)


def depth_double_to_normal(camera, depth1, depth2):
    """(2, 3, H, W) normals from expected & median depth (graphics_utils.py:124-126)."""
    p1 = depths_to_points(camera, depth1)
    p2 = depths_to_points(camera, depth2)
    return points_to_normal(jnp.stack([p1, p2], axis=0))


def point_double_to_normal(camera, points1, points2):
    """(2, 3, H, W) normals from expected & median coord maps (graphics_utils.py:115-122)."""
    return points_to_normal(jnp.stack([points1, points2], axis=0))
