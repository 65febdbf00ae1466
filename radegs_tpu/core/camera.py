"""Camera model.

Conventions follow the reference pipeline (scene/cameras.py:17-84,
utils/graphics_utils.py:40-93) but with row-major matrices throughout:
``p_view = view @ [p, 1]`` with +z looking forward, pixel x to the right,
pixel y down.  The reference stores transposed matrices to satisfy glm's
column-major CUDA code; we keep the mathematical objects and document the
mapping instead.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


@struct.dataclass
class Camera:
    """A pinhole camera. Array fields are pytree leaves; width/height are
    static metadata so jitted renderers specialize on image size.

    ``R`` is the camera-to-world rotation and ``T`` the world-to-camera
    translation, matching the reference reader convention
    (scene/dataset_readers.py + utils/graphics_utils.py:40-65):
    ``p_view = R.T @ p_world + T``.
    """

    R: Any  # (3,3) c2w rotation
    T: Any  # (3,)  w2c translation
    fovx: Any  # scalar (radians)
    fovy: Any  # scalar
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    # ---- derived quantities -------------------------------------------------

    @property
    def tanfovx(self):
        return jnp.tan(self.fovx * 0.5)

    @property
    def tanfovy(self):
        return jnp.tan(self.fovy * 0.5)

    @property
    def focal_x(self):
        return self.width / (2.0 * jnp.tan(self.fovx * 0.5))

    @property
    def focal_y(self):
        return self.height / (2.0 * jnp.tan(self.fovy * 0.5))

    @property
    def world_view(self):
        """Row-major 4x4 world-to-camera matrix (utils/graphics_utils.py:40-65)."""
        R = jnp.asarray(self.R, jnp.float32)
        T = jnp.asarray(self.T, jnp.float32)
        top = jnp.concatenate([R.T, T[:, None]], axis=1)  # (3,4)
        bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
        return jnp.concatenate([top, bottom], axis=0)

    @property
    def projection(self):
        """Row-major perspective matrix (utils/graphics_utils.py:67-87).

        Maps view space to clip space; after perspective division x,y are in
        [-1, 1] and w carries the view-space z.
        """
        znear, zfar = self.znear, self.zfar
        z0 = jnp.zeros((), jnp.float32)
        inv_tx = 1.0 / jnp.tan(self.fovx * 0.5)
        inv_ty = 1.0 / jnp.tan(self.fovy * 0.5)
        zz = jnp.float32(zfar / (zfar - znear))
        zw = jnp.float32(-(zfar * znear) / (zfar - znear))
        one = jnp.ones((), jnp.float32)
        return jnp.stack(
            [
                jnp.stack([inv_tx, z0, z0, z0]),
                jnp.stack([z0, inv_ty, z0, z0]),
                jnp.stack([z0, z0, zz, zw]),
                jnp.stack([z0, z0, one, z0]),
            ]
        )

    @property
    def full_proj(self):
        """Row-major view-projection: clip = full_proj @ [p_world, 1]
        (scene/cameras.py:56 composes the same product in transposed form)."""
        return self.projection @ self.world_view

    @property
    def camera_center(self):
        """World-space camera position (scene/cameras.py:57)."""
        R = jnp.asarray(self.R, jnp.float32)
        T = jnp.asarray(self.T, jnp.float32)
        return -(R @ T)

    # ---- constructors -------------------------------------------------------

    @staticmethod
    def create(R, T, fovx, fovy, width, height, znear=0.01, zfar=100.0) -> "Camera":
        return Camera(
            R=jnp.asarray(R, jnp.float32),
            T=jnp.asarray(T, jnp.float32),
            fovx=jnp.asarray(fovx, jnp.float32),
            fovy=jnp.asarray(fovy, jnp.float32),
            width=int(width),
            height=int(height),
            znear=float(znear),
            zfar=float(zfar),
        )

    @staticmethod
    def look_at(eye, target, up, fovx, fovy, width, height) -> "Camera":
        """Convenience constructor for tests/synthetic scenes."""
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)
        # camera axes as rows of w2c rotation: x=right, y=down, z=forward
        Rw2c = np.stack([right, down, fwd], axis=0)
        R = Rw2c.T  # c2w
        T = -Rw2c @ eye
        return Camera.create(R, T, fovx, fovy, width, height)
