"""Synthetic camera rig for the 2D projection loss.

Parity target: reference ``get_w2cs`` / ``project`` / look-at helpers
(``model/rpn.py:30-105``): four cameras at the corners
``centroid + (+-res, +-res, +res)`` looking at the grid centroid with
up = (0, 0, 1), intrinsics 640x480 with f = 600 (``rpn.py:422-426``).

The world->camera matrices depend only on the (static) grid resolution, so
they are baked as numpy constants at trace time.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

IMG_W, IMG_H, FOCAL = 640, 480, 600.0


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / (n if n != 0 else 1.0)


def _look_at_w2c(cam_pos: np.ndarray, at: np.ndarray, up=(0, 0, 1)) -> np.ndarray:
    z_axis = _normalize(cam_pos - at)
    x_axis = _normalize(np.cross(np.asarray(up, np.float64), z_axis))
    y_axis = _normalize(np.cross(z_axis, x_axis))
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x_axis, y_axis, z_axis, cam_pos
    return np.linalg.inv(c2w)


@lru_cache(maxsize=None)
def camera_rig(res: int = 160) -> tuple[np.ndarray, np.ndarray]:
    """Returns (K (3, 3), w2cs (4, 4, 4)) for the 4-camera rig at ``res``."""
    k = np.array(
        [[FOCAL, 0, IMG_W / 2], [0, FOCAL, IMG_H / 2], [0, 0, 1]], np.float32
    )
    centroid = np.full(3, res / 2.0)
    offsets = np.array(
        [[res, res, res], [res, -res, res], [-res, res, res], [-res, -res, res]],
        np.float64,
    )
    w2cs = np.stack(
        [_look_at_w2c(centroid + off, centroid) for off in offsets]
    ).astype(np.float32)
    return k, w2cs


def project_points(points: jax.Array, res: int) -> jax.Array:
    """Project 3D points through all 4 cameras.

    points: (..., 3) -> (..., 4, 2) pixel coords (one per camera).
    """
    k, w2cs = camera_rig(res)
    homo = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    cam = jnp.einsum("cij,...j->...ci", jnp.asarray(w2cs), homo)  # (..., 4, 4)
    pic = jnp.einsum("ij,...cj->...ci", jnp.asarray(k), cam[..., :3])
    return pic[..., :2] / pic[..., 2:3]
