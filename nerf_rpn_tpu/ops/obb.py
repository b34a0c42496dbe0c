"""Oriented (z-rotated) box conversions.

2D OBBs are ``[x, y, w, h, theta]``; 3D OBBs are ``[x, y, z, w, l, h, theta]``
with theta the rotation about +z in radians.  Pure jnp, batched over leading
dims.

Behavioral parity with the reference's ``model/coder/misc.py`` (regular_obb,
rectpoly2obb, obb2poly*, obb2hbb*, obb2points_3d) — same conventions, same
corner ordering — rewritten as broadcasted jnp with no per-box loops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi


def regular_theta(theta: jax.Array, mode: str = "180", start: float = -PI / 2) -> jax.Array:
    """Wrap angles into ``[start, start + cycle)`` (cycle = pi or 2*pi)."""
    assert mode in ("360", "180")
    cycle = 2 * PI if mode == "360" else PI
    return (theta - start) % cycle + start


def regular_obb(obb: jax.Array) -> jax.Array:
    """Canonicalise 2D OBBs so w >= h and theta in [-pi/2, pi/2)."""
    x, y, w, h, theta = (obb[..., i] for i in range(5))
    swap = w > h
    w_r = jnp.where(swap, w, h)
    h_r = jnp.where(swap, h, w)
    t_r = regular_theta(jnp.where(swap, theta, theta + PI / 2))
    return jnp.stack([x, y, w_r, h_r, t_r], axis=-1)


def rectpoly2obb(polys: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Rectangular 4-point polygon (..., 8) -> canonical 2D OBB (..., 5).

    theta is estimated from the first edge, the polygon is de-rotated, and the
    axis-aligned extent in the de-rotated frame gives (w, h).
    """
    theta = jnp.arctan2(-(polys[..., 3] - polys[..., 1]), polys[..., 2] - polys[..., 0] + eps)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x = jnp.mean(polys[..., 0::2], axis=-1)
    y = jnp.mean(polys[..., 1::2], axis=-1)
    pts = polys.reshape(*polys.shape[:-1], 4, 2)
    centered = pts - jnp.stack([x, y], axis=-1)[..., None, :]
    # rotate by -theta: rows of R are [cos, -sin], [sin, cos]; we apply R^T.
    px = centered[..., 0] * cos[..., None] - centered[..., 1] * sin[..., None]
    py = centered[..., 0] * sin[..., None] + centered[..., 1] * cos[..., None]
    w = jnp.max(px, axis=-1) - jnp.min(px, axis=-1)
    h = jnp.max(py, axis=-1) - jnp.min(py, axis=-1)
    return regular_obb(jnp.stack([x, y, w, h, theta], axis=-1))


def obb2poly(obb: jax.Array) -> jax.Array:
    """2D OBB (..., 5) -> 4-corner polygon (..., 8) = [x1,y1,...,x4,y4]."""
    ctr = obb[..., 0:2]
    w = obb[..., 2:3]
    h = obb[..., 3:4]
    theta = obb[..., 4:5]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    v1 = jnp.concatenate([w / 2 * cos, -w / 2 * sin], axis=-1)
    v2 = jnp.concatenate([-h / 2 * sin, -h / 2 * cos], axis=-1)
    p1 = ctr + v1 + v2
    p2 = ctr + v1 - v2
    p3 = ctr - v1 - v2
    p4 = ctr - v1 + v2
    return jnp.concatenate([p1, p2, p3, p4], axis=-1)


def obb2poly_3d(obb: jax.Array) -> jax.Array:
    """3D OBB (..., 7) -> 8-corner 3D polygon (..., 24), lower 4 then upper 4."""
    obb2d = jnp.concatenate([obb[..., 0:2], obb[..., 3:5], obb[..., 6:7]], axis=-1)
    poly2d = obb2poly(obb2d)
    pts = poly2d.reshape(*poly2d.shape[:-1], 4, 2)
    half_h = obb[..., 5:6] / 2
    z0 = (obb[..., 2:3] - half_h)[..., None, :]
    z1 = (obb[..., 2:3] + half_h)[..., None, :]
    lower = jnp.concatenate([pts, jnp.broadcast_to(z0, (*pts.shape[:-1], 1))], axis=-1)
    upper = jnp.concatenate([pts, jnp.broadcast_to(z1, (*pts.shape[:-1], 1))], axis=-1)
    return jnp.concatenate([lower, upper], axis=-2).reshape(*obb.shape[:-1], 24)


def obb2hbb(obb: jax.Array) -> jax.Array:
    """2D OBB (..., 5) -> smallest enclosing AABB (..., 4) [x1,y1,x2,y2]."""
    ctr = obb[..., 0:2]
    w = obb[..., 2:3]
    h = obb[..., 3:4]
    theta = obb[..., 4:5]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x_bias = jnp.abs(w / 2 * cos) + jnp.abs(h / 2 * sin)
    y_bias = jnp.abs(w / 2 * sin) + jnp.abs(h / 2 * cos)
    bias = jnp.concatenate([x_bias, y_bias], axis=-1)
    return jnp.concatenate([ctr - bias, ctr + bias], axis=-1)


def obb2hbb_3d(obb: jax.Array) -> jax.Array:
    """3D OBB (..., 7) -> smallest enclosing AABB (..., 6)."""
    ctr = obb[..., 0:2]
    z = obb[..., 2:3]
    w = obb[..., 3:4]
    l = obb[..., 4:5]
    h = obb[..., 5:6]
    theta = obb[..., 6:7]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x_bias = jnp.abs(w / 2 * cos) + jnp.abs(l / 2 * sin)
    y_bias = jnp.abs(w / 2 * sin) + jnp.abs(l / 2 * cos)
    bias = jnp.concatenate([x_bias, y_bias], axis=-1)
    z_bias = h / 2
    return jnp.concatenate([ctr - bias, z - z_bias, ctr + bias, z + z_bias], axis=-1)


def obb2points_3d(obb: jax.Array) -> jax.Array:
    """3D OBB (..., 7) -> two diagonal endpoints (..., 2, 3).

    Used by the 2D projection loss: each box is summarised by the endpoints of
    one rotated diagonal (parity: reference ``obb2points_3d``,
    ``model/coder/misc.py:95-101``, which returns them stacked on dim 0).
    """
    ctr = obb[..., 0:3]
    w = obb[..., 3:4]
    l = obb[..., 4:5]
    h = obb[..., 5:6]
    theta = obb[..., 6:7]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    vec = jnp.concatenate([w / 2 * cos - l / 2 * sin, w / 2 * sin + l / 2 * cos, h / 2], axis=-1)
    return jnp.stack([ctr - vec, ctr + vec], axis=-2)
