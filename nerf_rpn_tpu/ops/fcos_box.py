"""FCOS box parameterisation: distance targets and the OBB midpoint codec.

Parity targets (reference ``model/fcos/utils.py``):
- ``encode_fcos_obb`` (:64-105): per (location, gt-OBB) pair, the 6 AABB
  distances from the location to the OBB's enclosing 2D AABB + z extent,
  plus normalised (alpha, beta) offsets of the bottom-edge / right-edge
  corner midpoints; falls back to pure-AABB (alpha, beta at the corner) when
  theta is too small to be stable (0.1 corner tolerance).
- ``decode_fcos_obb`` (:12-61): reconstruct the two vertices, rectangularise
  by scaling both to the max diagonal, then recover (w, l, theta).

All functions are elementwise over leading batch dims (location i pairs with
box i) — vmap for (loc x gt) grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.rotated_iou import box2corners


def encode_fcos_aabb(locations: jax.Array, boxes: jax.Array) -> jax.Array:
    """(..., 3) locations x (..., 6) AABBs -> (..., 6) distances
    [l, t, f, r, b, ba] (reference ``loss.py:338-344`` layout)."""
    near = locations - boxes[..., 0:3]
    far = boxes[..., 3:6] - locations
    return jnp.concatenate([near, far], axis=-1)


def decode_fcos_aabb(locations: jax.Array, reg: jax.Array) -> jax.Array:
    """(..., 3) locations + (..., 6) distances -> (..., 6) AABBs."""
    lo = locations - reg[..., 0:3]
    hi = locations + reg[..., 3:6]
    return jnp.concatenate([lo, hi], axis=-1)


def encode_fcos_obb(locations: jax.Array, boxes: jax.Array) -> jax.Array:
    """(..., 3) locations x (..., 7) OBBs -> (..., 8) targets
    [x0, y0, z0, x1, y1, z1, alpha, beta]."""
    proj = jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 3:5], boxes[..., 6:7]], axis=-1
    )
    corners = box2corners(proj)  # (..., 4, 2)
    xs = corners[..., 0]
    ys = corners[..., 1]
    xmax = jnp.max(xs, axis=-1)
    ymax = jnp.max(ys, axis=-1)
    xmin = jnp.min(xs, axis=-1)
    ymin = jnp.min(ys, axis=-1)

    x0 = locations[..., 0] - xmin
    y0 = locations[..., 1] - ymin
    z0 = locations[..., 2] - (boxes[..., 2] - boxes[..., 5] / 2)
    x1 = xmax - locations[..., 0]
    y1 = ymax - locations[..., 1]
    z1 = (boxes[..., 2] + boxes[..., 5] / 2) - locations[..., 2]

    # bottom-edge corner x (max over corners on the top edge y == ymax) and
    # right-edge corner y (min over corners with x == xmax), 0.1 tolerance
    xt = jnp.where(ymax[..., None] - ys > 0.1, -1e6, xs)
    yt = jnp.where(xmax[..., None] - xs > 0.1, 1e6, ys)
    vx = jnp.max(xt, axis=-1)
    vy = jnp.min(yt, axis=-1)

    # near-axis-aligned fallback: degenerate to the AABB corner
    degen = jnp.isclose(vx, xmax) & jnp.isclose(vy, ymin)
    vx = jnp.where(degen, xmax, vx)
    vy = jnp.where(degen, ymin, vy)

    alpha = (vx - boxes[..., 0]) / (xmax - xmin)
    beta = (vy - boxes[..., 1]) / (ymax - ymin)
    return jnp.stack([x0, y0, z0, x1, y1, z1, alpha, beta], axis=-1)


def decode_fcos_obb(locations: jax.Array, reg: jax.Array, eps: float = 1e-7) -> jax.Array:
    """(..., 3) locations + (..., 8) targets -> (..., 7) OBBs."""
    x0 = locations[..., 0] - reg[..., 0]
    y0 = locations[..., 1] - reg[..., 1]
    z0 = locations[..., 2] - reg[..., 2]
    x1 = locations[..., 0] + reg[..., 3]
    y1 = locations[..., 1] + reg[..., 4]
    z1 = locations[..., 2] + reg[..., 5]
    vx = jnp.clip((x1 + x0) / 2 + reg[..., 6] * (x1 - x0), x0, x1)
    vy = jnp.clip((y1 + y0) / 2 + reg[..., 7] * (y1 - y0), y0, y1)

    cx = (x0 + x1) / 2
    cy = (y0 + y1) / 2
    cz = (z0 + z1) / 2

    def safe_norm(v):
        # sqrt has an infinite gradient at exactly 0: degenerate regressions
        # (negative distances straight out of an untrained head) produce
        # zero-length v0/v1/mid here, and norm's 0/0 backward would NaN the
        # whole rotated loss.  The 1e-20 shift is far below f32 resolution
        # for any non-degenerate box.
        return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-20)

    v0 = jnp.stack([vx - cx, y1 - cy], axis=-1)
    v1 = jnp.stack([x1 - cx, vy - cy], axis=-1)
    d0 = safe_norm(v0)
    d1 = safe_norm(v1)
    dmax = jnp.maximum(d0, d1)
    v0 = v0 / (d0[..., None] + eps) * dmax[..., None]
    v1 = v1 / (d1[..., None] + eps) * dmax[..., None]

    l = safe_norm(v0 - v1)
    mid = (v0 + v1) / 2
    w = safe_norm(mid) * 2
    h = z1 - z0
    mid_x = jnp.where((mid[..., 0] == 0) & (mid[..., 1] == 0), eps, mid[..., 0])
    theta = jnp.arctan2(mid[..., 1], mid_x)
    return jnp.stack([cx, cy, cz, w, l, h, theta], axis=-1)
