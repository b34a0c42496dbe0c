"""Box coders: delta parameterisations between anchors/RoIs and boxes.

Pure functions over fixed-shape arrays (vmap over scenes at the call site).
Three coders with behavioral parity to the reference's ``model/coder/``:

- **AABB coder** — Faster-RCNN 6-delta (ctr offsets / size, log size ratios),
  exp clamped at log(2000) (reference ``AABB_coder.py:58-137``).
- **Midpoint-offset coder** — OBB <-> 8-delta vs AABB anchors
  ``[dx,dy,dz,dw,dh,dd,da,db]`` (OBBDetection scheme; reference
  ``midpoint_offset_coder.py``): the gt OBB is represented by its enclosing
  2D AABB plus the x of the bottom-edge corner (da) and the y of the
  right-edge corner (db); decode reconstructs the quad and rectangularises
  it by scaling all vertices to the max diagonal.
- **Rotated coder** — OBB <-> OBB 7-delta for the RCNN refinement stage,
  center offsets rotated into the anchor frame, angle delta normalised by
  2*pi and wrapped to (-pi/2, pi/2] (reference ``rotated_coder.py``).

The reference's list-of-scenes plumbing (``base_bbox_coder.py``) is not
reproduced: levels/scenes are leading array axes here, and FPN level indices
are tracked by the proposal pipeline as a separate array rather than an
appended column.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.obb import obb2hbb, obb2poly, rectpoly2obb, PI

BBOX_XFORM_CLIP = math.log(2000.0)


# ---------------------------------------------------------------------------
# AABB coder
# ---------------------------------------------------------------------------


def _aabb_ctr_size(boxes: jax.Array):
    size = boxes[..., 3:6] - boxes[..., 0:3]
    ctr = boxes[..., 0:3] + 0.5 * size
    return ctr, size


def encode_aabb(gt: jax.Array, anchors: jax.Array) -> jax.Array:
    """(..., 6) gt AABBs vs (..., 6) anchor AABBs -> (..., 6) deltas."""
    a_ctr, a_size = _aabb_ctr_size(anchors)
    g_ctr, g_size = _aabb_ctr_size(gt)
    d_ctr = (g_ctr - a_ctr) / a_size
    d_size = jnp.log(g_size / a_size)
    return jnp.concatenate([d_ctr, d_size], axis=-1)


def decode_aabb(deltas: jax.Array, anchors: jax.Array,
                xform_clip: float = BBOX_XFORM_CLIP) -> jax.Array:
    """(..., 6) deltas + (..., 6) anchors -> (..., 6) AABBs."""
    a_ctr, a_size = _aabb_ctr_size(anchors)
    ctr = deltas[..., 0:3] * a_size + a_ctr
    size = jnp.exp(jnp.clip(deltas[..., 3:6], None, xform_clip)) * a_size
    return jnp.concatenate([ctr - 0.5 * size, ctr + 0.5 * size], axis=-1)


# ---------------------------------------------------------------------------
# Midpoint-offset coder (OBB vs AABB anchors)
# ---------------------------------------------------------------------------

_MID_TOL = 0.1  # corner-on-edge tolerance, same as reference


def _gt_midpoint_params(gt: jax.Array):
    """gt OBB (..., 7) -> (gx, gy, gw, gh, ga, gb): enclosing-AABB center and
    size plus the two midpoint offsets."""
    gt2d = jnp.concatenate([gt[..., 0:2], gt[..., 3:5], gt[..., 6:7]], axis=-1)
    hbb = obb2hbb(gt2d)                      # (..., 4)
    poly = obb2poly(gt2d)                    # (..., 8)
    gx = (hbb[..., 0] + hbb[..., 2]) * 0.5
    gy = (hbb[..., 1] + hbb[..., 3]) * 0.5
    gw = hbb[..., 2] - hbb[..., 0]
    gh = hbb[..., 3] - hbb[..., 1]
    xc = poly[..., 0::2]
    yc = poly[..., 1::2]
    y_min = jnp.min(yc, axis=-1, keepdims=True)
    x_max = jnp.max(xc, axis=-1, keepdims=True)
    # x of the corner(s) on the bottom edge / y of the corner(s) on the right
    ga = jnp.max(jnp.where(jnp.abs(yc - y_min) > _MID_TOL, -1000.0, xc), axis=-1)
    gb = jnp.max(jnp.where(jnp.abs(xc - x_max) > _MID_TOL, -1000.0, yc), axis=-1)
    return gx, gy, gw, gh, ga, gb


def encode_midpoint_offset(gt: jax.Array, anchors: jax.Array) -> jax.Array:
    """gt OBB (..., 7) vs anchor AABB (..., 6) -> 8 deltas (..., 8)."""
    a_ctr, a_size = _aabb_ctr_size(anchors)
    px, py, pz = a_ctr[..., 0], a_ctr[..., 1], a_ctr[..., 2]
    pw, ph, pd = a_size[..., 0], a_size[..., 1], a_size[..., 2]
    gx, gy, gw, gh, ga, gb = _gt_midpoint_params(gt)
    gz = gt[..., 2]
    gd = gt[..., 5]
    return jnp.stack(
        [
            (gx - px) / pw,
            (gy - py) / ph,
            (gz - pz) / pd,
            jnp.log(gw / pw),
            jnp.log(gh / ph),
            jnp.log(gd / pd),
            (ga - gx) / gw,
            (gb - gy) / gh,
        ],
        axis=-1,
    )


def decode_midpoint_offset(
    deltas: jax.Array, anchors: jax.Array, wh_ratio_clip: float = 16 / 1000
) -> jax.Array:
    """8 deltas (..., 8) + anchor AABB (..., 6) -> OBB (..., 7)."""
    a_ctr, a_size = _aabb_ctr_size(anchors)
    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy, dz = deltas[..., 0], deltas[..., 1], deltas[..., 2]
    dw = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
    dh = jnp.clip(deltas[..., 4], -max_ratio, max_ratio)
    dd = jnp.clip(deltas[..., 5], -max_ratio, max_ratio)
    da = jnp.clip(deltas[..., 6], -0.5, 0.5)
    db = jnp.clip(deltas[..., 7], -0.5, 0.5)

    gx = a_ctr[..., 0] + a_size[..., 0] * dx
    gy = a_ctr[..., 1] + a_size[..., 1] * dy
    gz = a_ctr[..., 2] + a_size[..., 2] * dz
    gw = a_size[..., 0] * jnp.exp(dw)
    gh = a_size[..., 1] * jnp.exp(dh)
    gd = a_size[..., 2] * jnp.exp(dd)

    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    ga = gx + da * gw
    ga_ = gx - da * gw
    gb = gy + db * gh
    gb_ = gy - db * gh
    # quad through the 4 edge midpoint-offset points
    polys = jnp.stack([ga, y1, x2, gb, ga_, y2, x1, gb_], axis=-1)
    ctr = jnp.stack([gx, gy] * 4, axis=-1)
    centered = polys - ctr
    diag = jnp.sqrt(centered[..., 0::2] ** 2 + centered[..., 1::2] ** 2)
    scale = jnp.max(diag, axis=-1, keepdims=True) / diag
    centered = centered * jnp.repeat(scale, 2, axis=-1)
    obb2d = rectpoly2obb(centered + ctr)  # (..., 5)
    return jnp.concatenate(
        [
            obb2d[..., 0:2],
            gz[..., None],
            obb2d[..., 2:4],
            gd[..., None],
            obb2d[..., 4:5],
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Rotated coder (OBB vs OBB, second stage)
# ---------------------------------------------------------------------------


def encode_rotated(gt: jax.Array, rois: jax.Array) -> jax.Array:
    """gt OBB (..., 7) vs RoI OBB (..., 7) -> 7 deltas (..., 7)."""
    cos = jnp.cos(rois[..., 6])
    sin = jnp.sin(rois[..., 6])
    off = gt[..., 0:3] - rois[..., 0:3]
    dx = (cos * off[..., 0] + sin * off[..., 1]) / rois[..., 3]
    dy = (-sin * off[..., 0] + cos * off[..., 1]) / rois[..., 4]
    dz = off[..., 2] / rois[..., 5]
    dsize = jnp.log(gt[..., 3:6] / rois[..., 3:6])
    dangle = (gt[..., 6] - rois[..., 6]) / (2 * PI)
    return jnp.concatenate(
        [jnp.stack([dx, dy, dz], axis=-1), dsize, dangle[..., None]], axis=-1
    )


def decode_rotated(deltas: jax.Array, rois: jax.Array,
                   xform_clip: float = BBOX_XFORM_CLIP) -> jax.Array:
    """7 deltas (..., 7) + RoI OBB (..., 7) -> OBB (..., 7)."""
    cos = jnp.cos(rois[..., 6])
    sin = jnp.sin(rois[..., 6])
    dx, dy, dz = deltas[..., 0], deltas[..., 1], deltas[..., 2]
    dsize = jnp.clip(deltas[..., 3:6], None, xform_clip)
    dangle = deltas[..., 6]
    x = dx * rois[..., 3] * cos - dy * rois[..., 4] * sin + rois[..., 0]
    y = dx * rois[..., 3] * sin + dy * rois[..., 4] * cos + rois[..., 1]
    z = dz * rois[..., 5] + rois[..., 2]
    size = jnp.exp(dsize) * rois[..., 3:6]
    angle = (2 * PI * dangle + rois[..., 6]) % PI
    angle = jnp.where(angle > PI / 2, angle - PI, angle)
    return jnp.concatenate(
        [jnp.stack([x, y, z], axis=-1), size, angle[..., None]], axis=-1
    )
