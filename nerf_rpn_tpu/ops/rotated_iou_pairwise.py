"""Pairwise rotated 3D IoU, structure-of-arrays formulation (NMS hot path).

The general rotated-IoU chain (``ops/rotated_iou.py``) carries tiny trailing
axes — (..., 4, 2) corners, (..., 24) vertex rings — which land on TPU
sub-lanes and waste most of each vector op at NMS scales (millions of pairs).
This module unrolls EVERY small axis into python lists of (M, N) arrays: the
4 corners, the 16 edge intersections, the 24-vertex ring and the 32-slot
bitonic sorting network are all static python loops over full-tile
elementwise ops — the layout a hand-written VPU kernel would use, expressed
in jnp so XLA fuses the chains.

Semantics are identical to ``rotated_iou.iou_rotated_3d`` (same EPS choices,
same masked-angle-sort area with index-epsilon tie-breaks); tested for
equality on random boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8
_CONTAIN_TOL = 1e-5  # relative; the reference's 1e-6 drops corners of
# coincident boxes at typical scene coordinates (f32 cancellation in the
# projection test exceeds 1e-6), halving the computed overlap
_INVALID_KEY = 100.0
_RING = 32  # 24 candidate vertices padded to the bitonic network size


def _corners_1d(x, y, w, h, theta):
    """Corner coordinate lists ([4 x (K,)], [4 x (K,)]) in CCW order."""
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    xs = (w / 2, -w / 2, -w / 2, w / 2)
    ys = (h / 2, h / 2, -h / 2, -h / 2)
    cxs = [x + a * cos - b * sin for a, b in zip(xs, ys)]
    cys = [y + a * sin + b * cos for a, b in zip(xs, ys)]
    return cxs, cys


def _containment(px, py, ax, ay, bx, by, dx_, dy_):
    """Is point (px, py) inside the rectangle with corners a, b, ., d?
    (projection test, parity with rotated_iou._corners_in_box)."""
    abx, aby = bx - ax, by - ay
    adx, ady = dx_ - ax, dy_ - ay
    amx, amy = px - ax, py - ay
    p_ab = abx * amx + aby * amy
    n_ab = abx * abx + aby * aby
    p_ad = adx * amx + ady * amy
    n_ad = adx * adx + ady * ady
    r_ab = p_ab / n_ab
    r_ad = p_ad / n_ad
    return ((r_ab > -_CONTAIN_TOL) & (r_ab < 1 + _CONTAIN_TOL)
            & (r_ad > -_CONTAIN_TOL) & (r_ad < 1 + _CONTAIN_TOL))


def _pairwise_intersection_area(cx1, cy1, cx2, cy2):
    """Intersection area of two quads given corner lists of (M, N) arrays."""
    verts_x, verts_y, verts_ok = [], [], []

    # corners of box1 inside box2, and vice versa (8 vertices)
    for k in range(4):
        ok = _containment(cx1[k], cy1[k], cx2[0], cy2[0], cx2[1], cy2[1],
                          cx2[3], cy2[3])
        verts_x.append(cx1[k])
        verts_y.append(cy1[k])
        verts_ok.append(ok)
    for k in range(4):
        ok = _containment(cx2[k], cy2[k], cx1[0], cy1[0], cx1[1], cy1[1],
                          cx1[3], cy1[3])
        verts_x.append(cx2[k])
        verts_y.append(cy2[k])
        verts_ok.append(ok)

    # 16 edge-pair intersections
    for k in range(4):
        x1, y1 = cx1[k], cy1[k]
        x2, y2 = cx1[(k + 1) % 4], cy1[(k + 1) % 4]
        for l in range(4):
            x3, y3 = cx2[l], cy2[l]
            x4, y4 = cx2[(l + 1) % 4], cy2[(l + 1) % 4]
            num = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
            den_t = (x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)
            den_u = (x1 - x2) * (y1 - y3) - (y1 - y2) * (x1 - x3)
            parallel = num == 0.0
            safe = jnp.where(parallel, 1.0, num)
            t_ex = jnp.where(parallel, -1.0, den_t / safe)
            u_ex = jnp.where(parallel, -1.0, -den_u / safe)
            ok = (t_ex > 0.0) & (t_ex < 1.0) & (u_ex > 0.0) & (u_ex < 1.0)
            t = den_t / (num + EPS)
            okf = ok.astype(x1.dtype)
            verts_x.append((x1 + t * (x2 - x1)) * okf)
            verts_y.append((y1 + t * (y2 - y1)) * okf)
            verts_ok.append(ok)

    # masked centroid
    zero = jnp.zeros_like(verts_x[0])
    count = sum(ok.astype(zero.dtype) for ok in verts_ok)
    denom = jnp.maximum(count, 1.0)
    mx = sum(jnp.where(ok, x, 0.0) for x, ok in zip(verts_x, verts_ok)) / denom
    my = sum(jnp.where(ok, y, 0.0) for y, ok in zip(verts_y, verts_ok)) / denom

    # angle keys with index-epsilon tie-break; pad ring to 32 slots.
    # sorting only needs a key MONOTONE in angle, so use the pseudo-angle
    # (diamond angle): p = 1 - x/(|x|+|y|) for y >= 0 else 3 + x/(|x|+|y|),
    # monotone over [0, 4) — no atan2 transcendentals
    keys, xs, ys = [], [], []
    for i, (x, y, ok) in enumerate(zip(verts_x, verts_y, verts_ok)):
        cxd = x - mx
        cyd = y - my
        r = cxd / (jnp.abs(cxd) + jnp.abs(cyd) + 1e-20)
        pseudo = jnp.where(cyd >= 0, 1.0 - r, 3.0 + r)
        keys.append(jnp.where(ok, pseudo, _INVALID_KEY) + i * 1e-6)
        xs.append(cxd)
        ys.append(cyd)
    for i in range(len(keys), _RING):
        keys.append(jnp.full_like(zero, 2 * _INVALID_KEY))
        xs.append(zero)
        ys.append(zero)

    # bitonic sort (ascending by key), fully unrolled over the 32 slots
    n = _RING
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            for i in range(n):
                p = i ^ j
                if p <= i:
                    continue
                asc = (i & k) == 0
                ki, kp = keys[i], keys[p]
                self_min = ki <= kp
                lo_k = jnp.where(self_min, ki, kp)
                hi_k = jnp.where(self_min, kp, ki)
                lo_x = jnp.where(self_min, xs[i], xs[p])
                hi_x = jnp.where(self_min, xs[p], xs[i])
                lo_y = jnp.where(self_min, ys[i], ys[p])
                hi_y = jnp.where(self_min, ys[p], ys[i])
                if asc:
                    keys[i], keys[p] = lo_k, hi_k
                    xs[i], xs[p] = lo_x, hi_x
                    ys[i], ys[p] = lo_y, hi_y
                else:
                    keys[i], keys[p] = hi_k, lo_k
                    xs[i], xs[p] = hi_x, lo_x
                    ys[i], ys[p] = hi_y, lo_y
            j //= 2
        k *= 2

    # fill invalid slots with the first (valid) vertex, shoelace the ring
    fx, fy = xs[0], ys[0]
    rx = [jnp.where(keys[i] < _INVALID_KEY / 2, xs[i], fx) for i in range(n)]
    ry = [jnp.where(keys[i] < _INVALID_KEY / 2, ys[i], fy) for i in range(n)]
    total = zero
    for i in range(n):
        nxt = (i + 1) % n
        total = total + (rx[i] * ry[nxt] - ry[i] * rx[nxt])
    area = jnp.abs(total) / 2
    return jnp.where(count >= 3, area, 0.0)


def iou_rotated_3d_pairs_soa(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(..., 7) x (..., 7) -> (...) elementwise rotated 3D IoU.

    Same SoA clipping chain as the (M, N) pairwise version, broadcast
    elementwise — used by the NMS candidate-compaction path, which gathers
    only the pairs whose cheap IoU upper bound clears the threshold (it
    reshapes its flat pair list to 2-D so the chain runs on full VPU
    tiles rather than 1-D vectors)."""
    cx1, cy1 = _corners_1d(boxes1[..., 0], boxes1[..., 1], boxes1[..., 3],
                           boxes1[..., 4], boxes1[..., 6])
    cx2, cy2 = _corners_1d(boxes2[..., 0], boxes2[..., 1], boxes2[..., 3],
                           boxes2[..., 4], boxes2[..., 6])
    inter_2d = _pairwise_intersection_area(cx1, cy1, cx2, cy2)

    zmin1 = boxes1[..., 2] - boxes1[..., 5] * 0.5
    zmax1 = boxes1[..., 2] + boxes1[..., 5] * 0.5
    zmin2 = boxes2[..., 2] - boxes2[..., 5] * 0.5
    zmax2 = boxes2[..., 2] + boxes2[..., 5] * 0.5
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2),
                         0.0)
    inter_3d = inter_2d * z_overlap
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    return inter_3d / (v1 + v2 - inter_3d)


def iou_rotated_3d_upper_bound(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(M, 7) x (N, 7) -> (M, N) cheap EXACT upper bound on rotated 3D IoU.

    Each OBB is contained in its axis-aligned enclosing box, so the OBB
    intersection volume is bounded by the AABB intersection volume (and by
    either box's own volume); IoU = i / (v1 + v2 - i) is monotone in i, so
    substituting the bounded intersection gives a valid upper bound.  ~30
    flops/pair vs ~2k for the exact polygon clip — used to gate the clip in
    the NMS suppression-graph build."""
    def half_extents(b):
        c = jnp.abs(jnp.cos(b[:, 6]))
        s = jnp.abs(jnp.sin(b[:, 6]))
        return ((b[:, 3] * c + b[:, 4] * s) * 0.5,
                (b[:, 3] * s + b[:, 4] * c) * 0.5,
                b[:, 5] * 0.5)

    e1 = half_extents(boxes1)
    e2 = half_extents(boxes2)
    inter = None
    for axis in range(3):
        c1, h1 = boxes1[:, axis, None], e1[axis][:, None]
        c2, h2 = boxes2[None, :, axis], e2[axis][None, :]
        o = jnp.clip(jnp.minimum(c1 + h1, c2 + h2)
                     - jnp.maximum(c1 - h1, c2 - h2), 0.0)
        inter = o if inter is None else inter * o
    v1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    v2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    inter = jnp.minimum(inter, jnp.minimum(v1, v2))
    return inter / (v1 + v2 - inter)


def pairwise_iou_rotated_3d_soa(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(M, 7) x (N, 7) -> (M, N) rotated 3D IoU (z-rotation convention)."""
    a = lambda v: v[:, None]
    b = lambda v: v[None, :]
    cx1, cy1 = _corners_1d(boxes1[:, 0], boxes1[:, 1], boxes1[:, 3],
                           boxes1[:, 4], boxes1[:, 6])
    cx2, cy2 = _corners_1d(boxes2[:, 0], boxes2[:, 1], boxes2[:, 3],
                           boxes2[:, 4], boxes2[:, 6])
    cx1 = [a(v) for v in cx1]
    cy1 = [a(v) for v in cy1]
    cx2 = [b(v) for v in cx2]
    cy2 = [b(v) for v in cy2]

    inter_2d = _pairwise_intersection_area(cx1, cy1, cx2, cy2)

    zmin1 = a(boxes1[:, 2] - boxes1[:, 5] * 0.5)
    zmax1 = a(boxes1[:, 2] + boxes1[:, 5] * 0.5)
    zmin2 = b(boxes2[:, 2] - boxes2[:, 5] * 0.5)
    zmax2 = b(boxes2[:, 2] + boxes2[:, 5] * 0.5)
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2),
                         0.0)
    inter_3d = inter_2d * z_overlap
    v1 = a(boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])
    v2 = b(boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])
    return inter_3d / (v1 + v2 - inter_3d)
