"""Differentiable rotated-box IoU (2D polygon clipping x z-overlap), TPU-native.

Replaces the reference's rotated-IoU subsystem
(``/root/reference/nerf_rpn/model/rotated_iou/``): the same convex-polygon
intersection algorithm, but with the CUDA per-polygon selection-sort kernel
(``cuda_op/sort_vert_kernel.cu``) replaced by a *batched masked angle sort* —
one ``argsort`` over the 24-vertex lane axis, which XLA vectorises on the VPU
with no host round-trip and no custom backward (autodiff flows through the
gathered vertex coordinates exactly as in the reference design).

Algorithm for two rotated rectangles (all shapes batched over leading dims):

1. ``box2corners``: (x, y, w, h, theta) -> 4 CCW corners.
2. All 4x4 edge-pair segment intersections (masked; collinear treated as no
   intersection — same convention as the reference).
3. Corner-in-box containment tests (relative tolerance 1e-6).
4. Candidate vertex set = 8 corners + 16 intersections with a validity mask.
5. Centre on the masked mean, sort by ``atan2`` angle (invalid -> +inf), pad
   invalid slots with the first valid vertex, shoelace over the closed ring.
   Identical boxes (8 coincident valid corners — the corner case the CUDA
   kernel special-cases at ``sort_vert_kernel.cu:110-129``) need no special
   handling here: duplicated consecutive vertices contribute zero area.
6. 3D IoU = (2D intersection * z-overlap) / (v1 + v2 - intersection), as in
   reference ``cal_iou_3d`` (``oriented_iou_loss.py:82-107``); GIoU / DIoU use
   an enclosing box (aligned / pca / smallest-24-candidates strategies,
   ``oriented_iou_loss.py:150-218``, ``min_enclosing_box.py``).

3D OBBs here are ``[x, y, z, w, l, h, theta]``; the 2D sub-box is
``[x, y, w, l, theta]`` and the z-extent is ``h`` (matching the reference's
column choice ``[0,1,3,4,6]``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

EPS = 1e-8
_CONTAIN_TOL = 1e-5  # relative; the reference's 1e-6 drops corners of
# coincident boxes at typical scene coordinates (f32 cancellation in the
# projection test exceeds 1e-6), halving the computed overlap


def box2corners(box: jax.Array) -> jax.Array:
    """(..., 5) [x, y, w, h, theta] -> (..., 4, 2) CCW corners.

    Corner order for theta=0: (+w/2,+h/2), (-w/2,+h/2), (-w/2,-h/2),
    (+w/2,-h/2) — counter-clockwise, same as the reference so that edge
    conventions (and therefore intersection masks) match.
    """
    x, y, w, h, theta = (box[..., i] for i in range(5))
    xs = jnp.stack([w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    ys = jnp.stack([h / 2, h / 2, -h / 2, -h / 2], axis=-1)
    cos = jnp.cos(theta)[..., None]
    sin = jnp.sin(theta)[..., None]
    rx = xs * cos - ys * sin
    ry = xs * sin + ys * cos
    return jnp.stack([rx + x[..., None], ry + y[..., None]], axis=-1)


def _edges(corners: jax.Array) -> tuple[jax.Array, jax.Array]:
    """corners (..., 4, 2) -> segment endpoints p (..., 4, 2), q (..., 4, 2)."""
    return corners, jnp.roll(corners, -1, axis=-2)


def _segment_intersections(corners1: jax.Array, corners2: jax.Array):
    """All 4x4 edge-pair intersections.

    Returns (inter (..., 4, 4, 2), mask (..., 4, 4)).  Intersection points are
    zeroed where invalid so they carry zero value/gradient (the reference uses
    the same trick to make padding indices safe).
    """
    p1, q1 = _edges(corners1)
    p2, q2 = _edges(corners2)
    # broadcast: edge1 axis -2 (size 4, dim -3 after expand), edge2 axis -2.
    x1, y1 = p1[..., :, None, 0], p1[..., :, None, 1]
    x2, y2 = q1[..., :, None, 0], q1[..., :, None, 1]
    x3, y3 = p2[..., None, :, 0], p2[..., None, :, 1]
    x4, y4 = q2[..., None, :, 0], q2[..., None, :, 1]

    num = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    den_t = (x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)
    den_u = (x1 - x2) * (y1 - y3) - (y1 - y2) * (x1 - x3)
    parallel = num == 0.0
    safe_num = jnp.where(parallel, 1.0, num)
    t_exact = jnp.where(parallel, -1.0, den_t / safe_num)
    u_exact = jnp.where(parallel, -1.0, -den_u / safe_num)
    mask = (t_exact > 0.0) & (t_exact < 1.0) & (u_exact > 0.0) & (u_exact < 1.0)
    # Stabilised t for the coordinates themselves (reference adds EPS the
    # same way: box_intersection_2d.py:49).  t is zeroed where the pair is
    # masked BEFORE forming coordinates: near-parallel pairs make t huge
    # (den/(num+EPS) with num ~ -EPS) and inf * 0-mask would be NaN — the
    # masked entries must be exactly zero in value AND gradient (degenerate
    # boxes reach this path via the rotated FCOS loss).
    t = jnp.where(mask, den_t / (num + EPS), 0.0)
    ix = x1 + t * (x2 - x1)
    iy = y1 + t * (y2 - y1)
    inter = jnp.stack([ix, iy], axis=-1) * mask[..., None]
    return inter, mask


def _corners_in_box(corners: jax.Array, box_corners: jax.Array) -> jax.Array:
    """True where each of ``corners`` (..., 4, 2) lies inside the rectangle
    given by ``box_corners`` (..., 4, 2).  Relative-tolerance projection test
    (stable when the boxes coincide), same conditions as the reference
    (``box_intersection_2d.py:54-94``)."""
    # a boolean containment decision is not differentiable: detach the
    # inputs so a zero-area box (norm 0 -> 0/0) cannot leak NaN into the
    # BACKWARD pass (forward NaN compares correctly yield "not contained")
    corners = jax.lax.stop_gradient(corners)
    box_corners = jax.lax.stop_gradient(box_corners)
    a = box_corners[..., 0:1, :]
    b = box_corners[..., 1:2, :]
    d = box_corners[..., 3:4, :]
    ab = b - a
    ad = d - a
    am = corners - a
    p_ab = jnp.sum(ab * am, axis=-1)
    norm_ab = jnp.sum(ab * ab, axis=-1)
    p_ad = jnp.sum(ad * am, axis=-1)
    norm_ad = jnp.sum(ad * ad, axis=-1)
    r_ab = p_ab / norm_ab
    r_ad = p_ad / norm_ad
    return (
        (r_ab > -_CONTAIN_TOL)
        & (r_ab < 1.0 + _CONTAIN_TOL)
        & (r_ad > -_CONTAIN_TOL)
        & (r_ad < 1.0 + _CONTAIN_TOL)
    )


_INVALID_KEY = 100.0  # angles live in (-pi, pi]; anything >= ~99 is padding


def _bitonic_sort_xy(key: jax.Array, x: jax.Array, y: jax.Array):
    """Ascending bitonic sort by ``key`` along the last (power-of-2) axis,
    carrying (x, y) payloads through the same compare-exchanges.

    XLA's generic variadic sort is the hot spot of the whole rotated-IoU
    chain on TPU (~98% of the time at NMS scales); this fixed network is
    log^2(n)/2 = 15 rounds of pure VPU select ops and runs ~50x faster.
    Keys must be unique (callers add an index epsilon): equal keys would
    make both elements of a pair keep/lose the same payload.
    """
    n = key.shape[-1]
    idx = np.arange(n)
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            partner = idx ^ j
            take_min = jnp.asarray(((idx < partner) == ((idx & k) == 0)))
            kp = key[..., partner]
            xp = x[..., partner]
            yp = y[..., partner]
            self_is_min = key <= kp
            choose_self = jnp.where(take_min, self_is_min, ~self_is_min)
            key = jnp.where(take_min, jnp.minimum(key, kp),
                            jnp.maximum(key, kp))
            x = jnp.where(choose_self, x, xp)
            y = jnp.where(choose_self, y, yp)
            j //= 2
        k *= 2
    return key, x, y


def _masked_polygon_area(vertices: jax.Array, mask: jax.Array) -> jax.Array:
    """Area of the convex polygon formed by the valid vertices.

    vertices: (..., K, 2); mask: (..., K) bool.  Centre -> angle sort
    (bitonic network; invalid keys pushed past _INVALID_KEY) -> pad invalid
    with the first (valid) vertex -> shoelace over the closed ring.
    Polygons with < 3 valid vertices have zero area (same as the CUDA
    kernel's zero-padding path).
    """
    maskf = mask.astype(vertices.dtype)
    num_valid = jnp.sum(mask, axis=-1)
    denom = jnp.maximum(num_valid, 1).astype(vertices.dtype)
    mean = jnp.sum(vertices * maskf[..., None], axis=-2) / denom[..., None]
    centered = vertices - mean[..., None, :]
    # the angle is only a SORT KEY (a discrete ordering decision): detach it
    # so arctan2's undefined gradient at (0, 0) — hit by every zeroed
    # invalid vertex when no vertices are valid — cannot NaN the backward
    ang = jnp.arctan2(*jax.lax.stop_gradient((centered[..., 1],
                                              centered[..., 0])))
    k_count = ang.shape[-1]
    # unique keys: index epsilon breaks ties (coincident vertices carry the
    # same payload, so their relative order is irrelevant)
    eps = jnp.arange(k_count, dtype=vertices.dtype) * 1e-6
    key = jnp.where(mask, ang, _INVALID_KEY) + eps
    # pad the ring axis to the next power of two for the network
    ring_n = 1 << (k_count - 1).bit_length()
    pad = ring_n - k_count
    cx = centered[..., 0]
    cy = centered[..., 1]
    if pad:
        pad_widths = [(0, 0)] * (key.ndim - 1) + [(0, pad)]
        key = jnp.pad(key, pad_widths, constant_values=2 * _INVALID_KEY)
        cx = jnp.pad(cx, pad_widths)
        cy = jnp.pad(cy, pad_widths)
    key, sx, sy = _bitonic_sort_xy(key, cx, cy)
    sm = key < _INVALID_KEY / 2
    first_x = sx[..., 0:1]
    first_y = sy[..., 0:1]
    rx = jnp.where(sm, sx, first_x)
    ry = jnp.where(sm, sy, first_y)
    nx = jnp.roll(rx, -1, axis=-1)
    ny = jnp.roll(ry, -1, axis=-1)
    area = jnp.abs(jnp.sum(rx * ny - ry * nx, axis=-1)) / 2
    return jnp.where(num_valid >= 3, area, 0.0)


def oriented_box_intersection_area(corners1: jax.Array, corners2: jax.Array) -> jax.Array:
    """Intersection area of two rotated rectangles given CCW corners (..., 4, 2)."""
    inter, mask_inter = _segment_intersections(corners1, corners2)
    c1_in_2 = _corners_in_box(corners1, corners2)
    c2_in_1 = _corners_in_box(corners2, corners1)
    batch = corners1.shape[:-2]
    vertices = jnp.concatenate(
        [corners1, corners2, inter.reshape(*batch, 16, 2)], axis=-2
    )
    mask = jnp.concatenate(
        [c1_in_2, c2_in_1, mask_inter.reshape(*batch, 16)], axis=-1
    )
    return _masked_polygon_area(vertices, mask)


def iou_rotated_2d(box1: jax.Array, box2: jax.Array):
    """Elementwise rotated 2D IoU.  box*: (..., 5).

    Returns (iou, corners1, corners2, union_area) like reference ``cal_iou``.
    """
    corners1 = box2corners(box1)
    corners2 = box2corners(box2)
    inter = oriented_box_intersection_area(corners1, corners2)
    area1 = box1[..., 2] * box1[..., 3]
    area2 = box2[..., 2] * box2[..., 3]
    union = area1 + area2 - inter
    return inter / union, corners1, corners2, union


def _split_3d(box3d: jax.Array):
    """(..., 7) -> 2D sub-box (..., 5) and (zmin, zmax)."""
    box2d = jnp.concatenate(
        [box3d[..., 0:2], box3d[..., 3:5], box3d[..., 6:7]], axis=-1
    )
    half = box3d[..., 5] * 0.5
    return box2d, box3d[..., 2] - half, box3d[..., 2] + half


def iou_rotated_3d(box3d1: jax.Array, box3d2: jax.Array, verbose: bool = False):
    """Elementwise rotated 3D IoU.  box3d*: (..., 7) [x,y,z,w,l,h,theta]."""
    box1, zmin1, zmax1 = _split_3d(box3d1)
    box2, zmin2, zmax2 = _split_3d(box3d2)
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), 0.0)
    iou_2d, corners1, corners2, u = iou_rotated_2d(box1, box2)
    inter_3d = iou_2d * u * z_overlap
    v1 = jnp.prod(box3d1[..., 3:6], axis=-1)
    v2 = jnp.prod(box3d2[..., 3:6], axis=-1)
    u3d = v1 + v2 - inter_3d
    iou3d = inter_3d / u3d
    if verbose:
        z_range = jnp.clip(jnp.maximum(zmax1, zmax2) - jnp.minimum(zmin1, zmin2), 0.0)
        return iou3d, corners1, corners2, z_range, u3d
    return iou3d


# ---------------------------------------------------------------------------
# Enclosing boxes (for GIoU / DIoU)
# ---------------------------------------------------------------------------


def _enclosing_aligned(corners1: jax.Array, corners2: jax.Array):
    c = jnp.concatenate([corners1, corners2], axis=-2)
    w = jnp.max(c[..., 0], axis=-1) - jnp.min(c[..., 0], axis=-1)
    h = jnp.max(c[..., 1], axis=-1) - jnp.min(c[..., 1], axis=-1)
    return w, h


def _enclosing_pca(corners1: jax.Array, corners2: jax.Array):
    """PCA-rotated enclosing box, closed-form 2x2 eig in float64
    (mirrors the precision note in reference ``eigenvector_22``)."""
    c = jnp.concatenate([corners1, corners2], axis=-2)  # (..., 8, 2)
    c = c - jnp.mean(c, axis=-2, keepdims=True)
    cov = jnp.einsum("...ki,...kj->...ij", c, c)
    a = cov[..., 0, 0].astype(jnp.float64)
    cc = cov[..., 0, 1].astype(jnp.float64)
    b = cov[..., 1, 1].astype(jnp.float64)
    # radicand = (a-b)^2 + 4cc^2 >= 0; the 1e-30 keeps sqrt's gradient
    # finite at the isotropic-covariance point (degenerate inputs)
    delta = jnp.sqrt(a * a + 4 * cc * cc - 2 * a * b + b * b + 1e-30)
    safe_c = jnp.where(cc == 0, EPS, cc)
    v1 = jnp.stack([(a - b - delta) / (2 * safe_c), jnp.ones_like(a)], axis=-1)
    v2 = jnp.stack([(a - b + delta) / (2 * safe_c), jnp.ones_like(a)], axis=-1)
    v1 = (v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)).astype(c.dtype)
    v2 = (v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)).astype(c.dtype)
    p1 = jnp.sum(c * v1[..., None, :], axis=-1)
    p2 = jnp.sum(c * v2[..., None, :], axis=-1)
    w = jnp.max(p1, axis=-1) - jnp.min(p1, axis=-1)
    h = jnp.max(p2, axis=-1) - jnp.min(p2, axis=-1)
    return w, h


def _build_hull_tables():
    """24 candidate hull edges over 8 points (skip the 4 rectangle diagonals)
    and, per edge, the complementary 6 point indices.  Static tables, baked at
    trace time (reference ``min_enclosing_box.generate_table``)."""
    skip = {(0, 2), (1, 3), (5, 7), (4, 6)}
    lines, points = [], []
    for i in range(8):
        for j in range(i + 1, 8):
            if (i, j) in skip:
                continue
            lines.append((i, j))
            points.append([k for k in range(8) if k not in (i, j)])
    return np.array(lines, np.int32), np.array(points, np.int32)


_HULL_LINES, _HULL_POINTS = _build_hull_tables()


def _enclosing_smallest(corners1: jax.Array, corners2: jax.Array):
    """Smallest enclosing rectangle of the 8 corners, brute force over the 24
    candidate hull edges.  For each candidate edge: extent perpendicular to
    the edge (point-line distances) x extent parallel (projections)."""
    c = jnp.concatenate([corners1, corners2], axis=-2)  # (..., 8, 2)
    lines = c[..., _HULL_LINES, :]  # (..., 24, 2, 2)
    others = c[..., _HULL_POINTS, :]  # (..., 24, 6, 2)
    p1 = lines[..., 0, :]
    p2 = lines[..., 1, :]
    d = p2 - p1  # (..., 24, 2)
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-14)  # (..., 24)
    # perpendicular signed distances of the other 6 points
    rel = others - p1[..., None, :]  # (..., 24, 6, 2)
    perp = (d[..., None, 0] * rel[..., 1] - d[..., None, 1] * rel[..., 0]) / norm[..., None]
    d_span = jnp.max(perp, axis=-1) - jnp.min(perp, axis=-1)
    d_abs = jnp.max(jnp.abs(perp), axis=-1)
    dist = jnp.maximum(d_span, d_abs)  # (..., 24)
    # parallel projections of all 8 points
    rel8 = c[..., None, :, :] - p1[..., None, :]  # (..., 24, 8, 2)
    proj = jnp.sum(rel8 * (d / norm[..., None])[..., None, :], axis=-1)
    proj_span = jnp.max(proj, axis=-1) - jnp.min(proj, axis=-1)  # (..., 24)
    area = proj_span * dist
    # degenerate edges (coincident endpoints) give zero area: mask them out
    area = jnp.where(area == 0.0, 1e8, area)
    idx = jnp.argmin(area, axis=-1)
    w = jnp.take_along_axis(proj_span, idx[..., None], axis=-1)[..., 0]
    h = jnp.take_along_axis(dist, idx[..., None], axis=-1)[..., 0]
    return w, h


def enclosing_box(corners1: jax.Array, corners2: jax.Array, enclosing_type: str = "smallest"):
    if enclosing_type == "aligned":
        return _enclosing_aligned(corners1, corners2)
    if enclosing_type == "pca":
        return _enclosing_pca(corners1, corners2)
    if enclosing_type == "smallest":
        return _enclosing_smallest(corners1, corners2)
    raise ValueError(f"Unknown enclosing type: {enclosing_type}")


def giou_rotated_3d(box3d1: jax.Array, box3d2: jax.Array, enclosing_type: str = "smallest"):
    """3D rotated GIoU loss.  Returns (giou_loss, giou, iou3d), all (...)."""
    iou3d, corners1, corners2, z_range, u3d = iou_rotated_3d(box3d1, box3d2, verbose=True)
    w, h = enclosing_box(corners1, corners2, enclosing_type)
    v_c = z_range * w * h
    giou_loss = 1.0 - iou3d + (v_c - u3d) / v_c
    return giou_loss, 1.0 - giou_loss, iou3d


def diou_rotated_3d(box3d1: jax.Array, box3d2: jax.Array, enclosing_type: str = "smallest"):
    """3D rotated DIoU loss.  Returns (diou_loss, iou3d)."""
    iou3d, corners1, corners2, z_range, u3d = iou_rotated_3d(box3d1, box3d2, verbose=True)
    w, h = enclosing_box(corners1, corners2, enclosing_type)
    offset = box3d1[..., 0:3] - box3d2[..., 0:3]
    d2 = jnp.sum(offset * offset, axis=-1)
    c2 = w * w + h * h + z_range * z_range
    return 1.0 - iou3d + d2 / c2, iou3d


def pairwise_iou_rotated_3d(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise rotated 3D IoU matrix: (M, 7) x (N, 7) -> (M, N).

    The reference routes this through ``cal_iou_3d`` with a forced
    ``.cuda()`` round-trip (``model/utils.py:410-413``); here it is one
    broadcasted device computation.
    """
    b1 = jnp.broadcast_to(boxes1[:, None, :], (boxes1.shape[0], boxes2.shape[0], 7))
    b2 = jnp.broadcast_to(boxes2[None, :, :], (boxes1.shape[0], boxes2.shape[0], 7))
    return iou_rotated_3d(b1, b2)
