"""Axis-aligned 3D box algebra (pure jnp, fully batched, mask-friendly).

Boxes are ``[x1, y1, z1, x2, y2, z2]`` with ``x2 >= x1`` etc.  Everything is
written for static shapes: instead of boolean filtering we return masks so the
callers stay jit-compatible on TPU.

Behavioral parity with the reference's box utilities
(``/root/reference/nerf_rpn/model/utils.py:268-458``): same IoU definition,
same small-box threshold semantics, same clamp-to-grid clipping.  The
reference chunks the pairwise IoU in python to bound GPU memory
(``utils.py:370-384``); on TPU we materialise the full (M, N) matrix — XLA
tiles it — and expose an optional ``lax.map`` row-chunked variant only for
very large M.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_volume(boxes: jax.Array) -> jax.Array:
    """Volume of AABBs. boxes: (..., 6) -> (...)."""
    wlh = boxes[..., 3:6] - boxes[..., 0:3]
    return jnp.prod(wlh, axis=-1)


def box_iou_aabb(boxes1: jax.Array, boxes2: jax.Array, eps: float = 0.0) -> jax.Array:
    """Elementwise IoU between aligned AABB sets: (..., 6) x (..., 6) -> (...)."""
    lt = jnp.maximum(boxes1[..., 0:3], boxes2[..., 0:3])
    rb = jnp.minimum(boxes1[..., 3:6], boxes2[..., 3:6])
    wlh = jnp.clip(rb - lt, 0.0)
    inter = jnp.prod(wlh, axis=-1)
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    return inter / (union + eps) if eps else inter / union


def pairwise_iou_aabb(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise IoU matrix: (M, 6) x (N, 6) -> (M, N).

    Mirrors the semantics of reference ``box_iou_3d`` (AABB branch,
    ``model/utils.py:387-458``) without host chunking.
    """
    return box_iou_aabb(boxes1[:, None, :], boxes2[None, :, :])


def pairwise_iou_aabb_chunked(
    boxes1: jax.Array, boxes2: jax.Array, chunk: int = 256
) -> jax.Array:
    """Row-chunked pairwise IoU via lax.map, for very large M x N.

    M must be divisible by ``chunk`` (pad + mask at the call site).
    """
    m = boxes1.shape[0]
    assert m % chunk == 0, f"M={m} must be a multiple of chunk={chunk}"
    rows = boxes1.reshape(m // chunk, chunk, 6)
    out = jax.lax.map(lambda r: pairwise_iou_aabb(r, boxes2), rows)
    return out.reshape(m, boxes2.shape[0])


def clip_boxes_to_grid(boxes: jax.Array, grid_size: jax.Array) -> jax.Array:
    """Clamp AABBs into ``[0, grid_size]`` per axis.

    ``grid_size`` is ``(..., 3)`` (W, L, H) broadcastable against the boxes'
    leading dims.  Parity: reference ``clip_boxes_to_mesh`` AABB branch
    (``model/utils.py:329-345``).
    """
    lo = jnp.clip(boxes[..., 0:3], 0.0, grid_size)
    hi = jnp.clip(boxes[..., 3:6], 0.0, grid_size)
    return jnp.concatenate([lo, hi], axis=-1)


def obb_center_valid_mask(boxes: jax.Array, grid_size: jax.Array) -> jax.Array:
    """Validity mask for OBBs: center inside the grid.

    The reference cannot clamp OBBs, so it instead drops proposals whose
    center leaves the grid (``model/utils.py:347-367``).  We return the mask
    rather than filtering.  boxes: (..., 7); grid_size: (..., 3).
    """
    ctr = boxes[..., 0:3]
    return jnp.all((ctr >= 0.0) & (ctr <= grid_size), axis=-1)


def small_box_mask(boxes: jax.Array, min_size: float) -> jax.Array:
    """True where the box has every side >= min_size.

    Works for AABB (..., 6) or OBB (..., 7) (w, l, h at 3:6).  Parity:
    reference ``remove_small_boxes`` (``model/utils.py:268-289``) which keeps
    boxes with all dims >= min_size; we return the keep-mask.
    """
    if boxes.shape[-1] == 6:
        dims = boxes[..., 3:6] - boxes[..., 0:3]
    else:
        dims = boxes[..., 3:6]
    return jnp.all(dims >= min_size, axis=-1)
