"""Fixed-capacity masked NMS with exact sequential-greedy semantics, on device.

The reference runs a python while-loop over score-sorted boxes with a
per-step IoU call (``model/utils.py:215-230``) — O(N) host iterations with a
device sync each.  Here the IoU matrix is materialised once (chunked for OBBs
whose polygon clipping is memory-heavy) and suppression runs as a
``lax.fori_loop`` over the sorted order: box i suppresses every lower-scored
box with IoU > threshold *iff box i itself is still alive* — bit-identical to
the greedy sequential keep-set.

Everything returns masks / padded index arrays so callers stay jit-static.
``category`` reproduces ``batched_nms`` (``model/utils.py:233-265``):
suppression only applies within a category (FPN level for the RPN).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.aabb import pairwise_iou_aabb
from nerf_rpn_tpu.ops.rotated_iou import iou_rotated_3d

NEG_INF = -1e10


def pairwise_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(M, 6|7) x (N, 6|7) -> (M, N); dispatches AABB vs rotated OBB."""
    if boxes1.shape[-1] == 6:
        return pairwise_iou_aabb(boxes1, boxes2)
    b1 = jnp.broadcast_to(boxes1[:, None, :], (boxes1.shape[0], boxes2.shape[0], 7))
    b2 = jnp.broadcast_to(boxes2[None, :, :], (boxes1.shape[0], boxes2.shape[0], 7))
    return iou_rotated_3d(b1, b2)


def pairwise_iou_chunked(boxes1: jax.Array, boxes2: jax.Array, chunk: int = 128) -> jax.Array:
    """Row-chunked pairwise IoU via lax.map (bounds the 24-vertex polygon
    scratch for the OBB path).  len(boxes1) must divide by ``chunk``."""
    m = boxes1.shape[0]
    if m <= chunk:
        return pairwise_iou(boxes1, boxes2)
    pad = (-m) % chunk
    padded = jnp.pad(boxes1, ((0, pad), (0, 0))) if pad else boxes1
    rows = padded.reshape(-1, chunk, boxes1.shape[-1])
    out = jax.lax.map(lambda r: pairwise_iou(r, boxes2), rows)
    return out.reshape(-1, boxes2.shape[0])[:m]


@partial(jax.jit, static_argnames=("iou_chunk",))
def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float | jax.Array,
    category: jax.Array | None = None,
    iou_chunk: int = 128,
) -> jax.Array:
    """Greedy NMS keep-mask.

    Args:
        boxes: (N, 6) AABB or (N, 7) OBB.
        scores: (N,).
        valid: (N,) bool — padding / pre-filtered entries are never kept and
            never suppress anyone.
        iou_threshold: suppress when IoU > threshold (strict, matching the
            reference's ``iou <= threshold`` keep condition).
        category: optional (N,) int — suppression only within equal values
            (per-FPN-level NMS).

    Returns:
        keep: (N,) bool in the *original* order.
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]

    iou = pairwise_iou_chunked(sboxes, sboxes, chunk=iou_chunk)
    overlap = iou > iou_threshold
    if category is not None:
        scat = category[order]
        overlap = overlap & (scat[:, None] == scat[None, :])
    # j can only be suppressed by a *higher-scored* i
    tri = jnp.tril(jnp.ones((n, n), dtype=bool))  # i >= j -> no suppression
    overlap = overlap & ~tri

    def body(i, alive):
        suppress = overlap[i] & alive[i]
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, n, body, svalid)
    # scatter back to the original order
    keep = jnp.zeros((n,), bool).at[order].set(alive)
    return keep


def topk_after_nms(scores: jax.Array, keep: jax.Array, k: int):
    """Indices of the k highest-scored kept boxes (padded with the lowest
    kept/invalid entries; also returns their validity mask)."""
    masked = jnp.where(keep, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k)
    return idx, vals > NEG_INF / 2
