"""Fixed-capacity masked NMS with exact sequential-greedy semantics, on device.

The reference runs a python while-loop over score-sorted boxes with a
per-step IoU call (``model/utils.py:215-230``) — O(N) host iterations with a
device sync each.  Here the greedy keep-set is computed as a **bitmask
fixpoint** (see ``nms_mask``): build the packed suppression DAG once with
on-the-fly IoU, then sweep ``alive <- valid & ~any(suppressor alive)`` to
convergence.  Bit-identical to sequential greedy NMS (a box is suppressed
iff an earlier *kept* box overlaps it), with suppression-chain-depth device
sweeps instead of N host steps, and no materialised (N, N) float matrix.

Everything returns masks / padded index arrays so callers stay jit-static.
``category`` reproduces ``batched_nms`` (``model/utils.py:233-265``):
suppression only applies within a category (FPN level for the RPN).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.aabb import pairwise_iou_aabb
from nerf_rpn_tpu.ops.topk import safe_top_k

NEG_INF = -1e10


def pairwise_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(M, 6|7) x (N, 6|7) -> (M, N); dispatches AABB vs rotated OBB.

    The OBB branch uses the structure-of-arrays formulation — full-tile VPU
    ops with no sub-lane axes (see ``ops/rotated_iou_pairwise.py``)."""
    if boxes1.shape[-1] == 6:
        return pairwise_iou_aabb(boxes1, boxes2)
    from nerf_rpn_tpu.ops.rotated_iou_pairwise import pairwise_iou_rotated_3d_soa

    return pairwise_iou_rotated_3d_soa(boxes1, boxes2)


def pairwise_iou_chunked(boxes1: jax.Array, boxes2: jax.Array, chunk: int = 128) -> jax.Array:
    """Row-chunked pairwise IoU via lax.map (bounds the 24-vertex polygon
    scratch for the OBB path)."""
    m = boxes1.shape[0]
    if m <= chunk:
        return pairwise_iou(boxes1, boxes2)
    pad = (-m) % chunk
    padded = jnp.pad(boxes1, ((0, pad), (0, 0))) if pad else boxes1
    rows = padded.reshape(-1, chunk, boxes1.shape[-1])
    out = jax.lax.map(lambda r: pairwise_iou(r, boxes2), rows)
    return out.reshape(-1, boxes2.shape[0])[:m]


_WORD = 32


def _pack_bits(b: jax.Array) -> jax.Array:
    """bool (..., W*32) -> uint32 (..., W), bit c of word w = element 32w+c."""
    powers = (jnp.uint32(1) << jnp.arange(_WORD, dtype=jnp.uint32))
    words = b.reshape(*b.shape[:-1], -1, _WORD).astype(jnp.uint32)
    return jnp.sum(words * powers, axis=-1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("row_chunk",))
def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float | jax.Array,
    category: jax.Array | None = None,
    row_chunk: int = 256,
) -> jax.Array:
    """Greedy NMS keep-mask (exact sequential semantics), bitmask fixpoint.

    Two phases:
    1. Build the packed suppression graph: M[j, w] bit c set iff the earlier
       box 32w+c overlaps box j past the threshold (same category).  Built in
       row chunks with on-the-fly IoU — the bool (N, N) matrix is never
       materialised (N=10k costs 12.5 MB packed vs 400 MB f32).
    2. Iterate ``alive <- valid & ~any(M & packed(alive))`` to the fixpoint.
       The suppression graph is a DAG in score order, so this converges in
       suppression-chain-depth iterations (typically < 10); each iteration
       is one 12.5 MB HBM sweep instead of the reference's N host steps.

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
    pad = (-n) % max(row_chunk, _WORD)
    dim = boxes.shape[-1]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]
    scat = category[order] if category is not None else None
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        svalid = jnp.pad(svalid, (0, pad))
        if scat is not None:
            scat = jnp.pad(scat, (0, pad))
    np_ = n + pad
    pos = jnp.arange(np_)

    def build_chunk(args):
        blk_boxes, blk_pos, blk_cat = args
        ov = pairwise_iou(blk_boxes, sboxes) > iou_threshold  # (C, Np)
        ov = ov & (pos[None, :] < blk_pos[:, None])           # earlier-only
        if scat is not None:
            ov = ov & (blk_cat[:, None] == scat[None, :])
        return _pack_bits(ov)                                  # (C, Np/32)

    chunk_args = (
        sboxes.reshape(-1, row_chunk, dim),
        pos.reshape(-1, row_chunk),
        scat.reshape(-1, row_chunk) if scat is not None
        else jnp.zeros((np_ // row_chunk, row_chunk), jnp.int32),
    )
    m = jax.lax.map(build_chunk, chunk_args).reshape(np_, np_ // _WORD)

    def fix_cond(carry):
        prev, cur, it = carry
        return jnp.any(prev != cur) & (it < np_)

    def fix_body(carry):
        _, cur, it = carry
        alive_bits = _pack_bits(cur)
        sup = jnp.any((m & alive_bits[None, :]) != 0, axis=1)
        return cur, svalid & ~sup, it + 1

    first = fix_body((svalid, svalid, jnp.zeros((), jnp.int32)))[1]
    _, alive, _ = jax.lax.while_loop(
        fix_cond, fix_body, (svalid, first, jnp.zeros((), jnp.int32))
    )
    keep = jnp.zeros((n,), bool).at[order].set(alive[:n])
    return keep


def topk_after_nms(scores: jax.Array, keep: jax.Array, k: int):
    """Indices of the k highest-scored kept boxes (padded with the lowest
    kept/invalid entries; also returns their validity mask)."""
    masked = jnp.where(keep, scores, NEG_INF)
    vals, idx = safe_top_k(masked, k)
    return idx, vals > NEG_INF / 2
