"""Fixed-capacity masked NMS with exact sequential-greedy semantics, on device.

The reference runs a python while-loop over score-sorted boxes with a
per-step IoU call (``model/utils.py:215-230``) — O(N) host iterations with a
device sync each.  Here the greedy keep-set is computed as a **bitmask
fixpoint** (see ``nms_mask``): build the packed suppression DAG once with
on-the-fly IoU, then sweep ``alive <- valid & ~any(suppressor alive)`` to
convergence.  Bit-identical to sequential greedy NMS (a box is suppressed
iff an earlier *kept* box overlaps it), with suppression-chain-depth device
sweeps instead of N host steps, and no materialised (N, N) float matrix.

For rotated boxes the graph build additionally gates the expensive polygon
clip with a cheap exact IoU upper bound and evaluates only the compacted
candidate pairs (see ``nms_mask``'s ``pair_budget``) — ~11x faster at 10k
boxes with a bit-identical keep-set.

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


def _rank_select(words: jax.Array, pc: jax.Array, csum: jax.Array,
                 start: jax.Array, k: int, total: int) -> jax.Array:
    """Indices of the set bits with ranks [start, start+k) in the bit-set
    packed as ``words`` (uint32), padded with the sentinel ``total``.

    Gather-based: TPU scatters serialize per update, so the obvious
    cumsum+scatter over all ``total`` elements costs ~5 ns/element; instead
    the popcounts ``pc`` and their inclusive cumsum ``csum`` locate each
    rank's word by binary search (``searchsorted``) and a 5-step popcount
    bisection selects the rank-th set bit within it — all gathers and
    elementwise ops on (k,) arrays."""
    j = start + jnp.arange(k, dtype=jnp.int32)
    # "compare_all" turns the binary search into ONE parallel comparison
    # fusion; the default "scan" lowers to a ~16-step while whose dependent
    # (k,)-gather iterations are pure latency (4 such whiles were ~2 ms of
    # the 4.8 ms proposal stage at the bench shape).  O(W*k) compares are
    # cheaper than the latency until W is huge; keep scan beyond 64k words.
    method = "compare_all" if csum.shape[0] <= 65536 else "scan"
    w = jnp.searchsorted(csum, j, side="right", method=method).astype(jnp.int32)
    ws = jnp.minimum(w, words.shape[0] - 1)
    word = words[ws]
    rem = j - (csum[ws] - pc[ws])                  # rank within word
    b = jnp.zeros_like(j)
    for width in (16, 8, 4, 2, 1):
        low = (jnp.uint32((1 << width) - 1) << b.astype(jnp.uint32))
        cl = jax.lax.population_count(word & low).astype(jnp.int32)
        hi = rem >= cl
        b = b + jnp.where(hi, width, 0)
        rem = rem - jnp.where(hi, cl, 0)
    idx = ws * _WORD + b
    n_cand = csum[-1]
    return jnp.where(j < n_cand, idx, total)


def _compact_indices(flat: jax.Array, k_cap: int) -> jax.Array:
    """Indices of the first ``k_cap`` set bits of ``flat`` (bool (T,), T
    divisible by 32), padded with the sentinel ``T``."""
    words = _pack_bits(flat)                       # (T/32,) uint32
    pc = jax.lax.population_count(words).astype(jnp.int32)
    csum = jnp.cumsum(pc)                          # inclusive, (W,)
    return _rank_select(words, pc, csum, jnp.int32(0), k_cap, flat.shape[0])


@partial(jax.jit, static_argnames=("row_chunk", "pair_budget"))
def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float | jax.Array,
    category: jax.Array | None = None,
    row_chunk: int = 256,
    pair_budget: int | None = 8,
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
        pair_budget: OBB path only — per-round budget of exact polygon clips
            (``row_chunk * pair_budget`` pairs per round).  Pairs are first
            gated by a cheap exact IoU upper bound (enclosing-AABB
            intersection, see
            ``rotated_iou_pairwise.iou_rotated_3d_upper_bound``); surviving
            pairs are rank-selected in rounds of the budget and only those
            run the ~2k-flop clipping chain (one round for typical chunks,
            more for denser ones — a ``while_loop``, not a ``lax.cond``
            fallback, so batching via vmap stays efficient).  The result
            NEVER depends on the budget — only the speed does.  ``None``
            disables gating (always clip all pairs).

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

    k_cap = (row_chunk * pair_budget) if pair_budget is not None else None
    use_gating = dim == 7 and k_cap is not None and k_cap < row_chunk * np_

    def build_chunk(args):
        blk_boxes, blk_pos, blk_cat = args
        base = pos[None, :] < blk_pos[:, None]                # earlier-only
        if scat is not None:
            base = base & (blk_cat[:, None] == scat[None, :])
        if not use_gating:
            ov = pairwise_iou(blk_boxes, sboxes) > iou_threshold  # (C, Np)
            return _pack_bits(ov & base)

        from nerf_rpn_tpu.ops.rotated_iou_pairwise import (
            iou_rotated_3d_pairs_soa,
            iou_rotated_3d_upper_bound,
        )

        # Gate by the cheap exact upper bound (the 1e-3 slack absorbs the f32
        # difference between the bound's and the clip's arithmetic, measured
        # < 1e-5 on random boxes).
        ub = iou_rotated_3d_upper_bound(blk_boxes, sboxes)
        cand = base & (ub > iou_threshold - 1e-3)
        flat = cand.reshape(-1)
        total = row_chunk * np_
        words = _pack_bits(flat)
        pc = jax.lax.population_count(words).astype(jnp.int32)
        csum = jnp.cumsum(pc)
        n_cand = csum[-1]

        # Clip the candidates in rounds of k_cap (rank-selected); typical
        # chunks need ONE round, denser ones just take more rounds — exact
        # for any candidate count, and with no lax.cond this stays efficient
        # under vmap (which would otherwise execute both branches).
        def more_rounds(carry):
            r, _ = carry
            return r * k_cap < n_cand

        def clip_round(carry):
            r, ov = carry
            idx = _rank_select(words, pc, csum, r * k_cap, k_cap, total)
            b1 = blk_boxes[jnp.minimum(idx // np_, row_chunk - 1)]
            b2 = sboxes[jnp.minimum(idx % np_, np_ - 1)]
            # 2-D pair layout: full (8, 128) VPU tiles for the clip chain
            lanes = 128 if k_cap % 128 == 0 else 1
            hit = iou_rotated_3d_pairs_soa(
                b1.reshape(-1, lanes, 7), b2.reshape(-1, lanes, 7)
            ).reshape(k_cap) > iou_threshold
            return r + 1, ov.at[idx].set(hit, mode="drop")

        _, ovf = jax.lax.while_loop(
            more_rounds, clip_round,
            (jnp.int32(0), jnp.zeros((total,), bool)),
        )
        return _pack_bits(ovf.reshape(row_chunk, np_))         # (C, Np/32)

    import os as _os

    use_graph_kernel = (
        _os.environ.get("NERF_RPN_TPU_NMS_GRAPH_KERNEL", "0") == "1"
        and dim == 6
        and scat is None
        and isinstance(iou_threshold, (int, float))
        and np_ % row_chunk == 0
        and jax.default_backend() == "tpu"
    )
    if use_graph_kernel:
        # one-pass Pallas build (ops/nms_graph.py): exact, but measured
        # ~2.6 ms standalone at the bench's 4x2560 problems vs ~1.5 ms for
        # the chunked XLA build below — OFF by default, kept as the
        # optimisation harness for larger candidate counts
        from nerf_rpn_tpu.ops.nms_graph import suppression_graph

        m = suppression_graph(sboxes, float(iou_threshold),
                              row_tile=row_chunk)
    else:
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
