"""Anchor-based 3D region proposal pipeline, fixed-shape and fully on-device.

Parity target: reference ``RegionProposalNetwork`` (``model/rpn.py:167-549``)
— anchor/GT matching, balanced sampling, BCE + smooth-L1 / rotated-IoU /
2D-projection losses, and the decode -> per-level top-k -> clip -> small-box
filter -> score threshold -> per-level NMS -> global top-k inference path
(``filter_proposals``, ``rpn.py:303-370``).

TPU re-design:
- Scenes are a leading batch axis, not a python list; GT boxes are padded to
  a static ``max_gt`` with a validity mask.
- Every filtering stage is a mask update, never a gather to a dynamic size;
  the only gathers are the two static top-ks.
- Proposals are decoded only for the per-level top-k survivors (the
  reference decodes every anchor first, ``rpn.py:519-520``).
- All anchors / strides / padding-limit tables are trace-time numpy
  constants (see ``models/anchors.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.models import anchors as anchor_lib
from nerf_rpn_tpu.ops import coders
from nerf_rpn_tpu.ops.aabb import (
    clip_boxes_to_grid,
    obb_center_valid_mask,
    pairwise_iou_aabb,
    small_box_mask,
)
from nerf_rpn_tpu.ops.nms import NEG_INF, nms_mask
from nerf_rpn_tpu.ops.topk import safe_top_k
from nerf_rpn_tpu.ops.obb import obb2hbb_3d, obb2points_3d
from nerf_rpn_tpu.ops.rotated_iou import (
    diou_rotated_3d,
    giou_rotated_3d,
    iou_rotated_3d,
)
from nerf_rpn_tpu.utils.losses import bce_with_logits, smooth_l1
from nerf_rpn_tpu.utils.projection import project_points
from nerf_rpn_tpu.utils.target_assign import (
    match_anchors,
    sample_balanced_indices,
)


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    """Static RPN configuration (defaults = reference driver defaults,
    ``run_rpn.py:108-131``)."""

    rotated: bool = False
    fg_iou_thresh: float = 0.35
    bg_iou_thresh: float = 0.2
    batch_size_per_mesh: int = 256
    positive_fraction: float = 0.5
    pre_nms_top_n: int = 2500
    post_nms_top_n: int = 2500
    nms_thresh: float = 0.3
    score_thresh: float = 0.0
    min_size: float = 1e-3
    reg_loss_type: str = "smooth_l1"  # smooth_l1 | iou | linear_iou | giou | diou
    reg_loss_weight: float = 1.0
    reg_loss_weight_2d: float = 0.0
    anchor_sizes: tuple = anchor_lib.DEFAULT_ANCHOR_SIZES
    aspect_ratios: tuple = anchor_lib.DEFAULT_ASPECT_RATIOS
    normalize_ratios: bool = False

    @property
    def box_dim(self) -> int:
        return 7 if self.rotated else 6

    @property
    def delta_dim(self) -> int:
        return 8 if self.rotated else 6

    def decode(self, deltas: jax.Array, anchors: jax.Array) -> jax.Array:
        if self.rotated:
            return coders.decode_midpoint_offset(deltas, anchors)
        return coders.decode_aabb(deltas, anchors)

    def encode(self, gt: jax.Array, anchors: jax.Array) -> jax.Array:
        if self.rotated:
            return coders.encode_midpoint_offset(gt, anchors)
        return coders.encode_aabb(gt, anchors)


# ---------------------------------------------------------------------------
# Static per-level tables
# ---------------------------------------------------------------------------


def build_level_tables(
    cfg: RPNConfig,
    mesh_size: Sequence[int],
    level_shapes: Sequence[Sequence[int]],
):
    """Anchors + strides for the padded mesh shape, as numpy constants.

    Returns (anchors (N_total, 6), level_ids (N_total,), strides, counts).
    """
    strides = anchor_lib.level_strides(mesh_size, level_shapes)
    per_level = [
        anchor_lib.grid_anchors(
            tuple(shape), stride, cfg.anchor_sizes[i], cfg.aspect_ratios[i],
            cfg.normalize_ratios,
        )
        for i, (shape, stride) in enumerate(zip(level_shapes, strides))
    ]
    counts = [a.shape[0] for a in per_level]
    anchors = np.concatenate(per_level, axis=0)
    level_ids = np.repeat(np.arange(len(per_level), dtype=np.int32), counts)
    return anchors, level_ids, strides, counts


def flatten_head_outputs(
    logits: Sequence[jax.Array], deltas: Sequence[jax.Array], delta_dim: int
):
    """Per-level (B, X, Y, Z, A[*D]) -> concatenated (B, N) / (B, N, D).

    Flattening order (x, y, z, anchor) matches ``grid_anchors``
    (and the reference's permute_and_flatten, ``rpn.py:20-27``).
    """
    b = logits[0].shape[0]
    flat_logits = [l.reshape(b, -1) for l in logits]
    flat_deltas = [d.reshape(b, -1, delta_dim) for d in deltas]
    return jnp.concatenate(flat_logits, 1), jnp.concatenate(flat_deltas, 1)


def gather_delta_rows_levels(
    deltas: Sequence[jax.Array],   # per level (B, X, Y, Z, A*D) or (B, V_l, A*D)
    idx: jax.Array,                # (B, K) FLAT anchor indices
    counts: Sequence[int],
    anchors_per_loc: int,
    delta_dim: int,
) -> jax.Array:
    """(B, K, D) delta rows at flat anchor indices, gathered from the head's
    NATIVE per-level layout.

    Flat index order is (level, x, y, z, anchor) — ``grid_anchors`` /
    ``flatten_head_outputs``.  Each level gathers the K voxel rows
    (take_along_axis on the (B, V_l, A*D) view — merging only major axes,
    free) and selects the anchor with a (K, A) one-hot contraction; levels
    combine with masks.  This avoids materialising the (B, N_total, D)
    flatten+concat the loss path used to take (~2 ms of relayout copies at
    the train.sh shape — the delta concat splits the minor axis).
    """
    b, k = idx.shape
    a = anchors_per_loc
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    out = None
    for lvl, d in enumerate(deltas):
        d = d.reshape(b, -1, a * delta_dim)
        local = jnp.clip(idx - offsets[lvl], 0, int(counts[lvl]) - 1)
        vox = local // a
        anc = local % a
        row = jnp.take_along_axis(d, vox[..., None], axis=1)   # (B, K, A*D)
        row = row.reshape(b, k, a, delta_dim)
        onehot = jax.nn.one_hot(anc, a, dtype=row.dtype)
        val = jnp.einsum("bka,bkad->bkd", onehot, row)
        in_level = (idx >= offsets[lvl]) & (idx < offsets[lvl + 1])
        val = jnp.where(in_level[..., None], val, 0.0)
        out = val if out is None else out + val
    return out


def dynamic_padding_masks_levels(
    level_shapes: Sequence[Sequence[int]],
    strides: Sequence[Sequence[int]],
    anchors_per_loc: int,
    ori_sizes: jax.Array,
) -> list[jax.Array]:
    """Per-level (B, N_l) validity masks from per-scene original sizes.

    Anchor cells at index >= ceil(ori/stride) sit in zero-padding and are
    masked (reference ``anchor.py:124-152``).  ``ori_sizes``: (B, 3) int.
    """
    masks = []
    for shape, stride in zip(level_shapes, strides):
        limits = jnp.ceil(
            ori_sizes / jnp.asarray(stride, ori_sizes.dtype)
        ).astype(jnp.int32)  # (B, 3)
        axes = [np.arange(s) for s in shape]
        cell_ok = (
            (axes[0][None, :, None, None] < limits[:, 0, None, None, None])
            & (axes[1][None, None, :, None] < limits[:, 1, None, None, None])
            & (axes[2][None, None, None, :] < limits[:, 2, None, None, None])
        )  # (B, X, Y, Z)
        masks.append(
            jnp.repeat(cell_ok.reshape(ori_sizes.shape[0], -1), anchors_per_loc, axis=-1)
        )
    return masks


def dynamic_padding_masks(
    level_shapes: Sequence[Sequence[int]],
    strides: Sequence[Sequence[int]],
    anchors_per_loc: int,
    ori_sizes: jax.Array,
) -> jax.Array:
    """Concatenated (B, N_total) form of :func:`dynamic_padding_masks_levels`
    (the training path works on the flattened anchor axis)."""
    return jnp.concatenate(
        dynamic_padding_masks_levels(
            level_shapes, strides, anchors_per_loc, ori_sizes
        ),
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Training losses
# ---------------------------------------------------------------------------


def _rotated_iou_loss(pred: jax.Array, target: jax.Array, loss_type: str) -> jax.Array:
    """Reference ``RotatedIOULoss`` (``rpn.py:133-164``): iou/linear use the
    (+1)-smoothed volume ratio; giou/diou use the enclosing-box losses."""
    if loss_type in ("iou", "linear_iou"):
        ious, _, _, _, unions = iou_rotated_3d(pred, target, verbose=True)
        inter = ious * unions
        smooth_iou = (inter + 1.0) / (unions + 1.0)
        return -jnp.log(smooth_iou) if loss_type == "iou" else 1.0 - smooth_iou
    if loss_type == "giou":
        loss, _, _ = giou_rotated_3d(pred, target)
        return loss
    if loss_type == "diou":
        loss, _ = diou_rotated_3d(pred, target)
        return loss
    raise NotImplementedError(loss_type)


def rpn_losses(
    cfg: RPNConfig,
    key: jax.Array,
    objectness: jax.Array,      # (B, N)
    pred_deltas,                # (B, N, D), or per-level native head outputs
    anchors: jax.Array,         # (N, 6)
    gt_boxes: jax.Array,        # (B, G, 6|7), zero-padded
    gt_mask: jax.Array,         # (B, G) bool
    padding_mask: jax.Array | None = None,  # (B, N) bool
    max_mesh_dim: int = 160,
    level_counts: Sequence[int] | None = None,
    anchors_per_loc: int | None = None,
) -> dict[str, jax.Array]:
    """Batched RPN training losses (objectness BCE, 3D box reg, 2D proj).

    Only matching and sampling touch the full anchor axis; every loss term
    is computed on the K = ``cfg.batch_size_per_mesh`` SAMPLED rows gathered
    from the head outputs.  The reference (and the round-2 version of this
    function) ran encode/decode/reg over all N ~ 950k anchors and masked —
    a dozen full-(B, N, D) memory passes (plus two materialised
    (B, N, 6) anchor broadcasts) to use 256 rows; the gathered form is
    mathematically identical (masked sums over N = take-masked sums over
    the gathered K) and the backward is a 256-row scatter per tensor.
    """
    b, n = objectness.shape

    def assign_one(gt, mask, pad):
        gt_for_iou = obb2hbb_3d(gt) if cfg.rotated else gt
        iou = pairwise_iou_aabb(gt_for_iou, anchors)  # (G, N)
        if pad is not None:
            iou = jnp.where(pad[None, :], iou, -1.0)
        matches = match_anchors(
            iou, mask, cfg.fg_iou_thresh, cfg.bg_iou_thresh, allow_low_quality=True
        )
        if pad is not None:
            matches = jnp.where(pad, matches, -2)  # padded anchors -> ignore
        return matches

    pads = padding_mask if padding_mask is not None else jnp.ones((b, n), bool)
    matches = jax.vmap(assign_one)(gt_boxes, gt_mask, pads)

    pos_idx, pos_take, neg_idx, neg_take = sample_balanced_indices(
        key, matches, cfg.batch_size_per_mesh, cfg.positive_fraction
    )

    num_sampled = jnp.maximum(jnp.sum(pos_take) + jnp.sum(neg_take), 1.0)
    num_pos = jnp.maximum(jnp.sum(pos_take), 1.0)

    def rows(x, idx):
        """(B, N[, D]) -> (B, K[, D]) rows at idx."""
        if x.ndim == 2:
            return jnp.take_along_axis(x, idx, axis=1)
        return jnp.take_along_axis(x, idx[..., None], axis=1)

    # objectness BCE, mean over sampled anchors (sampled positives have
    # label 1 by construction, negatives 0)
    obj_pos = rows(objectness, pos_idx)
    obj_neg = rows(objectness, neg_idx)
    obj_loss = (
        jnp.sum(bce_with_logits(obj_pos, jnp.ones_like(obj_pos)) * pos_take)
        + jnp.sum(bce_with_logits(obj_neg, jnp.zeros_like(obj_neg)) * neg_take)
    ) / num_sampled

    # regression terms: gather the K positive rows, then encode/decode on
    # (B, K, ...) only.  matched gt via a small one-hot contraction (a
    # per-row gather serializes on TPU; (K, G) @ (G, 7) is exact — rows are
    # 1.0 * value — and fully vectorized).
    k_matches = rows(matches, pos_idx)                       # (B, K)
    onehot = jax.nn.one_hot(jnp.clip(k_matches, 0), gt_boxes.shape[1],
                            dtype=gt_boxes.dtype)            # (B, K, G)
    matched_gt = jnp.einsum("bkg,bgd->bkd", onehot, gt_boxes)
    k_anchors = jnp.take(anchors, pos_idx, axis=0)           # (B, K, 6)
    if isinstance(pred_deltas, (list, tuple)):
        # native per-level head outputs: gather the K rows level-wise, no
        # (B, N, D) flatten+concat ever materialises
        k_deltas = gather_delta_rows_levels(
            pred_deltas, pos_idx, level_counts, anchors_per_loc,
            cfg.delta_dim)
    else:
        k_deltas = rows(pred_deltas, pos_idx)                # (B, K, D)

    targets = cfg.encode(matched_gt, k_anchors)

    if cfg.reg_loss_type == "smooth_l1":
        reg = smooth_l1(k_deltas, targets, beta=1.0 / 9)
        reg_loss = jnp.sum(reg * pos_take[..., None]) / num_sampled
        proposals = None
    else:
        proposals = cfg.decode(k_deltas, k_anchors)
        per_box = _rotated_iou_loss(proposals, matched_gt, cfg.reg_loss_type)
        reg_loss = jnp.sum(per_box * pos_take) / num_sampled

    losses = {"loss_objectness": obj_loss, "loss_rpn_box_reg": reg_loss}

    if cfg.reg_loss_weight_2d > 0:
        k = pos_idx.shape[1]
        if proposals is None:
            proposals = cfg.decode(k_deltas, k_anchors)
        if cfg.rotated:
            pred_pts = obb2points_3d(proposals)       # (B, K, 2, 3)
            tgt_pts = obb2points_3d(matched_gt)
        else:
            pred_pts = proposals.reshape(b, k, 2, 3)  # (min corner, max corner)
            tgt_pts = matched_gt.reshape(b, k, 2, 3)
        pred_uv = project_points(pred_pts, max_mesh_dim)  # (B, K, 2, 4, 2)
        tgt_uv = project_points(tgt_pts, max_mesh_dim)
        l2d = smooth_l1(pred_uv, tgt_uv, beta=1.0 / 9)
        losses["loss_rpn_box_reg_2d"] = (
            jnp.sum(l2d * pos_take[..., None, None, None]) / num_pos / max_mesh_dim
        )
    else:
        losses["loss_rpn_box_reg_2d"] = jnp.zeros(())

    return losses


# ---------------------------------------------------------------------------
# Inference: decode + filter
# ---------------------------------------------------------------------------


def generate_proposals_levels(
    cfg: RPNConfig,
    objectness: Sequence[jax.Array],   # per level (B, N_l)
    pred_deltas: Sequence[jax.Array],  # per level (B, N_l, D) or (B, V_l, A*D)
    anchors: Sequence[jax.Array],      # per level (N_l, 6)
    mesh_size: Sequence[int],
    padding_masks: Sequence[jax.Array] | None = None,  # per level (B, N_l)
    training: bool = False,
):
    """Fixed-capacity proposal generation on per-level head outputs.

    Taking the UNconcatenated per-level tensors avoids materialising the
    (B, N_total, D) delta concat that the reference's flatten builds
    (``rpn.py:20-44``) — the bench trace showed ~1.7 ms of pure layout
    copies on that concat; the delta gather below touches only the per-level
    top-k survivors.

    ``pred_deltas`` may be given per level either flat (B, N_l, D) or in
    the head's NATIVE voxel-major layout (B, V_l, A*D) with V_l = N_l / A
    voxels and A anchors per location.  The flat form needs a (B, N_l, D)
    relayout copy upstream (~1 ms at the bench shape: the last axis of the
    head output splits across the row, trace ``reshape.64``/``copy.153``);
    the native form is a free reshape, and the anchor-within-voxel select
    happens here on the k survivors only (row gather + one-hot contraction
    — no serialized elementwise gather).

    Returns dict with boxes (B, K, 6|7), scores (B, K), level_idx (B, K),
    valid (B, K) — K = post_nms_top_n, score-sorted, masked entries at the
    end with score 0.
    """
    del training  # pre/post top-n are per-config here; pass a second cfg for train
    b = objectness[0].shape[0]
    n_levels = len(objectness)

    # per-level top-k (a stacked/vmapped radix across levels measured 3x
    # SLOWER — vmapped whiles/gathers lockstep badly,
    # benchmarks/microbench_topk.py), then decode only the survivors;
    # levels are PADDED to a common k so NMS can batch over (B, L) below
    k_list = [min(cfg.pre_nms_top_n, o.shape[1]) for o in objectness]
    kmax = max(k_list)
    boxes_l, scores_l = [], []
    for lvl, (obj, dl, anc) in enumerate(zip(objectness, pred_deltas, anchors)):
        s = jax.lax.stop_gradient(obj)
        if padding_masks is not None:
            s = jnp.where(padding_masks[lvl], s, NEG_INF)
        top_s, top_i = safe_top_k(s, k_list[lvl])  # (B, k_l)
        sel_anchors = anc[top_i]                              # (B, k_l, 6)
        if dl.shape[-1] == cfg.delta_dim:
            sel_deltas = jnp.take_along_axis(dl, top_i[..., None], axis=1)
        else:
            # native (B, V_l, A*D): flat anchor index i = vox * A + a
            a_per = dl.shape[-1] // cfg.delta_dim
            vox, a = top_i // a_per, top_i % a_per
            rows = jnp.take_along_axis(dl, vox[..., None], axis=1)
            rows = rows.reshape(b, -1, a_per, cfg.delta_dim)
            onehot = jax.nn.one_hot(a, a_per, dtype=rows.dtype)
            sel_deltas = jnp.einsum("bkad,bka->bkd", rows, onehot)
        bx = cfg.decode(sel_deltas, sel_anchors)
        pad = kmax - k_list[lvl]
        if pad:
            bx = jnp.pad(bx, ((0, 0), (0, pad), (0, 0)))
            top_s = jnp.pad(top_s, ((0, 0), (0, pad)),
                            constant_values=NEG_INF)
        boxes_l.append(bx)
        scores_l.append(top_s)

    boxes = jnp.stack(boxes_l, axis=1)          # (B, L, kmax, 6|7)
    raw_scores = jnp.stack(scores_l, axis=1)    # (B, L, kmax)
    levels = jnp.broadcast_to(
        jnp.arange(n_levels, dtype=jnp.int32)[None, :, None],
        raw_scores.shape)
    probs = jax.nn.sigmoid(raw_scores)

    grid = jnp.asarray(mesh_size, boxes.dtype)
    if cfg.rotated:
        valid = obb_center_valid_mask(boxes, grid)
    else:
        boxes = clip_boxes_to_grid(boxes, grid)
        valid = jnp.ones(boxes.shape[:3], bool)
    valid &= small_box_mask(boxes, cfg.min_size)
    valid &= probs >= cfg.score_thresh
    valid &= raw_scores > NEG_INF / 2  # padded-anchor / padded-slot sentinels

    # NMS batched over (scene, level): suppression is per-level by the
    # reference's batched-NMS category semantics, so L independent
    # kmax-sized problems replace one (L*kmax)^2 categorised problem —
    # 4x fewer pair IoUs at the bench shape.  nms_mask is vmap-safe (its
    # candidate rounds are a while_loop, not a both-branch lax.cond).
    d = boxes.shape[-1]
    keep = jax.vmap(
        lambda bx, sc, vd: nms_mask(bx, sc, vd, cfg.nms_thresh)
    )(boxes.reshape(b * n_levels, kmax, d),
      probs.reshape(b * n_levels, kmax),
      valid.reshape(b * n_levels, kmax))

    # final cap: top-k over the union of all levels' survivors
    masked = jnp.where(keep.reshape(b, n_levels, kmax), probs, NEG_INF)
    masked = masked.reshape(b, n_levels * kmax)
    k = min(cfg.post_nms_top_n, masked.shape[1])
    top_s, top_i = safe_top_k(masked, k)
    flat_boxes = boxes.reshape(b, n_levels * kmax, d)
    out_boxes = jnp.take_along_axis(flat_boxes, top_i[..., None], axis=1)
    out_levels = jnp.take_along_axis(
        levels.reshape(b, n_levels * kmax), top_i, axis=1)
    return {
        "boxes": out_boxes,
        "scores": jnp.clip(top_s, 0.0),
        "level_idx": out_levels,
        "valid": top_s > NEG_INF / 2,
    }


def generate_proposals(
    cfg: RPNConfig,
    objectness: jax.Array,          # (B, N)
    pred_deltas: jax.Array,         # (B, N, D)
    anchors: jax.Array,             # (N, 6)
    level_counts: Sequence[int],
    mesh_size: Sequence[int],
    padding_mask: jax.Array | None = None,
    training: bool = False,
):
    """Concatenated-input form of :func:`generate_proposals_levels` —
    splits (B, N_total) / (B, N_total, D) back into per-level slices."""
    obj_l, dl_l, anc_l, pad_l = [], [], [], []
    offset = 0
    for count in level_counts:
        obj_l.append(jax.lax.slice_in_dim(objectness, offset, offset + count, axis=1))
        dl_l.append(jax.lax.slice_in_dim(pred_deltas, offset, offset + count, axis=1))
        anc_l.append(jax.lax.slice_in_dim(anchors, offset, offset + count, axis=0))
        if padding_mask is not None:
            pad_l.append(
                jax.lax.slice_in_dim(padding_mask, offset, offset + count, axis=1))
        offset += count
    return generate_proposals_levels(
        cfg, obj_l, dl_l, anc_l, mesh_size,
        padding_masks=pad_l if padding_mask is not None else None,
        training=training,
    )


def voxel_objectness_scores(
    logits: Sequence[jax.Array],
) -> list[jax.Array]:
    """Per-level max-over-anchors objectness (B, X, Y, Z) — the voxel-score
    dump of reference ``output_objectness`` (``rpn.py:538-549``); cropping to
    original sizes and npz writing happen host-side."""
    out = []
    for l in logits:
        b = l.shape[0]
        out.append(l.reshape(*l.shape[:4], -1).max(axis=-1))
    return out
