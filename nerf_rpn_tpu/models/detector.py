"""RCNN second stage: RoI sampling, pooled-feature head, objectness losses.

Parity targets (reference ``model/detector.py``):
- ``sample_rois`` <-> ``ProposalTargetLayer`` (:12-167): IoU-match RoIs to
  gt, sample fg (max_iou >= fg_threshold) at fg_fraction and fill the rest
  with bg (max_iou < bg_threshold, WITH replacement when scarce — same as
  the reference's rand-index fill); the non-sampling path labels every RoI.
- ``RCNNHead`` <-> ``RCNN`` (:441-496): optional 2 x conv3 tower, flatten or
  mean-pool, linear bbox (6|7) + linear 2-class score.
- ``rcnn_losses`` <-> ``Classification_Model.compute_loss`` (:536-559):
  cross-entropy objectness + smooth-L1 (beta=1/9) on fg deltas / #fg.
- decode via the AABB / Rotated coder (``Classification_Model`` :561-626).

TPU re-design: fixed-size sampling with masks; RoI features come from
``ops.roi_align.multilevel_roi_align`` (no per-roi python loops, no CUDA).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.ops import coders
from nerf_rpn_tpu.ops.nms import pairwise_iou_chunked
from nerf_rpn_tpu.ops.obb import obb2hbb_3d
from nerf_rpn_tpu.utils.losses import smooth_l1

normal_init = nn.initializers.normal(stddev=0.01)


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    """Defaults = reference driver defaults (``run_rpn_detect.py:108-133``)."""

    rotated: bool = False
    batch_size: int = 1000         # sampled rois per batch
    fg_fraction: float = 0.5
    fg_threshold: float = 0.35
    bg_threshold: float = 0.15
    output_size: tuple = (4, 4, 4)
    enlarge_scale: float = 0.2
    sampling_ratio: int = 2
    pool_mode: str = "avg"         # 'avg' (align) | 'max' (pooling parity)
    remap_levels: bool = False
    canonical_scale: int = 160
    canonical_level: int = 4

    @property
    def box_dim(self) -> int:
        return 7 if self.rotated else 6

    def encode(self, gt, rois):
        if self.rotated:
            return coders.encode_rotated(gt, rois)
        return coders.encode_aabb(gt, rois)

    def decode(self, deltas, rois):
        if self.rotated:
            return coders.decode_rotated(deltas, rois)
        return coders.decode_aabb(deltas, rois)


def match_rois_to_gt(cfg: RCNNConfig, rois: jax.Array, roi_valid: jax.Array,
                     gt: jax.Array, gt_mask: jax.Array):
    """Per-scene IoU matching.  Returns (max_iou (R,), assignment (R,))."""
    if cfg.rotated:
        iou = pairwise_iou_chunked(obb2hbb_3d(rois), obb2hbb_3d(gt))
    else:
        iou = pairwise_iou_chunked(rois, gt)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    iou = jnp.where(roi_valid[:, None], iou, -1.0)
    return jnp.max(iou, axis=1), jnp.argmax(iou, axis=1)


def sample_rois(
    cfg: RCNNConfig,
    key: jax.Array,
    rois: jax.Array,          # (R, 6|7)
    roi_levels: jax.Array,    # (R,)
    roi_valid: jax.Array,     # (R,)
    gt: jax.Array,            # (G, 6|7)
    gt_mask: jax.Array,       # (G,)
    rois_per_image: int,
):
    """Fixed-size fg/bg RoI sampling for one scene.

    Returns dict with (rois_per_image,)-shaped: boxes, levels, labels
    (1 fg / 0 bg), matched_gt, valid.
    """
    max_iou, assign = match_rois_to_gt(cfg, rois, roi_valid, gt, gt_mask)
    is_fg = (max_iou >= cfg.fg_threshold) & roi_valid
    is_bg = (max_iou < cfg.bg_threshold) & roi_valid

    n_fg_avail = jnp.sum(is_fg)
    n_bg_avail = jnp.sum(is_bg)
    fg_budget = max(int(round(cfg.fg_fraction * rois_per_image)), 1)
    n_fg = jnp.minimum(n_fg_avail, fg_budget)
    # no bg available -> fill everything with fg (reference detector.py:120)
    n_fg = jnp.where(n_bg_avail == 0,
                     jnp.minimum(n_fg_avail, rois_per_image), n_fg)

    kf, kb = jax.random.split(key)
    # random-priority compaction: fg_order lists fg roi indices first (in
    # random order), bg_order likewise for bg
    fg_prio = jnp.where(is_fg, jax.random.uniform(kf, is_fg.shape), jnp.inf)
    fg_order = jnp.argsort(fg_prio)
    bg_prio = jnp.where(is_bg, jax.random.uniform(kb, is_bg.shape), jnp.inf)
    bg_order = jnp.argsort(bg_prio)

    slots = jnp.arange(rois_per_image)
    take_fg = slots < n_fg
    # cycle within the available pool = sampling with replacement when
    # scarce (the reference's rand-index fill)
    fg_slot = slots % jnp.maximum(n_fg_avail, 1)
    bg_slot = (slots - n_fg) % jnp.maximum(n_bg_avail, 1)
    idx = jnp.where(take_fg, fg_order[fg_slot], bg_order[bg_slot])
    valid = jnp.where(take_fg, n_fg_avail > 0, n_bg_avail > 0)

    return {
        "boxes": rois[idx],
        "levels": roi_levels[idx],
        "labels": (take_fg & valid).astype(jnp.float32),
        "matched_gt": gt[jnp.clip(assign[idx], 0)],
        "valid": valid,
        "indices": idx,
    }


def label_all_rois(cfg: RCNNConfig, rois, roi_valid, gt, gt_mask):
    """Non-sampling path: binary label + matched gt for every RoI
    (reference ``detector.py:150-166``)."""
    max_iou, assign = match_rois_to_gt(cfg, rois, roi_valid, gt, gt_mask)
    labels = ((max_iou >= cfg.fg_threshold) & roi_valid).astype(jnp.float32)
    return labels, gt[jnp.clip(assign, 0)]


class RCNNHead(nn.Module):
    """Pooled RoI features -> (bbox deltas, 2-class scores)."""

    in_channels: int = 256
    n_classes: int = 2
    rotated: bool = False
    add_conv_layers: bool = False
    flatten: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: (R, ox, oy, oz, C) -> ((R, 6|7), (R, n_classes))."""
        if self.add_conv_layers:
            for d in range(2):
                x = nn.Conv(self.in_channels, (3, 3, 3), padding=1,
                            kernel_init=normal_init, dtype=self.dtype,
                            name=f"conv_{d}")(x)
                x = nn.relu(x)
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
        else:
            x = x.mean(axis=(1, 2, 3))
        reg_dim = 7 if self.rotated else 6
        deltas = nn.Dense(reg_dim, kernel_init=normal_init, dtype=self.dtype,
                          name="bbox_pred")(x)
        scores = nn.Dense(self.n_classes, kernel_init=normal_init,
                          dtype=self.dtype, name="cls_score")(x)
        return deltas, scores


def rcnn_losses(
    cfg: RCNNConfig,
    pred_deltas: jax.Array,   # (N, D)
    pred_scores: jax.Array,   # (N, 2)
    labels: jax.Array,        # (N,) float 0/1
    matched_gt: jax.Array,    # (N, D)
    rois: jax.Array,          # (N, D)
    valid: jax.Array,         # (N,)
):
    """CE objectness + smooth-L1 on fg deltas (reference
    ``compute_loss``, ``detector.py:536-559``)."""
    logp = jax.nn.log_softmax(pred_scores, axis=-1)
    lab = labels.astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
    vf = valid.astype(ce.dtype)
    obj_loss = jnp.sum(ce * vf) / jnp.maximum(jnp.sum(vf), 1.0)

    fg = (labels > 0) & valid
    # sanitise non-fg rows: encode on zero-size gt would produce log(0)
    safe_gt = jnp.where(fg[:, None], matched_gt, rois)
    targets = cfg.encode(safe_gt, rois)
    reg = smooth_l1(pred_deltas, targets, beta=1.0 / 9)
    n_fg = jnp.sum(fg)
    box_loss = jnp.where(
        n_fg > 0,
        jnp.sum(reg * fg[:, None]) / jnp.maximum(n_fg, 1),
        0.0,
    )
    return {"loss_objectness": obj_loss, "loss_rpn_box_reg": box_loss}


def filter_refined_proposals(
    cfg: RCNNConfig,
    boxes: jax.Array,       # (R, D) refined boxes
    probs: jax.Array,       # (R, 2) softmax objectness
    valid: jax.Array,       # (R,) bool
    mesh_size: jax.Array,   # (3,) float/int grid extent
    score_threshold: float,
    nms_threshold: float,
    num_threshold: int,
    min_size: float = 1e-3,
):
    """Stage-2 eval-time proposal filtering (reference ``filter_proposals``,
    ``run_rpn_detect.py:403-439``): clip -> remove-small -> score threshold
    -> NMS -> score-descending cap.  Returns (boxes, keep, rank) where
    ``keep`` is the post-NMS validity mask (original order) and ``rank``
    orders kept rows by descending fg score with the ``num_threshold`` cap
    applied (invalid slots ranked last).

    Deliberate deviations from the reference, documented:
    - OBB clip: the reference filters boxes by center validity but forgets
      to filter scores/labels alongside (misalignment); we apply the mask
      consistently.
    - Score threshold: the reference's ``torch.where(scores >= t)[0]`` on
      the (N, 2) softmax keeps rows where EITHER column passes and
      duplicates rows where both do; duplicates are identical boxes that
      NMS immediately re-suppresses, so a row mask (any column >= t) yields
      the same final set for any nms_threshold < 1.
    - ``num_threshold`` cap: the reference accepts ``--filter_num_threhold``
      and comments "keep only topk scoring predictions" but never applies
      it (``run_rpn_detect.py:430-433``); we implement the evident intent
      (cap kept proposals at num_threshold by descending score).
    """
    from nerf_rpn_tpu.ops.aabb import (
        clip_boxes_to_grid,
        obb_center_valid_mask,
        small_box_mask,
    )
    from nerf_rpn_tpu.ops.nms import nms_mask

    mesh_size = jnp.asarray(mesh_size, boxes.dtype)
    if cfg.rotated:
        valid = valid & obb_center_valid_mask(boxes, mesh_size)
    else:
        boxes = clip_boxes_to_grid(boxes, mesh_size)
    valid = valid & small_box_mask(boxes, min_size)
    valid = valid & jnp.any(probs >= score_threshold, axis=-1)
    fg = probs[:, 1]
    keep = nms_mask(boxes[:, : cfg.box_dim], fg, valid, nms_threshold)
    # score-descending order over kept rows, capped at num_threshold
    order = jnp.argsort(jnp.where(keep, -fg, jnp.inf))
    capped = jnp.arange(boxes.shape[0]) < num_threshold
    keep = keep & capped[jnp.argsort(order)]
    return boxes, keep, order
