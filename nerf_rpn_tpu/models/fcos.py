"""Anchor-free FCOS-over-NeRF pipeline: target assignment, losses, inference.

Parity targets:
- Target assignment <-> ``FCOSLossComputation`` (``model/fcos/loss.py``):
  per-level size-of-interest ranges [-1,16],[16,32],[32,64],[64,INF]
  (:270-275), center sampling with radius x stride clamped into the gt box
  (``get_sample_region`` :210-267), min-volume tie-break (:365-369), OBB
  targets via ``encode_fcos_obb`` per (location, gt) (:320-378).
- Losses <-> (:477-591): sigmoid focal (sum / num_pos_avg), IoU-family or
  smooth-L1 regression weighted by centerness targets and normalised by the
  all-reduced centerness sum, centerness BCE, optional extra L1 on midpoint
  offsets and 2D projection loss.  The reference's cross-GPU ``reduce_sum``
  becomes an optional ``axis_name`` psum.
- Inference <-> ``FCOSPostProcessor`` (``model/fcos/inference.py``):
  per-level sigmoid, padding mask to -1e5, candidate threshold + per-scene
  top-k, decode, remove-small, sqrt(cls * ctr) scores, cross-level
  single-class NMS capped at fpn_post_nms_top_n.

TPU re-design: gt boxes are mask-padded; the reference's per-gt python loop
(``loss.py:333``) becomes one broadcasted (L, G) computation; every stage is
a fixed-shape mask update; locations / level tables are trace-time numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.aabb import clip_boxes_to_grid, small_box_mask
from nerf_rpn_tpu.ops.fcos_box import (
    decode_fcos_aabb,
    decode_fcos_obb,
    encode_fcos_aabb,
    encode_fcos_obb,
)
from nerf_rpn_tpu.ops.nms import NEG_INF, nms_mask
from nerf_rpn_tpu.ops.topk import safe_top_k
from nerf_rpn_tpu.ops.obb import obb2points_3d
from nerf_rpn_tpu.ops.rotated_iou import box2corners
from nerf_rpn_tpu.models.rpn import _rotated_iou_loss
from nerf_rpn_tpu.utils.losses import (
    bce_with_logits,
    sigmoid_focal_loss,
    smooth_l1,
)
from nerf_rpn_tpu.utils.projection import project_points

INF = 1e8
SIZES_OF_INTEREST = ((-1.0, 16.0), (16.0, 32.0), (32.0, 64.0), (64.0, INF))


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    """Defaults = reference driver defaults (``run_fcos.py:100-133``)."""

    rotated: bool = False
    fpn_strides: tuple = (4, 8, 16, 32)
    center_sampling_radius: float = 1.5
    iou_loss_type: str = "iou"  # iou | linear_iou | giou | diou | smooth_l1
    norm_reg_targets: bool = True
    use_additional_l1_loss: bool = False
    proj2d_loss_weight: float = 0.0
    pre_nms_thresh: float = 0.0
    pre_nms_top_n: int = 2500
    nms_thresh: float = 0.3
    fpn_post_nms_top_n: int = 2500
    min_size: float = 0.0

    @property
    def reg_dim(self) -> int:
        return 8 if self.rotated else 6


# ---------------------------------------------------------------------------
# Static location tables
# ---------------------------------------------------------------------------


def fcos_locations(level_shapes: Sequence[Sequence[int]], strides: Sequence[int]):
    """Voxel-centre locations per level (reference ``compute_locations``,
    ``fcos.py:221-250``: ``stride * i + stride // 2``).

    Returns (locations (L_total, 3) f32, level_of_loc (L_total,) i32,
    counts list, stride_of_loc (L_total,) f32, soi (L_total, 2) f32).
    """
    locs, level_ids, counts = [], [], []
    for lvl, (shape, stride) in enumerate(zip(level_shapes, strides)):
        ax = [np.arange(s, dtype=np.float32) * stride + stride // 2 for s in shape]
        mx, my, mz = np.meshgrid(*ax, indexing="ij")
        pts = np.stack([mx, my, mz], axis=-1).reshape(-1, 3)
        locs.append(pts)
        counts.append(pts.shape[0])
        level_ids.append(np.full(pts.shape[0], lvl, np.int32))
    locations = np.concatenate(locs, 0)
    level_of_loc = np.concatenate(level_ids, 0)
    stride_of_loc = np.asarray(strides, np.float32)[level_of_loc]
    soi = np.asarray(SIZES_OF_INTEREST, np.float32)[
        np.clip(level_of_loc, 0, len(SIZES_OF_INTEREST) - 1)
    ]
    return locations, level_of_loc, counts, stride_of_loc, soi


def flatten_fcos_outputs(per_level: Sequence[jax.Array], ch: int) -> jax.Array:
    """Per-level (B, X, Y, Z, C) -> (B, L_total, C), (x, y, z) order."""
    b = per_level[0].shape[0]
    return jnp.concatenate([p.reshape(b, -1, ch) for p in per_level], axis=1)


def fcos_padding_mask(locations: np.ndarray, ori_sizes: jax.Array) -> jax.Array:
    """(B, L) True where the location sits inside the scene's original size
    (reference ``compute_padding_masks_per_level``, ``fcos.py:252-265``)."""
    loc = jnp.asarray(locations)
    return jnp.all(loc[None, :, :] < ori_sizes[:, None, :], axis=-1)


# ---------------------------------------------------------------------------
# Target assignment
# ---------------------------------------------------------------------------


def _sample_region_mask(
    aabbs: jax.Array,         # (G, 6)
    locations: jax.Array,     # (L, 3)
    stride_of_loc: jax.Array, # (L,)
    radius: float,
) -> jax.Array:
    """(L, G) center-sampling mask (reference ``get_sample_region``)."""
    ctr = (aabbs[:, 0:3] + aabbs[:, 3:6]) / 2  # (G, 3)
    r = (stride_of_loc * radius)[:, None, None]  # (L, 1, 1)
    lo = jnp.maximum(ctr[None] - r, aabbs[None, :, 0:3])  # (L, G, 3)
    hi = jnp.minimum(ctr[None] + r, aabbs[None, :, 3:6])
    near = locations[:, None, :] - lo
    far = hi - locations[:, None, :]
    return jnp.min(jnp.concatenate([near, far], axis=-1), axis=-1) > 0


def fcos_targets_single(
    cfg: FCOSConfig,
    locations: jax.Array,     # (L, 3)
    stride_of_loc: jax.Array, # (L,)
    soi: jax.Array,           # (L, 2)
    gt: jax.Array,            # (G, 6|7)
    gt_mask: jax.Array,       # (G,)
):
    """Labels (L,) float + reg targets (L, 6|8) for one scene."""
    if cfg.rotated:
        reg_all = encode_fcos_obb(
            locations[:, None, :].repeat(gt.shape[0], 1),
            jnp.broadcast_to(gt[None], (locations.shape[0], *gt.shape)),
        )  # (L, G, 8)
        proj = jnp.concatenate([gt[:, 0:2], gt[:, 3:5], gt[:, 6:7]], axis=-1)
        corners = box2corners(proj)  # (G, 4, 2)
        aabbs = jnp.concatenate(
            [
                jnp.min(corners, axis=1),
                gt[:, 2:3] - gt[:, 5:6] / 2,
                jnp.max(corners, axis=1),
                gt[:, 2:3] + gt[:, 5:6] / 2,
            ],
            axis=1,
        )
    else:
        reg_all = encode_fcos_aabb(locations[:, None, :], gt[None])  # (L, G, 6)
        aabbs = gt

    if cfg.center_sampling_radius > 0:
        in_boxes = _sample_region_mask(
            aabbs, locations, stride_of_loc, cfg.center_sampling_radius
        )
    else:
        in_boxes = jnp.min(reg_all[..., :6], axis=-1) > 0

    max_reg = jnp.max(reg_all[..., :6], axis=-1)  # (L, G)
    cared = (max_reg >= soi[:, 0:1]) & (max_reg <= soi[:, 1:2])

    volumes = jnp.prod(aabbs[:, 3:6] - aabbs[:, 0:3], axis=-1)  # (G,)
    area = jnp.broadcast_to(volumes[None], in_boxes.shape)
    area = jnp.where(in_boxes & cared & gt_mask[None], area, INF)
    min_area = jnp.min(area, axis=1)
    gt_idx = jnp.argmin(area, axis=1)

    labels = (min_area < INF).astype(jnp.float32)
    reg = jnp.take_along_axis(reg_all, gt_idx[:, None, None], axis=1)[:, 0]
    if cfg.norm_reg_targets:
        # one fusable per-channel multiply, NOT reg.at[..., :6].set(...):
        # the at/set lowered to a dynamic-update-slice writing a 6-wide
        # slab into the 8-wide minor axis at 2 GB/s (3.1 ms/step, r5 FCOS
        # trace).  Strides are powers of two so multiply-by-reciprocal is
        # bit-exact.
        chan_scaled = jnp.arange(reg.shape[-1]) < 6
        reg = reg * jnp.where(
            chan_scaled[None, :], 1.0 / stride_of_loc[:, None], 1.0)
    return labels, reg


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def _iou_loss_aabb_ref(pred: jax.Array, target: jax.Array, loss_type: str):
    """Reference ``IOULoss`` (``loss.py:77-132``): the (+1)-smoothed IoU on
    distance-encoded boxes; giou uses the 1e-7-stabilised enclosing box."""
    pv = jnp.prod(pred[..., 0:3] + pred[..., 3:6], axis=-1)
    tv = jnp.prod(target[..., 0:3] + target[..., 3:6], axis=-1)
    inter_dims = jnp.minimum(pred[..., 0:3], target[..., 0:3]) + jnp.minimum(
        pred[..., 3:6], target[..., 3:6]
    )
    enc_dims = jnp.maximum(pred[..., 0:3], target[..., 0:3]) + jnp.maximum(
        pred[..., 3:6], target[..., 3:6]
    )
    inter = jnp.prod(inter_dims, axis=-1)
    union = pv + tv - inter
    ious = (inter + 1.0) / (union + 1.0)
    if loss_type == "iou":
        return -jnp.log(ious)
    if loss_type == "linear_iou":
        return 1.0 - ious
    if loss_type == "giou":
        enc = jnp.prod(enc_dims, axis=-1) + 1e-7
        gious = ious - (enc - union) / enc
        return 1.0 - gious
    raise NotImplementedError(loss_type)


def _rotated_loss_from_reg(pred: jax.Array, target: jax.Array, loss_type: str):
    """Reference fcos ``RotatedIOULoss`` (``loss.py:135-171``): decode both
    reg vectors at a dummy origin location, then rotated-IoU loss."""
    dummy = jnp.zeros(pred.shape[:-1] + (3,), pred.dtype)
    pred_boxes = decode_fcos_obb(dummy, pred)
    target_boxes = decode_fcos_obb(dummy, target)
    return _rotated_iou_loss(pred_boxes, target_boxes, loss_type)


def compute_centerness_targets(reg: jax.Array) -> jax.Array:
    """sqrt(prod over axes of min/max distance) (reference ``loss.py:438-445``)."""
    lr = reg[..., (0, 3)]
    tb = reg[..., (1, 4)]
    fb = reg[..., (2, 5)]
    c = (
        (jnp.min(lr, -1) / jnp.max(lr, -1))
        * (jnp.min(tb, -1) / jnp.max(tb, -1))
        * (jnp.min(fb, -1) / jnp.max(fb, -1))
    )
    # clip: at non-positive locations distances can be negative; the result
    # there is masked out by the caller, but sqrt(neg) would poison grads
    return jnp.sqrt(jnp.clip(c, 0.0))


def fcos_losses(
    cfg: FCOSConfig,
    cls_logits: jax.Array,    # (B, L, 1)
    box_reg: jax.Array,       # (B, L, 6|8)
    centerness: jax.Array,    # (B, L, 1)
    locations: jax.Array,     # (L, 3)
    stride_of_loc: jax.Array,
    soi: jax.Array,
    gt: jax.Array,            # (B, G, 6|7)
    gt_mask: jax.Array,       # (B, G)
    padding_mask: jax.Array | None = None,  # (B, L)
    axis_name: str | None = None,
) -> dict[str, jax.Array]:
    b, l_total = cls_logits.shape[:2]
    labels, reg_targets = jax.vmap(
        lambda g, m: fcos_targets_single(cfg, locations, stride_of_loc, soi, g, m)
    )(gt, gt_mask)

    valid = (
        padding_mask
        if padding_mask is not None
        else jnp.ones((b, l_total), bool)
    )
    pos = (labels > 0) & valid

    def reduce_mean(x):
        """Cross-device mean (the reference's reduce_sum / num_gpus)."""
        return jax.lax.pmean(x, axis_name) if axis_name else x

    num_pos_avg = jnp.maximum(reduce_mean(jnp.sum(pos.astype(jnp.float32))), 1.0)

    cls = cls_logits[..., 0]
    cls_loss = (
        jnp.sum(sigmoid_focal_loss(cls, labels) * valid) / num_pos_avg
    )

    # The reg/centerness losses only see POSITIVE locations (the reference
    # indexes pos_inds, ``loss.py:527-536``), but the center-sampled
    # positive count is tiny (<= ~128 per GT: a 3-stride-wide region at
    # stride spacing over <= 2 soi-compatible levels) while the dense
    # masked form ran the rotated-IoU polygon clip + its VJP over all
    # B x 146k locations — ~23 ms/step of loop fusions in the r5 trace.
    # Gather the positives to a fixed capacity K first (same trick as
    # rpn_losses' K=256 sampled rows); exact as long as n_pos <= K, which
    # the center-sampling geometry guarantees.  radius == 0 keeps the
    # dense path (positives = all in-box locations, unbounded).
    k_pos = 0
    if cfg.center_sampling_radius > 0:
        k_pos = min(l_total, 128 * gt.shape[1])
    if 0 < k_pos < l_total:
        # plain lax.top_k: at L~73k it lowers to one sort (~0.1 ms); the
        # radix select in ops/topk costs ~3.5 ms of DUS writes here and
        # the tunnel-AOT SIGABRT it works around only bites at axes>=500k
        _, idx = jax.lax.top_k(pos.astype(jnp.float32), k_pos)  # (B, K)
        pos = jnp.take_along_axis(pos, idx, axis=1)
        box_reg = jnp.take_along_axis(
            box_reg, idx[..., None], axis=1)
        reg_targets = jnp.take_along_axis(
            reg_targets, idx[..., None], axis=1)
        centerness = jnp.take_along_axis(centerness, idx[..., None], axis=1)

    ctr_targets = compute_centerness_targets(reg_targets)
    ctr_targets = jnp.where(pos, ctr_targets, 0.0)
    sum_ctr_avg = jnp.maximum(reduce_mean(jnp.sum(ctr_targets)), 1e-6)

    posf = pos.astype(jnp.float32)
    # sanitise non-positive rows BEFORE the loss: their values are masked out
    # of the sum anyway, but -log / decode on garbage would produce NaNs that
    # survive multiplication by zero.  The OBB safe row must decode to a
    # NON-degenerate box (alpha = beta = +1 collapses one side to zero and
    # 0/0-poisons the rotated IoU), hence the 0.25 midpoint offsets.
    if cfg.rotated:
        safe_row = jnp.asarray([1, 1, 1, 1, 1, 1, 0.25, -0.25], box_reg.dtype)
    else:
        safe_row = jnp.ones((6,), box_reg.dtype)
    safe_pred = jnp.where(pos[..., None], box_reg, safe_row)
    safe_tgt = jnp.where(pos[..., None], reg_targets, safe_row)
    if cfg.iou_loss_type == "smooth_l1":
        per = smooth_l1(safe_pred, safe_tgt, beta=1.0)  # (B, L, D)
        reg_loss = jnp.sum(per * (ctr_targets * posf)[..., None]) / sum_ctr_avg
    elif cfg.rotated:
        per = _rotated_loss_from_reg(safe_pred, safe_tgt, cfg.iou_loss_type)
        reg_loss = jnp.sum(per * ctr_targets * posf) / sum_ctr_avg
    else:
        per = _iou_loss_aabb_ref(safe_pred, safe_tgt, cfg.iou_loss_type)
        reg_loss = jnp.sum(per * ctr_targets * posf) / sum_ctr_avg

    if cfg.rotated and cfg.use_additional_l1_loss and cfg.iou_loss_type != "smooth_l1":
        extra = smooth_l1(safe_pred[..., 6:], safe_tgt[..., 6:], beta=1.0)
        reg_loss = reg_loss + jnp.sum(
            extra * (ctr_targets * posf)[..., None]
        ) / sum_ctr_avg

    if cfg.rotated and cfg.proj2d_loss_weight > 0:
        dummy = jnp.zeros(box_reg.shape[:-1] + (3,), box_reg.dtype)
        pred_pts = obb2points_3d(decode_fcos_obb(dummy, safe_pred))    # (B, L, 2, 3)
        tgt_pts = obb2points_3d(decode_fcos_obb(dummy, safe_tgt))
        pred_uv = project_points(pred_pts, 160)  # (B, L, 2, 4, 2)
        tgt_uv = project_points(tgt_pts, 160)
        l2d = smooth_l1(pred_uv, tgt_uv, beta=1.0 / 9) / 160.0
        # reference: sum(loss * w) / (factor * 2) with factor = 8 point-rows
        w = (ctr_targets * posf)[..., None, None, None]
        proj2d = jnp.sum(l2d * w) / (8.0 * 2.0) / sum_ctr_avg
        reg_loss = reg_loss + proj2d * cfg.proj2d_loss_weight

    ctr_loss = (
        jnp.sum(bce_with_logits(centerness[..., 0], ctr_targets) * posf)
        / num_pos_avg
    )

    return {
        "loss_cls": cls_loss,
        "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
    }


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


def fcos_inference(
    cfg: FCOSConfig,
    cls_logits: jax.Array,   # (B, L, 1)
    box_reg: jax.Array,      # (B, L, 6|8)  (already stride-scaled by the head)
    centerness: jax.Array,   # (B, L, 1)
    locations: jax.Array,    # (L, 3)
    level_counts: Sequence[int],
    ori_sizes: jax.Array,    # (B, 3)
    padding_mask: jax.Array | None = None,
):
    """Fixed-capacity FCOS proposal generation.

    Returns dict: boxes (B, K, 6|7), scores (B, K), level_idx (B, K),
    valid (B, K), K = fpn_post_nms_top_n.
    """
    b = cls_logits.shape[0]
    scores = jax.nn.sigmoid(cls_logits[..., 0])
    if padding_mask is not None:
        scores = jnp.where(padding_mask, scores, -1e5)
    ctr = jax.nn.sigmoid(centerness[..., 0])
    combined = scores * ctr

    boxes_l, scores_l, valid_l, levels_l = [], [], [], []
    offset = 0
    for lvl, count in enumerate(level_counts):
        k = min(cfg.pre_nms_top_n, count)
        s = jax.lax.slice_in_dim(scores, offset, offset + count, axis=1)
        cmb = jax.lax.slice_in_dim(combined, offset, offset + count, axis=1)
        reg = jax.lax.slice_in_dim(box_reg, offset, offset + count, axis=1)
        loc = jax.lax.slice_in_dim(locations, offset, offset + count, axis=0)

        candidate = s > cfg.pre_nms_thresh
        masked = jnp.where(candidate, cmb, NEG_INF)
        top_s, top_i = safe_top_k(masked, k)          # (B, k)
        sel_reg = jnp.take_along_axis(reg, top_i[..., None], axis=1)
        sel_loc = loc[top_i]                              # (B, k, 3)

        if cfg.rotated:
            det = decode_fcos_obb(sel_loc, sel_reg)
        else:
            det = decode_fcos_aabb(sel_loc, sel_reg)
            det = clip_boxes_to_grid(det, ori_sizes[:, None, :].astype(det.dtype))
        ok = top_s > NEG_INF / 2
        ok &= small_box_mask(det, cfg.min_size)
        boxes_l.append(det)
        scores_l.append(jnp.sqrt(jnp.clip(top_s, 0.0)))
        valid_l.append(ok)
        levels_l.append(jnp.full((b, k), lvl, jnp.int32))
        offset += count

    boxes = jnp.concatenate(boxes_l, 1)
    scs = jnp.concatenate(scores_l, 1)
    valid = jnp.concatenate(valid_l, 1)
    levels = jnp.concatenate(levels_l, 1)

    def nms_one(bx, sc, vd, lv):
        keep = nms_mask(bx, sc, vd, cfg.nms_thresh)  # cross-level, single class
        masked = jnp.where(keep, sc, NEG_INF)
        k = min(cfg.fpn_post_nms_top_n, masked.shape[0])
        top_s, top_i = safe_top_k(masked, k)
        return bx[top_i], jnp.clip(top_s, 0.0), lv[top_i], top_s > NEG_INF / 2

    # vmap keeps the batch axis parallel (and mesh-shardable in the CLI's
    # data-parallel eval); nms_mask is vmap-safe — its candidate rounds are
    # a while_loop, not a lax.cond that vmap would both-branch.
    out_boxes, out_scores, out_levels, out_valid = jax.vmap(nms_one)(
        boxes, scs, valid, levels
    )
    return {
        "boxes": out_boxes,
        "scores": out_scores,
        "level_idx": out_levels,
        "valid": out_valid,
    }


def fcos_voxel_scores(cls_logits, centerness):
    """Per-level sqrt(sigmoid(cls) * sigmoid(ctr)) voxel-score volumes
    (reference ``output_objectness``, ``fcos.py:267-279``)."""
    return [
        jnp.sqrt(jax.nn.sigmoid(c[..., 0]) * jax.nn.sigmoid(t[..., 0]))
        for c, t in zip(cls_logits, centerness)
    ]
