"""End-to-end RPN pipeline tests on tiny grids: losses + proposal filtering."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_rpn_tpu.models.rpn import (
    RPNConfig,
    build_level_tables,
    flatten_head_outputs,
    dynamic_padding_masks,
    rpn_losses,
    generate_proposals,
)
from nerf_rpn_tpu.models import anchors as anchor_lib

MESH = (32, 32, 32)
LEVEL_SHAPES = [(8, 8, 8), (4, 4, 4)]
SIZES = ((8.0,), (16.0,))
RATIOS = (((1.0, 1.0, 1.0),), ((1.0, 1.0, 1.0),))


def make_cfg(**kw):
    return RPNConfig(
        anchor_sizes=SIZES,
        aspect_ratios=RATIOS,
        pre_nms_top_n=64,
        post_nms_top_n=32,
        **kw,
    )


def test_level_tables():
    cfg = make_cfg()
    anchors, level_ids, strides, counts = build_level_tables(cfg, MESH, LEVEL_SHAPES)
    assert counts == [512, 64]
    assert anchors.shape == (576, 6)
    assert strides == [(4, 4, 4), (8, 8, 8)]
    assert (level_ids[:512] == 0).all() and (level_ids[512:] == 1).all()


def test_flatten_order_matches_anchors():
    """Head output flattening must align with anchor flattening: a logit at
    (x, y, z, a) must pair with the anchor at the same grid position."""
    cfg = make_cfg()
    anchors, _, _, counts = build_level_tables(cfg, MESH, LEVEL_SHAPES)
    # mark one position: level 0, x=2, y=3, z=4, anchor 0
    logits0 = jnp.zeros((1, 8, 8, 8, 1)).at[0, 2, 3, 4, 0].set(9.0)
    logits1 = jnp.zeros((1, 4, 4, 4, 1))
    deltas = [jnp.zeros((1, 8, 8, 8, 6)), jnp.zeros((1, 4, 4, 4, 6))]
    flat_logits, _ = flatten_head_outputs([logits0, logits1], deltas, 6)
    idx = int(jnp.argmax(flat_logits[0]))
    got = anchors[idx]
    # anchor centre should be (2, 3, 4) * stride 4
    centre = (got[:3] + got[3:]) / 2
    np.testing.assert_allclose(centre, [8, 12, 16])


def test_dynamic_padding_masks():
    masks = dynamic_padding_masks(
        LEVEL_SHAPES, [(4, 4, 4), (8, 8, 8)], 1,
        jnp.asarray([[32, 32, 32], [16, 32, 32]]),
    )
    m = np.asarray(masks)
    assert m.shape == (2, 576)
    assert m[0].all()  # full-size scene: nothing masked
    lvl0 = m[1, :512].reshape(8, 8, 8)
    assert lvl0[:4].all() and not lvl0[4:].any()  # ceil(16/4)=4 cells valid


def _toy_inputs(rotated=False, b=2, seed=0):
    cfg = make_cfg(rotated=rotated)
    anchors, _, strides, counts = build_level_tables(cfg, MESH, LEVEL_SHAPES)
    n = anchors.shape[0]
    rng = np.random.default_rng(seed)
    objectness = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
    deltas = jnp.asarray(
        rng.normal(size=(b, n, cfg.delta_dim)).astype(np.float32) * 0.1
    )
    if rotated:
        gt = np.zeros((b, 3, 7), np.float32)
        gt[:, :, :3] = rng.uniform(8, 24, (b, 3, 3))
        gt[:, :, 3:6] = rng.uniform(6, 12, (b, 3, 3))
        gt[:, :, 6] = rng.uniform(-0.5, 0.5, (b, 3))
    else:
        lo = rng.uniform(2, 16, (b, 3, 3))
        sz = rng.uniform(6, 12, (b, 3, 3))
        gt = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    gt_mask = jnp.asarray([[True, True, False]] * b)
    return cfg, anchors, counts, objectness, deltas, jnp.asarray(gt), gt_mask


def test_rpn_losses_aabb():
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs()
    losses = rpn_losses(
        cfg, jax.random.PRNGKey(0), obj, deltas, jnp.asarray(anchors), gt, gt_mask
    )
    for k in ("loss_objectness", "loss_rpn_box_reg"):
        v = float(losses[k])
        assert np.isfinite(v) and v > 0, (k, v)


def test_rpn_losses_rotated_iou_and_2d():
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs(rotated=True)
    cfg = make_cfg(rotated=True, reg_loss_type="linear_iou", reg_loss_weight_2d=0.1)
    losses = rpn_losses(
        cfg, jax.random.PRNGKey(0), obj, deltas, jnp.asarray(anchors), gt, gt_mask,
        max_mesh_dim=32,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_rpn_box_reg_2d"]) > 0


def test_rpn_losses_grad_finite():
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs()

    def total(o, d):
        l = rpn_losses(cfg, jax.random.PRNGKey(0), o, d, jnp.asarray(anchors), gt, gt_mask)
        return l["loss_objectness"] + l["loss_rpn_box_reg"]

    go, gd = jax.grad(total, argnums=(0, 1))(obj, deltas)
    assert np.isfinite(np.asarray(go)).all()
    assert np.isfinite(np.asarray(gd)).all()
    assert np.abs(np.asarray(go)).max() > 0


def _rpn_losses_full_n(cfg, key, objectness, pred_deltas, anchors, gt_boxes,
                       gt_mask, padding_mask=None, max_mesh_dim=160):
    """The round-2 full-anchor masked formulation (encode/decode/reg over
    all N, loss masked): the oracle the gathered-row production path must
    reproduce."""
    from nerf_rpn_tpu.models.rpn import _rotated_iou_loss
    from nerf_rpn_tpu.ops.aabb import pairwise_iou_aabb
    from nerf_rpn_tpu.ops.obb import obb2hbb_3d, obb2points_3d
    from nerf_rpn_tpu.utils.losses import bce_with_logits, smooth_l1
    from nerf_rpn_tpu.utils.projection import project_points
    from nerf_rpn_tpu.utils.target_assign import (
        match_anchors,
        sample_balanced_batch,
    )

    b, n = objectness.shape

    def assign_one(gt, mask, pad):
        gt_for_iou = obb2hbb_3d(gt) if cfg.rotated else gt
        iou = pairwise_iou_aabb(gt_for_iou, anchors)
        iou = jnp.where(pad[None, :], iou, -1.0)
        matches = match_anchors(iou, mask, cfg.fg_iou_thresh,
                                cfg.bg_iou_thresh, allow_low_quality=True)
        matches = jnp.where(pad, matches, -2)
        onehot = jax.nn.one_hot(jnp.clip(matches, 0), gt.shape[0],
                                dtype=gt.dtype)
        return matches, onehot @ gt

    pads = padding_mask if padding_mask is not None else jnp.ones((b, n), bool)
    matches, matched_gt = jax.vmap(assign_one)(gt_boxes, gt_mask, pads)
    pos_mask, neg_mask = sample_balanced_batch(
        key, matches, cfg.batch_size_per_mesh, cfg.positive_fraction)
    sampled = pos_mask | neg_mask
    num_sampled = jnp.maximum(jnp.sum(sampled), 1.0)
    num_pos = jnp.maximum(jnp.sum(pos_mask), 1.0)
    labels = (matches >= 0).astype(objectness.dtype)
    obj_loss = jnp.sum(bce_with_logits(objectness, labels) * sampled) / num_sampled
    targets = cfg.encode(matched_gt, anchors[None].repeat(b, 0))
    if cfg.reg_loss_type == "smooth_l1":
        reg = smooth_l1(pred_deltas, targets, beta=1.0 / 9)
        reg_loss = jnp.sum(reg * pos_mask[..., None]) / num_sampled
        proposals = None
    else:
        proposals = cfg.decode(pred_deltas, anchors[None].repeat(b, 0))
        per_box = _rotated_iou_loss(proposals, matched_gt, cfg.reg_loss_type)
        reg_loss = jnp.sum(per_box * pos_mask) / num_sampled
    out = {"loss_objectness": obj_loss, "loss_rpn_box_reg": reg_loss}
    if cfg.reg_loss_weight_2d > 0:
        if proposals is None:
            proposals = cfg.decode(pred_deltas, anchors[None].repeat(b, 0))
        if cfg.rotated:
            pred_pts, tgt_pts = obb2points_3d(proposals), obb2points_3d(matched_gt)
        else:
            pred_pts = proposals.reshape(b, n, 2, 3)
            tgt_pts = matched_gt.reshape(b, n, 2, 3)
        l2d = smooth_l1(project_points(pred_pts, max_mesh_dim),
                        project_points(tgt_pts, max_mesh_dim), beta=1.0 / 9)
        out["loss_rpn_box_reg_2d"] = (
            jnp.sum(l2d * pos_mask[..., None, None, None]) / num_pos / max_mesh_dim)
    else:
        out["loss_rpn_box_reg_2d"] = jnp.zeros(())
    return out


def test_rpn_losses_gathered_matches_full_n():
    """The sampled-row loss must equal the full-anchor masked formulation
    (same key -> same sampled sets) for every reg-loss family, with and
    without padding masks."""
    for rotated, loss_type, w2d in (
        (False, "smooth_l1", 0.0),
        (False, "smooth_l1", 0.1),
        (True, "smooth_l1", 0.0),
        (True, "linear_iou", 0.1),
        (True, "diou", 0.0),
    ):
        cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs(
            rotated=rotated, seed=3)
        cfg = make_cfg(rotated=rotated, reg_loss_type=loss_type,
                       reg_loss_weight_2d=w2d)
        pad = dynamic_padding_masks(
            LEVEL_SHAPES, [(4, 4, 4), (8, 8, 8)], 1,
            jnp.asarray([[32, 32, 32], [20, 32, 24]]))
        for padding in (None, pad):
            key = jax.random.PRNGKey(7)
            got = rpn_losses(cfg, key, obj, deltas, jnp.asarray(anchors),
                             gt, gt_mask, padding_mask=padding,
                             max_mesh_dim=32)
            want = _rpn_losses_full_n(cfg, key, obj, deltas,
                                      jnp.asarray(anchors), gt, gt_mask,
                                      padding_mask=padding, max_mesh_dim=32)
            for k in want:
                np.testing.assert_allclose(
                    float(got[k]), float(want[k]), rtol=2e-5, atol=1e-6,
                    err_msg=f"{k} rotated={rotated} {loss_type} pad={padding is not None}")

            # per-level native-layout deltas (the train-step path): same key
            # -> identical losses again
            b = obj.shape[0]
            d = cfg.delta_dim
            offs = np.concatenate([[0], np.cumsum(counts)])
            deltas_levels = [
                deltas[:, offs[i]:offs[i + 1]].reshape(
                    b, *LEVEL_SHAPES[i], 1 * d)
                for i in range(len(LEVEL_SHAPES))
            ]
            got_l = rpn_losses(cfg, key, obj, deltas_levels,
                               jnp.asarray(anchors), gt, gt_mask,
                               padding_mask=padding, max_mesh_dim=32,
                               level_counts=counts, anchors_per_loc=1)
            for k in want:
                np.testing.assert_allclose(
                    float(got_l[k]), float(want[k]), rtol=2e-5, atol=1e-6,
                    err_msg=f"levels {k} rotated={rotated} {loss_type}")


def test_generate_proposals_shapes_and_masking():
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs()
    out = generate_proposals(
        cfg, obj, deltas, jnp.asarray(anchors), counts, MESH
    )
    assert out["boxes"].shape == (2, 32, 6)
    assert out["scores"].shape == (2, 32)
    assert out["valid"].shape == (2, 32)
    b = np.asarray(out["boxes"])
    v = np.asarray(out["valid"])
    s = np.asarray(out["scores"])
    assert v.any()
    # scores sorted desc within valid region
    for i in range(2):
        vs = s[i][v[i]]
        assert (np.diff(vs) <= 1e-6).all()
    # all valid boxes inside the mesh
    assert (b[v][:, :3] >= 0).all() and (b[v][:, 3:] <= 32).all()


def test_generate_proposals_rotated():
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs(rotated=True)
    out = generate_proposals(cfg, obj, deltas, jnp.asarray(anchors), counts, MESH)
    assert out["boxes"].shape == (2, 32, 7)
    v = np.asarray(out["valid"])
    ctr = np.asarray(out["boxes"])[..., :3]
    assert ((ctr[v] >= 0) & (ctr[v] <= 32)).all()


def test_generate_proposals_respects_padding_mask():
    """Anchors in padded voxels must never produce proposals."""
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs()
    strides = [(4, 4, 4), (8, 8, 8)]
    pad = dynamic_padding_masks(LEVEL_SHAPES, strides, 1,
                                jnp.asarray([[16, 32, 32], [32, 32, 32]]))
    out = generate_proposals(
        cfg, obj, deltas, jnp.asarray(anchors), counts, MESH, padding_mask=pad
    )
    v = np.asarray(out["valid"])[0]
    boxes = np.asarray(out["boxes"])[0]
    # every valid proposal of scene 0 comes from an anchor centred in x < 16
    centres = (boxes[v][:, 0] + boxes[v][:, 3]) / 2
    assert centres.max() <= 16 + 8  # anchor centre < ceil(16/4)*4, box may extend


def test_nms_dedups_identical_anchors():
    """Two anchors decoding to the same box: only one survives."""
    cfg, anchors, counts, obj, deltas, gt, gt_mask = _toy_inputs()
    # craft deltas so boxes all decode to anchor boxes; duplicates across
    # neighbouring positions share high IoU only if anchors overlap heavily
    out = generate_proposals(
        cfg, obj, jnp.zeros_like(deltas), jnp.asarray(anchors), counts, MESH
    )
    b = np.asarray(out["boxes"])[0]
    v = np.asarray(out["valid"])[0]
    kept = b[v]
    # pairwise IoU among kept level-0 boxes must be <= nms threshold
    lv = np.asarray(out["level_idx"])[0][v]
    from nerf_rpn_tpu.ops.aabb import pairwise_iou_aabb
    for lvl in np.unique(lv):
        sel = kept[lv == lvl]
        if len(sel) > 1:
            m = np.array(pairwise_iou_aabb(jnp.asarray(sel), jnp.asarray(sel)))
            np.fill_diagonal(m, 0)
            assert m.max() <= cfg.nms_thresh + 1e-5
