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
