"""FCOS codec, target assignment, loss, and inference tests."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_rpn_tpu.models.fcos import (
    FCOSConfig,
    fcos_locations,
    flatten_fcos_outputs,
    fcos_padding_mask,
    fcos_targets_single,
    compute_centerness_targets,
    fcos_losses,
    fcos_inference,
)
from nerf_rpn_tpu.ops.fcos_box import (
    encode_fcos_aabb,
    decode_fcos_aabb,
    encode_fcos_obb,
    decode_fcos_obb,
)

LEVEL_SHAPES = [(8, 8, 8), (4, 4, 4)]
STRIDES = (4, 8)


def test_locations_table():
    loc, lvl, counts, stride_of, soi = fcos_locations(LEVEL_SHAPES, STRIDES)
    assert loc.shape == (512 + 64, 3)
    np.testing.assert_allclose(loc[0], [2, 2, 2])      # stride 4 // 2
    np.testing.assert_allclose(loc[512], [4, 4, 4])    # stride 8 // 2
    assert counts == [512, 64]
    assert (stride_of[:512] == 4).all() and (stride_of[512:] == 8).all()
    np.testing.assert_allclose(soi[0], [-1, 16])
    np.testing.assert_allclose(soi[512], [16, 32])


def test_fcos_aabb_codec_roundtrip(rng):
    loc = jnp.asarray(rng.uniform(5, 25, (16, 3)).astype(np.float32))
    lo = rng.uniform(0, 5, (16, 3))
    hi = rng.uniform(26, 32, (16, 3))
    boxes = jnp.asarray(np.concatenate([lo, hi], -1).astype(np.float32))
    reg = encode_fcos_aabb(loc, boxes)
    assert np.asarray(reg).min() > 0  # all locations inside
    rec = decode_fcos_aabb(loc, reg)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-4)


def test_fcos_obb_codec_roundtrip(rng):
    n = 32
    obbs = np.zeros((n, 7), np.float32)
    obbs[:, :2] = rng.uniform(14, 18, (n, 2))
    obbs[:, 2] = rng.uniform(14, 18, n)
    w = rng.uniform(6, 10, n)
    h = rng.uniform(3, 5, n)
    obbs[:, 3] = np.maximum(w, h)
    obbs[:, 4] = np.minimum(w, h)
    obbs[:, 5] = rng.uniform(4, 8, n)
    mag = rng.uniform(0.15, np.pi / 2 - 0.15, n)
    obbs[:, 6] = mag * rng.choice([-1.0, 1.0], n)
    loc = jnp.asarray(obbs[:, :3] + rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    reg = encode_fcos_obb(loc, jnp.asarray(obbs))
    rec = np.array(decode_fcos_obb(loc, reg))
    # codec symmetry: the same rectangle can decode with w/l swapped and
    # theta rotated by pi/2 — canonicalise to w >= l before comparing
    swap = rec[:, 3] < rec[:, 4]
    w = np.where(swap, rec[:, 4], rec[:, 3])
    l = np.where(swap, rec[:, 3], rec[:, 4])
    theta = np.where(swap, rec[:, 6] + np.pi / 2, rec[:, 6])
    np.testing.assert_allclose(rec[:, :3], obbs[:, :3], atol=0.05)
    np.testing.assert_allclose(w, obbs[:, 3], rtol=0.05, atol=0.1)
    np.testing.assert_allclose(l, obbs[:, 4], rtol=0.05, atol=0.1)
    np.testing.assert_allclose(rec[:, 5], obbs[:, 5], rtol=0.05, atol=0.1)
    dt = np.abs((theta - obbs[:, 6] + np.pi / 2) % np.pi - np.pi / 2)
    assert np.all(dt < 0.05), dt.max()


def test_fcos_obb_axis_aligned_fallback():
    """theta ~ 0 uses the AABB corner fallback; decode still recovers it."""
    obb = jnp.asarray([[16, 16, 16, 8, 4, 6, 0.0]], jnp.float32)
    loc = jnp.asarray([[15.0, 15.0, 15.0]])
    reg = encode_fcos_obb(loc, obb)
    rec = np.asarray(decode_fcos_obb(loc, reg))[0]
    np.testing.assert_allclose(rec[:3], [16, 16, 16], atol=1e-3)
    np.testing.assert_allclose(sorted(rec[3:5]), [4, 8], atol=0.02)


def test_centerness_targets():
    # perfectly centred -> 1; at the border -> 0
    reg = jnp.asarray([[2, 2, 2, 2, 2, 2], [0, 2, 2, 4, 2, 2]], jnp.float32)
    c = np.asarray(compute_centerness_targets(reg))
    np.testing.assert_allclose(c, [1.0, 0.0], atol=1e-6)


def _setup(rotated=False, b=2):
    cfg = FCOSConfig(rotated=rotated, fpn_strides=STRIDES,
                     pre_nms_top_n=64, fpn_post_nms_top_n=32)
    loc, lvl, counts, stride_of, soi = fcos_locations(LEVEL_SHAPES, STRIDES)
    l_total = loc.shape[0]
    rng = np.random.default_rng(0)
    cls = jnp.asarray(rng.normal(size=(b, l_total, 1)).astype(np.float32) - 2)
    reg_dim = cfg.reg_dim
    reg = jnp.asarray(np.abs(rng.normal(size=(b, l_total, reg_dim))).astype(np.float32))
    ctr = jnp.asarray(rng.normal(size=(b, l_total, 1)).astype(np.float32))
    if rotated:
        gt = np.zeros((b, 2, 7), np.float32)
        gt[:, :, :3] = rng.uniform(10, 22, (b, 2, 3))
        gt[:, :, 3] = rng.uniform(8, 12, (b, 2))
        gt[:, :, 4] = rng.uniform(4, 7, (b, 2))
        gt[:, :, 5] = rng.uniform(6, 10, (b, 2))
        gt[:, :, 6] = rng.uniform(0.2, 1.0, (b, 2))
    else:
        lo = rng.uniform(2, 14, (b, 2, 3))
        sz = rng.uniform(8, 14, (b, 2, 3))
        gt = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    gt_mask = jnp.asarray([[True, False]] * b)
    return cfg, loc, counts, stride_of, soi, cls, reg, ctr, jnp.asarray(gt), gt_mask


def test_targets_label_positive_inside_gt():
    cfg, loc, counts, stride_of, soi, cls, reg, ctr, gt, gt_mask = _setup()
    labels, tgts = fcos_targets_single(
        cfg, jnp.asarray(loc), jnp.asarray(stride_of), jnp.asarray(soi),
        gt[0], gt_mask[0],
    )
    labels = np.asarray(labels)
    assert labels.sum() > 0
    # all positive locations lie inside the (valid) gt box
    pos_locs = loc[labels > 0]
    g = np.asarray(gt[0][0])
    assert (pos_locs >= g[:3] - 1e-5).all() and (pos_locs <= g[3:] + 1e-5).all()
    # norm_reg_targets: targets at positives are stride-normalised, finite
    assert np.isfinite(np.asarray(tgts)[labels > 0]).all()


def test_targets_invalid_gt_ignored():
    cfg, loc, counts, stride_of, soi, *_ = _setup()
    # only an invalid gt -> no positives
    gt = jnp.asarray([[[4, 4, 4, 20, 20, 20]]], jnp.float32)
    labels, _ = fcos_targets_single(
        cfg, jnp.asarray(loc), jnp.asarray(stride_of), jnp.asarray(soi),
        gt[0], jnp.asarray([False]),
    )
    assert np.asarray(labels).sum() == 0


def test_fcos_losses_aabb_finite():
    cfg, loc, counts, stride_of, soi, cls, reg, ctr, gt, gt_mask = _setup()
    losses = fcos_losses(
        cfg, cls, reg, ctr, jnp.asarray(loc), jnp.asarray(stride_of),
        jnp.asarray(soi), gt, gt_mask,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_cls"]) > 0


def test_fcos_losses_obb_all_extras():
    cfg, loc, counts, stride_of, soi, cls, reg, ctr, gt, gt_mask = _setup(rotated=True)
    cfg = FCOSConfig(rotated=True, fpn_strides=STRIDES, iou_loss_type="linear_iou",
                     use_additional_l1_loss=True, proj2d_loss_weight=0.1,
                     pre_nms_top_n=64, fpn_post_nms_top_n=32)
    losses = fcos_losses(
        cfg, cls, reg, ctr, jnp.asarray(loc), jnp.asarray(stride_of),
        jnp.asarray(soi), gt, gt_mask,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_fcos_losses_grads():
    cfg, loc, counts, stride_of, soi, cls, reg, ctr, gt, gt_mask = _setup()

    def total(c, r, t):
        l = fcos_losses(cfg, c, r, t, jnp.asarray(loc), jnp.asarray(stride_of),
                        jnp.asarray(soi), gt, gt_mask)
        return l["loss_cls"] + l["loss_reg"] + l["loss_centerness"]

    grads = jax.grad(total, argnums=(0, 1, 2))(cls, reg, ctr)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_fcos_inference_shapes():
    cfg, loc, counts, stride_of, soi, cls, reg, ctr, gt, gt_mask = _setup()
    ori = jnp.asarray([[32, 32, 32], [32, 32, 32]])
    out = fcos_inference(cfg, cls, reg, ctr, jnp.asarray(loc), counts, ori)
    assert out["boxes"].shape == (2, 32, 6)
    assert out["valid"].shape == (2, 32)
    b, v = np.asarray(out["boxes"]), np.asarray(out["valid"])
    assert v.any()
    assert (b[v][:, :3] >= 0).all() and (b[v][:, 3:] <= 32).all()


def test_fcos_inference_padding_mask():
    cfg, loc, counts, stride_of, soi, cls, reg, ctr, gt, gt_mask = _setup()
    ori = jnp.asarray([[16, 32, 32], [32, 32, 32]])
    pad = fcos_padding_mask(loc, ori)
    out = fcos_inference(cfg, cls, reg, ctr, jnp.asarray(loc), counts, ori,
                         padding_mask=pad)
    v = np.asarray(out["valid"])[0]
    boxes = np.asarray(out["boxes"])[0]
    assert boxes[v][:, 0].max() <= 16.0 + 1e-5  # clipped to scene 0's x extent
