"""Stage-2 eval-time proposal filtering + fine-tune augmentation.

Parity targets: reference ``filter_proposals`` (``run_rpn_detect.py:403-439``)
and the fine-tune joint grid+boxes augmentation
(``datasets.py:410-426``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nerf_rpn_tpu.models.detector import RCNNConfig, filter_refined_proposals


def _iou_aabb(a, b):
    lo = np.maximum(a[:3], b[:3])
    hi = np.minimum(a[3:6], b[3:6])
    inter = np.prod(np.clip(hi - lo, 0, None))
    va = np.prod(a[3:6] - a[:3])
    vb = np.prod(b[3:6] - b[:3])
    return inter / max(va + vb - inter, 1e-9)


def _oracle_filter(boxes, probs, mesh, score_thr, nms_thr, cap, min_size=1e-3):
    """Reference semantics (AABB): clip -> remove-small -> row where ANY
    softmax column >= thr (the reference's torch.where(scores >= t)[0],
    whose duplicate rows are equivalent under NMS) -> greedy NMS on fg score
    -> descending-score cap."""
    boxes = boxes.copy()
    boxes[:, :3] = np.clip(boxes[:, :3], 0, mesh)
    boxes[:, 3:6] = np.clip(boxes[:, 3:6], 0, mesh)
    alive = np.all(boxes[:, 3:6] - boxes[:, :3] >= min_size, axis=1)
    alive &= np.any(probs >= score_thr, axis=1)
    fg = probs[:, 1]
    order = np.argsort(-fg)
    kept = []
    for i in order:
        if not alive[i]:
            continue
        if any(_iou_aabb(boxes[i], boxes[j]) > nms_thr for j in kept):
            continue
        kept.append(i)
    kept = sorted(kept, key=lambda i: -fg[i])[:cap]
    return boxes, kept


@pytest.mark.parametrize("score_thr,nms_thr,cap", [
    (0.5, 0.3, 100), (0.8, 0.1, 100), (0.5, 0.25, 5),
])
def test_filter_refined_proposals_vs_oracle(score_thr, nms_thr, cap):
    rng = np.random.default_rng(3)
    n = 64
    lo = rng.uniform(-4, 24, (n, 3))
    size = rng.uniform(0.5, 14, (n, 3))
    boxes = np.concatenate([lo, lo + size], 1).astype(np.float32)
    fg = rng.permutation(n).astype(np.float32) / n  # distinct scores
    probs = np.stack([1 - fg, fg], 1)
    valid = np.ones(n, bool)
    valid[-4:] = False
    mesh = np.asarray([30.0, 28.0, 26.0], np.float32)

    cfg = RCNNConfig(rotated=False)
    fb, keep, order = filter_refined_proposals(
        cfg, jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid),
        jnp.asarray(mesh), score_thr, nms_thr, cap)
    fb, keep, order = np.asarray(fb), np.asarray(keep), np.asarray(order)

    oracle_boxes, oracle_keep = _oracle_filter(
        boxes[:-4], probs[:-4], mesh, score_thr, nms_thr, cap)
    got = sorted(np.nonzero(keep)[0].tolist())
    assert got == sorted(oracle_keep)
    np.testing.assert_allclose(fb[:-4], oracle_boxes, atol=1e-5)
    # ranked order = descending fg score over kept rows
    ranked = order[keep[order]]
    assert list(ranked) == sorted(got, key=lambda i: -probs[i, 1])


def test_filter_refined_proposals_rotated_axis_aligned():
    """theta=0 OBBs must reproduce the AABB oracle (rotated IoU == AABB IoU)
    with the OBB clip realised as a centre-validity mask."""
    rng = np.random.default_rng(5)
    n = 48
    ctr = rng.uniform(-2, 30, (n, 3))
    size = rng.uniform(1, 10, (n, 3))
    obb = np.concatenate([ctr, size, np.zeros((n, 1))], 1).astype(np.float32)
    fg = rng.permutation(n).astype(np.float32) / n
    probs = np.stack([1 - fg, fg], 1)
    mesh = np.asarray([28.0, 28.0, 28.0], np.float32)

    cfg = RCNNConfig(rotated=True)
    fb, keep, order = filter_refined_proposals(
        cfg, jnp.asarray(obb), jnp.asarray(probs),
        jnp.ones(n, bool), jnp.asarray(mesh), 0.5, 0.25, 100)
    keep = np.asarray(keep)

    # oracle: centre-validity instead of clip, then greedy NMS on corners
    inside = np.all((ctr >= 0) & (ctr <= mesh), axis=1)
    corners = np.concatenate([ctr - size / 2, ctr + size / 2], 1)
    alive = inside & np.any(probs >= 0.5, axis=1)
    kept = []
    for i in np.argsort(-fg):
        if not alive[i]:
            continue
        if any(_iou_aabb(corners[i], corners[j]) > 0.25 for j in kept):
            continue
        kept.append(i)
    assert sorted(np.nonzero(keep)[0].tolist()) == sorted(kept)


def test_finetune_augmentation_joint(tmp_path):
    """rotate_prob=1: grid rotated 90deg about z and gt+rois remapped
    jointly (reference ``datasets.py:410-426``)."""
    from nerf_rpn_tpu.data.augment import rotate90_z
    from nerf_rpn_tpu.data.datasets import RPNClassificationDataset

    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (12, 10, 8, 4)).astype(np.float32)
    gt = np.asarray([[2, 3, 1, 6, 7, 5]], np.float32)
    rois = np.asarray([[1, 1, 1, 5, 5, 5], [3, 2, 2, 9, 8, 6]], np.float32)
    np.savez(tmp_path / "s0.npz", rgbsigma=vol)
    np.save(tmp_path / "s0.npy", gt)
    np.savez(tmp_path / "rois_s0.npz", proposals=rois,
             level_indices=np.zeros(2, np.int32))
    roi_dir = tmp_path / "rois"
    roi_dir.mkdir()
    (tmp_path / "rois_s0.npz").rename(roi_dir / "s0.npz")

    ds = RPNClassificationDataset(
        str(tmp_path), str(tmp_path), str(roi_dir), scene_names=["s0"],
        fine_tune=True, normalize_density=False,
        rotate_prob=1.0, flip_prob=0.0, rot_scale_prob=0.0)
    feats, boxes, props, levels, name = ds[0]

    exp_grid, exp_joint = rotate90_z(vol, np.concatenate([gt, rois]))
    np.testing.assert_allclose(feats, exp_grid)
    np.testing.assert_allclose(boxes, exp_joint[:1])
    np.testing.assert_allclose(props, exp_joint[1:])
    np.testing.assert_array_equal(levels, np.zeros(2, np.int32))

    # no-augmentation dataset leaves everything untouched
    ds0 = RPNClassificationDataset(
        str(tmp_path), str(tmp_path), str(roi_dir), scene_names=["s0"],
        fine_tune=True, normalize_density=False)
    f0, b0, p0, _, _ = ds0[0]
    np.testing.assert_allclose(f0, vol)
    np.testing.assert_allclose(b0, gt)
    np.testing.assert_allclose(p0, rois)


def test_make_optimizer_tiny_total_steps_finite():
    """Regression: onecycle with total_steps < 4 used to emit NaN lr (0-step
    warmup -> 0/0), NaN-ing every param on the first update."""
    from nerf_rpn_tpu.train.state import make_optimizer

    for ts in (1, 2, 3, 4):
        _, sched = make_optimizer(1e-4, ts)
        vals = [float(sched(i)) for i in range(ts + 1)]
        assert all(np.isfinite(v) for v in vals), (ts, vals)
