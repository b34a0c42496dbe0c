"""Data layer (loading, augmentation, batching) and metric-suite tests."""

import os

import numpy as np
import pytest

from nerf_rpn_tpu.data.datasets import (
    density_to_alpha_ngp,
    density_to_alpha_relu,
    load_scene,
    GeneralRPNDataset,
    HypersimRPNDataset,
    split_dataset,
    load_split,
    collate_batch,
    batch_iterator,
)
from nerf_rpn_tpu.data.augment import (
    rotate90_z,
    flip_axis,
    rotate_and_scale,
)
from nerf_rpn_tpu.evaluation.metrics import (
    evaluate_box_proposals_recall,
    evaluate_box_proposals_precision,
    evaluate_box_proposals_ap,
    evaluate_box_proposals_average_precision,
    evaluate_labels,
    evaluate_classification,
)


def make_scene_files(tmp_path, name="scene0", shape=(12, 10, 8), uint8=False,
                     n_boxes=3, obb=False):
    rng = np.random.default_rng(0)
    rgbsigma = rng.uniform(0, 1, (*shape, 4)).astype(np.float32)
    if uint8:
        rgbsigma = (rgbsigma * 255).astype(np.uint8)
    np.savez(tmp_path / f"{name}.npz", rgbsigma=rgbsigma)
    if obb:
        boxes = np.zeros((n_boxes, 7), np.float32)
        boxes[:, :3] = rng.uniform(3, 6, (n_boxes, 3))
        boxes[:, 3:6] = rng.uniform(2, 4, (n_boxes, 3))
        boxes[:, 6] = rng.uniform(-1, 1, n_boxes)
    else:
        lo = rng.uniform(0, 4, (n_boxes, 3))
        boxes = np.concatenate([lo, lo + rng.uniform(2, 4, (n_boxes, 3))], -1)
    np.save(tmp_path / f"{name}.npy", boxes.astype(np.float32))
    return rgbsigma, boxes


def test_density_to_alpha():
    d = np.array([-100.0, 0.0, 10.0])
    a = density_to_alpha_ngp(d)
    assert a[0] < 1e-6 and 0 < a[1] < 0.02 and a[2] > 0.99
    r = density_to_alpha_relu(np.array([-5.0, 0.0, 1000.0]))
    assert r[0] == 0 and r[1] == 0 and r[2] > 0.99


def test_load_scene_uint8_and_alpha(tmp_path):
    make_scene_files(tmp_path, uint8=True)
    vol, boxes = load_scene(
        str(tmp_path / "scene0.npz"), str(tmp_path / "scene0.npy")
    )
    assert vol.shape == (12, 10, 8, 4)
    assert vol.dtype == np.float32
    assert vol[..., :3].max() <= 1.0
    assert boxes.shape[1] == 6


def test_dataset_and_batching(tmp_path):
    for i in range(3):
        make_scene_files(tmp_path, f"s{i}", shape=(10 + i, 8, 6))
    ds = HypersimRPNDataset(str(tmp_path), str(tmp_path), preload=True)
    assert len(ds) == 3
    batches = list(batch_iterator(ds, 2, pad_multiple=8, max_gt=5))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["grids"].shape == (2, 16, 8, 8, 4)
    assert b0["ori_sizes"].tolist() == [[10, 8, 6], [11, 8, 6]]
    assert b0["gt_mask"].sum() == 6  # 3 boxes per scene
    # zero padding beyond original extents
    assert b0["grids"][0, 10:, :, :].max() == 0


def test_dataset_filters_missing(tmp_path):
    make_scene_files(tmp_path, "ok")
    np.save(tmp_path / "empty.npy", np.zeros((0, 6), np.float32))
    np.savez(tmp_path / "empty.npz", rgbsigma=np.zeros((4, 4, 4, 4), np.float32))
    ds = HypersimRPNDataset(str(tmp_path), str(tmp_path),
                            scene_list=["ok", "empty", "missing"])
    assert ds.scene_names == ["ok"]


def test_general_csv_dataset(tmp_path):
    make_scene_files(tmp_path, "g0")
    csv_file = tmp_path / "data.csv"
    csv_file.write_text(
        "scene,rgbsigma_path,boxes_path\n"
        f"g0,{tmp_path}/g0.npz,{tmp_path}/g0.npy\n"
        f"g1,{tmp_path}/g0.npz,None\n"
    )
    ds = GeneralRPNDataset(str(csv_file))
    assert len(ds) == 2
    _, boxes0, _ = ds[0]
    _, boxes1, _ = ds[1]
    assert boxes0 is not None and boxes1 is None


def test_split_roundtrip(tmp_path):
    scenes = [f"s{i}" for i in range(10)]
    out = tmp_path / "split.npz"
    split_dataset(scenes, 0.6, 0.2, str(out))
    tr, va, te = load_split(str(out))
    assert len(tr) == 6 and len(va) == 2 and len(te) == 2
    assert set(tr + va + te) == set(scenes)


def _voxelize_boxes(shape, boxes):
    """Binary occupancy of AABB boxes."""
    vol = np.zeros(shape, bool)
    for b in boxes:
        x1, y1, z1, x2, y2, z2 = [int(round(v)) for v in b[:6]]
        vol[x1:x2, y1:y2, z1:z2] = True
    return vol


def test_rotate90_box_grid_consistency():
    """Augment grid + boxes; re-voxelised boxes must match augmented voxels."""
    shape = (8, 6, 4)
    boxes = np.array([[1, 2, 0, 4, 5, 3]], np.float32)
    vol = _voxelize_boxes(shape, boxes)[..., None].astype(np.float32)
    out, new_boxes = rotate90_z(vol, boxes)
    expected = _voxelize_boxes(out.shape[:3], new_boxes)
    np.testing.assert_array_equal(out[..., 0] > 0.5, expected)


def test_flip_box_grid_consistency():
    shape = (8, 6, 4)
    boxes = np.array([[1, 2, 0, 4, 5, 3]], np.float32)
    vol = _voxelize_boxes(shape, boxes)[..., None].astype(np.float32)
    for axis in (0, 1):
        out, new_boxes = flip_axis(vol, boxes, axis)
        expected = _voxelize_boxes(shape, new_boxes)
        np.testing.assert_array_equal(out[..., 0] > 0.5, expected)


def test_flip_obb_theta_negated():
    vol = np.zeros((8, 8, 8, 1), np.float32)
    boxes = np.array([[4, 4, 4, 2, 1, 1, 0.5]], np.float32)
    _, nb = flip_axis(vol, boxes, 0)
    assert nb[0, 6] == -0.5
    assert nb[0, 0] == 4.0  # mirrored about centre


def test_rotate_and_scale_identity():
    """angle=0, scale=1 must be (nearly) the identity resample."""
    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (8, 6, 4, 2)).astype(np.float32)
    boxes = np.array([[4, 3, 2, 2, 1, 1, 0.3]], np.float32)
    out, nb = rotate_and_scale(vol, boxes, 0.0, 1.0)
    np.testing.assert_allclose(out, vol, atol=1e-5)
    np.testing.assert_allclose(nb, boxes, atol=1e-5)


def test_rotate_and_scale_marker_moves():
    """A marker voxel must move to its rotated position."""
    vol = np.zeros((16, 16, 4, 1), np.float32)
    vol[12, 8, 2, 0] = 1.0  # +4 along x from centre (8, 8, 2)
    angle = np.pi / 2
    out, _ = rotate_and_scale(
        vol, np.array([[8, 8, 2, 2, 2, 2, 0]], np.float32), angle, 1.0
    )
    # output voxel at (i,j) samples source at R @ p: marker should now be
    # found where the rotated sample grid hits (12, 8): p = (0, -4ish)
    peak = np.unravel_index(out[..., 0].argmax(), out.shape[:3])
    # centre is at index ~7.5 -> rotating (4, 0) by -90deg in sample space
    assert abs(peak[0] - 8) <= 1 and abs(peak[1] - 4) <= 1, peak


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_recall_perfect_proposals():
    gt = [np.array([[0, 0, 0, 4, 4, 4], [10, 10, 10, 14, 14, 14]], np.float32)]
    res = evaluate_box_proposals_recall(
        [gt[0].copy()], [np.array([0.9, 0.8], np.float32)], gt
    )
    assert res["ar"] == 1.0
    assert (res["recalls"] == 1.0).all()
    assert res["num_pos"] == 2


def test_recall_half():
    gt = [np.array([[0, 0, 0, 4, 4, 4], [10, 10, 10, 14, 14, 14]], np.float32)]
    props = [np.array([[0, 0, 0, 4, 4, 4], [30, 30, 30, 34, 34, 34]], np.float32)]
    res = evaluate_box_proposals_recall(props, [np.array([0.9, 0.8])], gt)
    assert np.allclose(res["recalls"], 0.5)


def test_recall_greedy_one_to_one():
    """Two proposals both near gt0 — only one may claim it."""
    gt = [np.array([[0, 0, 0, 4, 4, 4], [10, 10, 10, 14, 14, 14]], np.float32)]
    props = [np.array([[0, 0, 0, 4, 4, 4], [0, 0, 0, 4, 4, 3.8]], np.float32)]
    res = evaluate_box_proposals_recall(props, [np.array([0.9, 0.8])], gt,
                                        thresholds=[0.5])
    assert np.allclose(res["recalls"], 0.5)


def test_ap_perfect():
    gt = [np.array([[0, 0, 0, 4, 4, 4]], np.float32)]
    res = evaluate_box_proposals_ap(
        [gt[0].copy()], [np.array([0.9], np.float32)], gt, iou_thresh=0.5
    )
    assert res["ap"] == 1.0


def test_ap_with_false_positive_ranked_first():
    gt = [np.array([[0, 0, 0, 4, 4, 4]], np.float32)]
    props = [np.array([[20, 20, 20, 24, 24, 24], [0, 0, 0, 4, 4, 4]], np.float32)]
    # fp ranked above tp: precision at the tp is 1/2 -> AP 0.5
    res = evaluate_box_proposals_ap(props, [np.array([0.9, 0.8])], gt, 0.5)
    assert abs(res["ap"] - 0.5) < 1e-6
    # tp ranked first -> AP 1.0
    res2 = evaluate_box_proposals_ap(props, [np.array([0.8, 0.9])], gt, 0.5)
    assert abs(res2["ap"] - 1.0) < 1e-6


def test_ap_duplicate_detection_is_fp():
    gt = [np.array([[0, 0, 0, 4, 4, 4]], np.float32)]
    props = [np.array([[0, 0, 0, 4, 4, 4], [0, 0, 0, 4, 4, 4]], np.float32)]
    res = evaluate_box_proposals_ap(props, [np.array([0.9, 0.8])], gt, 0.5)
    assert abs(res["ap"] - 1.0) < 1e-6  # duplicate counted fp but after the tp


def test_precision_metric():
    gt = [np.array([[0, 0, 0, 4, 4, 4]], np.float32)]
    props = [np.array([[0, 0, 0, 4, 4, 4], [20, 20, 20, 24, 24, 24]], np.float32)]
    res = evaluate_box_proposals_precision(props, [np.array([0.9, 0.8])], gt,
                                           thresholds=[0.5])
    assert np.allclose(res["precisions"], 0.5)


def test_conf_sweep_ap_runs():
    gt = [np.array([[0, 0, 0, 4, 4, 4]], np.float32)]
    res = evaluate_box_proposals_average_precision(
        [gt[0].copy()], [np.array([0.9], np.float32)], gt, iou_thresh=0.5
    )
    assert 0.8 <= res["ap"] <= 1.0


def test_classification_metrics():
    labels = evaluate_labels(
        [np.array([[0, 0, 0, 4, 4, 4], [9, 9, 9, 10, 10, 10]], np.float32)],
        [np.array([[0, 0, 0, 4, 4, 4]], np.float32)],
        iou_thresholds=[0.5],
    )
    assert labels[0][0].tolist() == [1, 0]
    res = evaluate_classification(
        [np.array([0.9, 0.2], np.float32)], [np.array([1, 0], np.int32)], 0.5
    )
    assert res["precision"] == 1.0 and res["accuracy"] == 1.0


def test_collate_grid_dtype_bf16(tmp_path):
    """bf16 models cast grids at their first conv; the host collate doing
    that cast instead (``grid_dtype``) must produce identical values
    (round-to-nearest-even either way) at half the bytes."""
    import jax.numpy as jnp

    make_scene_files(tmp_path, "s0", shape=(10, 8, 6))
    ds = HypersimRPNDataset(str(tmp_path), str(tmp_path), preload=True)
    b16 = next(iter(batch_iterator(ds, 1, pad_multiple=8,
                                   grid_dtype=jnp.bfloat16)))
    b32 = next(iter(batch_iterator(ds, 1, pad_multiple=8)))
    assert b16["grids"].dtype == jnp.bfloat16
    assert b32["grids"].dtype == np.float32
    assert np.array_equal(b32["grids"].astype(jnp.bfloat16), b16["grids"])
