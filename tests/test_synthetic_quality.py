"""Synthetic train-to-quality gates (the stand-in for the reference's
real-data acceptance run, reference ``run_rpn.py:533-583``).

The fast tests here validate the generator itself.  The four gate tests
train the tiny configs from scratch through the REAL drivers on generated
scenes and assert AP@0.25 on the held-out test split — they take minutes
per combo on CPU, so they are gated behind ``NERF_RPN_QUALITY_GATE=1``:

    NERF_RPN_QUALITY_GATE=1 python -m pytest tests/test_synthetic_quality.py -v

(or run ``python scripts/synthetic_quality_gate.py`` directly).
"""

import os

import numpy as np
import pytest

from nerf_rpn_tpu.data.synthetic import (
    generate_scene,
    write_synthetic_dataset,
    write_synthetic_rois,
)

gate = pytest.mark.skipif(
    os.environ.get("NERF_RPN_QUALITY_GATE") != "1",
    reason="minutes-long train-to-quality gate; set NERF_RPN_QUALITY_GATE=1",
)


def test_generate_scene_aabb_signal():
    rng = np.random.default_rng(0)
    g, boxes = generate_scene(rng, noise=0.0, n_distractors=0)
    assert g.shape == (32, 32, 32, 4) and boxes.shape[1] == 6
    # density ~1 inside every box, ~0 outside
    inside = np.zeros(g.shape[:3], bool)
    for b in boxes:
        lo = np.floor(b[:3]).astype(int)
        hi = np.ceil(b[3:]).astype(int)
        inside[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    assert g[..., 3][inside].min() >= 0.85
    assert g[..., 3][~inside].max() <= 1e-6
    # boxes stay inside the grid and don't overlap (IoU 0 pairwise)
    assert (boxes[:, :3] >= 0).all() and (boxes[:, 3:] <= 32).all()


def test_generate_scene_obb_rotation_matters():
    """The rasterized support of a rotated box must actually rotate: compare
    against the axis-aligned box of the same size/center."""
    rng = np.random.default_rng(1)
    g, boxes = generate_scene(rng, max_boxes=1, rotated=True, noise=0.0,
                              n_distractors=0, box_size=(12.0, 16.0))
    assert boxes.shape == (1, 7)
    x, y, z, w, l, h, theta = boxes[0]
    occ = g[..., 3] > 0.5
    # voxel centers inside the UNrotated AABB of the same dims
    xs = np.arange(32) + 0.5
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    aabb_occ = ((np.abs(gx - x) <= w / 2) & (np.abs(gy - y) <= l / 2)
                & (np.abs(gz - z) <= h / 2))
    # a genuinely rotated box differs from its axis-aligned twin
    assert abs(theta) > 0.05
    assert (occ ^ aabb_occ).sum() > 10
    # and occupancy matches the analytic rotated-box test
    c, s = np.cos(-theta), np.sin(-theta)
    rx = c * (gx - x) - s * (gy - y)
    ry = s * (gx - x) + c * (gy - y)
    expect = ((np.abs(rx) <= w / 2) & (np.abs(ry) <= l / 2)
              & (np.abs(gz - z) <= h / 2))
    np.testing.assert_array_equal(occ, expect)


def test_write_synthetic_dataset_layout(tmp_path):
    split = write_synthetic_dataset(str(tmp_path), n_train=3, n_val=1,
                                    n_test=2)
    assert len(split["train_scenes"]) == 3
    with np.load(tmp_path / "split.npz") as f:
        assert list(f["test_scenes"]) == ["synth004", "synth005"]
    with np.load(tmp_path / "synth000.npz") as f:
        assert f["rgbsigma"].shape == (32, 32, 32, 4)
    assert np.load(tmp_path / "synth000.npy").shape[1] == 6


def test_write_synthetic_rois_contract(tmp_path):
    """Positives overlap their gt above the fg threshold, negatives stay
    below the bg threshold, and the npz layout matches the stage-1 dump."""
    from nerf_rpn_tpu.data.synthetic import _iou_aabb_np

    write_synthetic_dataset(str(tmp_path), n_train=2, n_val=1, n_test=1)
    roi_dir = tmp_path / "rois"
    write_synthetic_rois(str(tmp_path), str(roi_dir))
    files = sorted(os.listdir(roi_dir))
    assert len(files) == 4
    for fn in files:
        gt = np.load(tmp_path / fn.replace(".npz", ".npy"))
        with np.load(roi_dir / fn) as f:
            rois, levels = f["proposals"], f["level_indices"]
        assert levels.dtype == np.int32 and len(levels) == len(rois)
        n_pos = 3 * len(gt)
        for r in rois[:n_pos]:
            assert max(_iou_aabb_np(r, g) for g in gt) >= 0.35
        for r in rois[n_pos:]:
            assert max(_iou_aabb_np(r, g) for g in gt) < 0.15


def _run_gate(combo, tmp_path, num_epochs):
    from scripts.synthetic_quality_gate import (
        GATES, GATES_AP50, run_combo)

    ap25, ap50, r25, _, curve = run_combo(combo, str(tmp_path),
                                          num_epochs=num_epochs)
    print(f"{combo}: ap25={ap25:.4f} ap50={ap50:.4f} recall25={r25:.4f} "
          f"val_recall50_curve={[round(v, 2) for v in curve]}")
    assert ap25 >= GATES[combo], (
        f"{combo} trained to AP@0.25={ap25:.4f} < gate {GATES[combo]}")
    # AP@50 saturates LATER than AP@25 (the r3 'anchor AP@50 weakness' was
    # an undertrained 30-epoch run); assert it only at the full schedule.
    if num_epochs >= 60:
        assert ap50 >= GATES_AP50[combo], (
            f"{combo} trained to AP@0.50={ap50:.4f} < gate "
            f"{GATES_AP50[combo]}")


@gate
def test_quality_rpn_aabb(tmp_path):
    _run_gate("rpn_aabb", tmp_path, num_epochs=60)


@gate
def test_quality_rpn_obb(tmp_path):
    _run_gate("rpn_obb", tmp_path, num_epochs=60)


@gate
def test_quality_fcos_aabb(tmp_path):
    _run_gate("fcos_aabb", tmp_path, num_epochs=60)


@gate
def test_quality_fcos_obb(tmp_path):
    _run_gate("fcos_obb", tmp_path, num_epochs=60)


@pytest.mark.skipif(
    os.environ.get("NERF_RPN_QUALITY_GATE_R200") != "1",
    reason="TPU-sized bench-shape-class gate; set NERF_RPN_QUALITY_GATE_R200=1 "
           "and run on the chip (scripts/synthetic_quality_gate.py "
           "--combos rpn_aabb_r200 --platform default)",
)
def test_quality_rpn_aabb_r200(tmp_path):
    """Headline bench shape class (VERDICT r4 #8): swin_s anchor RPN on
    (200, 200, 130) scenes padded to 208x208x144 — the shape class the
    32^3 combos never exercise (hierarchical top-k at ~1.2M anchors,
    bucketing, native-layout propose)."""
    _run_gate("rpn_aabb_r200", tmp_path, num_epochs=60)


@gate
def test_quality_rcnn(tmp_path):
    """Stage-2 fine-tune: refined+filtered AP@25 and objectness
    classification accuracy on synthetic proposals."""
    from scripts.synthetic_quality_gate import (
        GATES,
        RCNN_ACCURACY_GATE,
        run_combo,
    )

    ap25, ap50, acc, _, _ = run_combo("rcnn", str(tmp_path), num_epochs=40)
    print(f"rcnn: ap25={ap25:.4f} ap50={ap50:.4f} cls_accuracy={acc:.4f}")
    assert ap25 >= GATES["rcnn"], ap25
    assert acc >= RCNN_ACCURACY_GATE, acc
