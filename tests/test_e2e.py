"""End-to-end integration: the minimum slice (SURVEY 7.2) on synthetic data.

Synthetic scenes contain solid boxes in an empty grid; a tiny anchor RPN is
trained for a few steps (loss must drop) and the eval pipeline must recover
the boxes with high recall given oracle objectness.  Also smoke-tests the
CLI drivers and the RCNN stage-2 steps.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
from nerf_rpn_tpu.models.rpn import (
    RPNConfig,
    build_level_tables,
    flatten_head_outputs,
    generate_proposals,
    rpn_losses,
)
from nerf_rpn_tpu.train.state import create_train_state, make_optimizer
from nerf_rpn_tpu.train.steps import (
    make_rpn_train_step,
    make_rcnn_train_step,
    make_rcnn_eval_step,
)
from nerf_rpn_tpu.models.detector import RCNNConfig, RCNNHead
from nerf_rpn_tpu.evaluation.metrics import evaluate_box_proposals_recall

MESH = (32, 32, 32)
SIZES = ((8.0,), (16.0,))
RATIOS = (((1.0, 1.0, 1.0),), ((1.0, 1.0, 1.0),))
STRIDES = (4, 8)


def synth_batch(rng, b=2, n_boxes=2):
    grids = np.zeros((b, *MESH, 4), np.float32)
    gt = np.zeros((b, n_boxes, 6), np.float32)
    for i in range(b):
        for j in range(n_boxes):
            lo = rng.integers(2, 18, 3)
            sz = rng.integers(6, 10, 3)
            hi = np.minimum(lo + sz, 30)
            grids[i, lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2], :] = 1.0
            gt[i, j] = [*lo, *hi]
    return {
        "grids": grids,
        "ori_sizes": np.full((b, 3), 32, np.int32),
        "gt_boxes": gt,
        "gt_mask": np.ones((b, n_boxes), bool),
    }


def test_tiny_rpn_training_loss_decreases():
    rng = np.random.default_rng(0)
    model = NeRFRPN(backbone_type="resnet_tiny", resolution=32, conv_depth=1,
                    num_anchors=1)
    cfg = RPNConfig(anchor_sizes=SIZES, aspect_ratios=RATIOS,
                    pre_nms_top_n=64, post_nms_top_n=32)
    tx, _ = make_optimizer(lr=3e-3, total_steps=30)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, *MESH, 4)), tx)
    # note: tiny backbone emits 4 levels; we use only 2 anchor levels worth
    # of head outputs by configuring 2-level tables on a 2-stride subset
    train_step, counts = make_rpn_train_step(model, cfg, MESH, STRIDES[:2])

    batch = synth_batch(rng)
    losses = []
    key = jax.random.PRNGKey(1)
    for step in range(8):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_oracle_objectness_high_recall():
    """With oracle scores (anchor IoU vs gt) and zero deltas, the proposal
    pipeline + greedy recall metric must recover the gt boxes."""
    rng = np.random.default_rng(1)
    cfg = RPNConfig(anchor_sizes=SIZES, aspect_ratios=RATIOS,
                    pre_nms_top_n=128, post_nms_top_n=64, nms_thresh=0.3)
    anchors, _, _, counts = build_level_tables(cfg, MESH, [(8, 8, 8), (4, 4, 4)])
    batch = synth_batch(rng)
    from nerf_rpn_tpu.ops.aabb import pairwise_iou_aabb

    obj = []
    for i in range(2):
        iou = np.asarray(
            pairwise_iou_aabb(jnp.asarray(batch["gt_boxes"][i]),
                              jnp.asarray(anchors))
        ).max(0)
        obj.append(iou * 10 - 5)  # logits
    obj = jnp.asarray(np.stack(obj))
    deltas = jnp.zeros((2, anchors.shape[0], 6))
    out = generate_proposals(cfg, obj, deltas, jnp.asarray(anchors), counts, MESH)
    props, scores, gts = [], [], []
    for i in range(2):
        v = np.asarray(out["valid"][i])
        props.append(np.asarray(out["boxes"][i])[v])
        scores.append(np.asarray(out["scores"][i])[v])
        gts.append(batch["gt_boxes"][i])
    res = evaluate_box_proposals_recall(props, scores, gts, thresholds=[0.25])
    assert res["recalls"][0] >= 0.75, res


def test_rcnn_steps_train_and_eval():
    rng = np.random.default_rng(2)
    cfg = RCNNConfig(fg_threshold=0.3, bg_threshold=0.2, output_size=(2, 2, 2))
    head = RCNNHead(in_channels=8, flatten=True)
    feats = [
        np.asarray(rng.normal(size=(2, 8, 8, 8, 8)), np.float32),
        np.asarray(rng.normal(size=(2, 4, 4, 4, 8)), np.float32),
    ]
    n_rois = 32
    rois = np.zeros((2, n_rois, 6), np.float32)
    lo = rng.uniform(2, 20, (2, n_rois, 3))
    rois[..., :3] = lo
    rois[..., 3:] = lo + rng.uniform(4, 8, (2, n_rois, 3))
    gt = rois[:, :2].copy()  # first rois are gt -> guaranteed fg
    batch = {
        "features": [jnp.asarray(f) for f in feats],
        "rois": jnp.asarray(rois),
        "roi_levels": jnp.zeros((2, n_rois), jnp.int32),
        "roi_valid": jnp.ones((2, n_rois), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_mask": jnp.ones((2, 2), bool),
    }
    tx, _ = make_optimizer(1e-3, 10)
    from flax.core import FrozenDict
    from nerf_rpn_tpu.train.state import TrainState

    hv = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 2, 8)))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=hv["params"],
                       batch_stats=FrozenDict(), opt_state=tx.init(hv["params"]),
                       tx=tx)
    train_step = make_rcnn_train_step(head, cfg, (4, 8), rois_per_image=16)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    eval_step = make_rcnn_eval_step(head, cfg, (4, 8))
    out = eval_step(state, batch)
    assert out["scores"].shape == (2, n_rois, 2)
    assert out["refined_boxes"].shape == (2, n_rois, 6)
    assert np.isfinite(np.asarray(out["scores"])).all()


@pytest.fixture
def synth_dataset_dir(tmp_path):
    rng = np.random.default_rng(3)
    scenes = []
    for i in range(4):
        name = f"scene{i}"
        vol = np.zeros((*MESH, 4), np.float32)
        lo = rng.integers(2, 16, 3)
        hi = lo + rng.integers(6, 12, 3)
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1.0
        np.savez(tmp_path / f"{name}.npz", rgbsigma=vol)
        np.save(tmp_path / f"{name}.npy",
                np.asarray([[*lo, *hi]], np.float32))
        scenes.append(name)
    np.savez(tmp_path / "split.npz",
             train_scenes=np.array(scenes[:2]),
             val_scenes=np.array(scenes[2:3]),
             test_scenes=np.array(scenes[3:]))
    return tmp_path


def test_run_rpn_cli_train_and_eval(synth_dataset_dir, tmp_path):
    """Smoke the full run_rpn driver: 1 epoch train + eval on synthetic data."""
    from nerf_rpn_tpu.cli import run_rpn

    save = tmp_path / "out"
    args = run_rpn.parse_args([
        "--mode", "train",
        "--dataset_name", "hypersim",
        "--features_path", str(synth_dataset_dir),
        "--boxes_path", str(synth_dataset_dir),
        "--dataset_split", str(synth_dataset_dir / "split.npz"),
        "--save_path", str(save),
        "--backbone_type", "resnet_tiny",
        "--resolution", "32",
        "--num_epochs", "1",
        "--batch_size", "1",
        "--rpn_head_conv_depth", "1",
        "--rpn_pre_nms_top_n_test", "64",
        "--rpn_post_nms_top_n_test", "32",
        "--flip_prob", "0", "--rotate_prob", "0", "--rot_scale_prob", "0",
        "--pad_multiple", "32",
    ])
    trainer = run_rpn.Trainer(args)
    trainer.train_loop()
    assert os.path.isdir(save / "model_best")
    assert os.path.isdir(save / "epoch_1")

    # eval mode reload
    args2 = run_rpn.parse_args([
        "--mode", "eval",
        "--dataset_name", "hypersim",
        "--features_path", str(synth_dataset_dir),
        "--boxes_path", str(synth_dataset_dir),
        "--dataset_split", str(synth_dataset_dir / "split.npz"),
        "--save_path", str(save),
        "--checkpoint", str(save / "model_best"),
        "--backbone_type", "resnet_tiny",
        "--resolution", "32",
        "--rpn_head_conv_depth", "1",
        "--rpn_pre_nms_top_n_test", "64",
        "--rpn_post_nms_top_n_test", "32",
        "--output_proposals",
        "--pad_multiple", "32",
    ])
    trainer2 = run_rpn.Trainer(args2)
    from nerf_rpn_tpu.cli import common as cli_common

    _, _, test_set = cli_common.build_datasets(args2, "eval", augment=False)
    trainer2.init_state(1)
    recalls, aps = trainer2.eval(test_set)
    assert recalls is not None
    assert os.path.isfile(save / "eval.json")
    assert os.path.isfile(save / "proposals" / "scene3.npz")


def test_freeze_backbone_updates_head_only():
    """--freeze_backbone: optax.multi_transform zeroes backbone updates."""
    from nerf_rpn_tpu.cli import run_rpn
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    args = run_rpn.parse_args([
        "--mode", "train", "--backbone_type", "resnet_tiny",
        "--resolution", "32", "--rpn_head_conv_depth", "1",
        "--freeze_backbone", "--pad_multiple", "32"])
    trainer = run_rpn.Trainer(args)
    trainer.init_state(10)
    step, _ = make_rpn_train_step(trainer.model, trainer.cfg_train,
                                  (32, 32, 32), (4, 8))
    batch = {
        "grids": np.random.default_rng(0).uniform(
            0, 1, (1, 32, 32, 32, 4)).astype(np.float32),
        "ori_sizes": np.asarray([[32, 32, 32]], np.int32),
        "gt_boxes": np.asarray([[[4, 4, 4, 16, 16, 16]]], np.float32),
        "gt_mask": np.ones((1, 1), bool),
    }
    before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.state.params)
    s2, _ = step(trainer.state, batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(before["backbone"]),
                    jax.tree.leaves(s2.params["backbone"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    head_changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before["rpn_head"]),
                        jax.tree.leaves(s2.params["rpn_head"])))
    assert head_changed
