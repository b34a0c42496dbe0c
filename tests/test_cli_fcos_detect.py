"""E2E smoke of the FCOS and RCNN-detect CLI drivers on synthetic data."""

import os

import numpy as np
import pytest

MESH = (32, 32, 32)


@pytest.fixture
def synth_dir(tmp_path):
    rng = np.random.default_rng(7)
    scenes = []
    for i in range(4):
        name = f"scene{i}"
        vol = np.zeros((*MESH, 4), np.float32)
        lo = rng.integers(2, 14, 3)
        hi = lo + rng.integers(8, 14, 3)
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1.0
        np.savez(tmp_path / f"{name}.npz", rgbsigma=vol)
        np.save(tmp_path / f"{name}.npy", np.asarray([[*lo, *hi]], np.float32))
        scenes.append(name)
    np.savez(tmp_path / "split.npz",
             train_scenes=np.array(scenes[:2]),
             val_scenes=np.array(scenes[2:3]),
             test_scenes=np.array(scenes[3:]))
    return tmp_path


def test_run_fcos_cli(synth_dir, tmp_path):
    from nerf_rpn_tpu.cli import run_fcos

    save = tmp_path / "fcos_out"
    args = run_fcos.parse_args([
        "--mode", "train",
        "--dataset", "hypersim",
        "--features_path", str(synth_dir),
        "--boxes_path", str(synth_dir),
        "--dataset_split", str(synth_dir / "split.npz"),
        "--save_path", str(save),
        "--backbone_type", "resnet",
        "--resolution", "32",
        "--num_convs", "1",
        "--num_epochs", "1",
        "--batch_size", "1",
        "--norm_reg_targets", "--centerness_on_reg",
        "--pre_nms_top_n", "64", "--fpn_post_nms_top_n", "32",
        "--flip_prob", "0", "--rotate_prob", "0", "--rot_scale_prob", "0",
        "--pad_multiple", "32",
    ])
    # shrink the backbone for CI speed: swap in the tiny variant
    from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF

    trainer = run_fcos.Trainer(args)
    trainer.model = FCOSOverNeRF(
        backbone_type="resnet_tiny", resolution=32, num_convs=1,
        norm_reg_targets=True, centerness_on_reg=True, fpn_strides=(4, 8, 16, 32))
    trainer.train_loop()
    assert os.path.isdir(save / "model_best")

    # eval with output_proposals + level indices
    args2 = run_fcos.parse_args([
        "--mode", "eval",
        "--dataset", "hypersim",
        "--features_path", str(synth_dir),
        "--boxes_path", str(synth_dir),
        "--dataset_split", str(synth_dir / "split.npz"),
        "--save_path", str(save),
        "--checkpoint", str(save / "model_best"),
        "--backbone_type", "resnet",
        "--resolution", "32",
        "--num_convs", "1",
        "--norm_reg_targets", "--centerness_on_reg",
        "--pre_nms_top_n", "64", "--fpn_post_nms_top_n", "32",
        "--output_proposals", "--save_level_index",
        "--pad_multiple", "32",
    ])
    trainer2 = run_fcos.Trainer(args2)
    trainer2.model = trainer.model
    from nerf_rpn_tpu.cli import common as cli_common

    _, _, test_set = cli_common.build_datasets(args2, "eval", augment=False)
    trainer2.init_state(1)
    recalls, aps = trainer2.eval(test_set)
    assert recalls is not None
    prop_file = save / "proposals" / "scene3.npz"
    assert prop_file.is_file()
    with np.load(prop_file) as f:
        assert "level_indices" in f
        assert f["proposal"].shape[1] == 6


def test_run_rpn_detect_cli(synth_dir, tmp_path):
    """Stage 2 on synthetic saved features + proposals."""
    from nerf_rpn_tpu.cli import run_rpn_detect

    rng = np.random.default_rng(1)
    feat_dir = tmp_path / "features"
    roi_dir = tmp_path / "rois"
    feat_dir.mkdir()
    roi_dir.mkdir()
    level_res = [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]
    for i in range(4):
        name = f"scene{i}"
        # saved level features in the reference's (C, X, Y, Z) flat layout
        feats = [rng.normal(size=(16, *r)).astype(np.float32) for r in level_res]
        np.savez(
            feat_dir / f"{name}.npz",
            level_features=np.array(
                [f.reshape(-1).astype(object) for f in feats], dtype=object),
            resolution=np.array([[16, *r] for r in level_res]),
        )
        gt = np.load(synth_dir / f"{name}.npy")
        # proposals: jittered gt + random negatives
        props = np.concatenate(
            [gt + rng.uniform(-1, 1, gt.shape).astype(np.float32),
             np.concatenate([rng.uniform(0, 12, (6, 3)),
                             rng.uniform(16, 30, (6, 3))], -1).astype(np.float32)])
        np.savez(roi_dir / f"{name}.npz",
                 proposals=props,
                 level_indices=np.zeros(len(props), np.int32))

    save = tmp_path / "rcnn_out"
    args = run_rpn_detect.parse_args([
        "--mode", "train",
        "--features_path", str(feat_dir),
        "--boxes_path", str(synth_dir),
        "--rois_path", str(roi_dir),
        "--dataset_split", str(synth_dir / "split.npz"),
        "--save_path", str(save),
        "--num_epochs", "1",
        "--batch_size", "2",
        "--cls_batch_size", "16",
        "--feature_input_dim", "16",
        "--output_size", "2", "2", "2",
        "--spatial_scale", "4", "8", "16", "32",
        "--fg_threshold", "0.3", "--bg_threshold", "0.2",
        "--is_flatten",
        "--max_rois", "8",
        "--remap",  # exercises the numpy level remap in the host collate
    ])
    trainer = run_rpn_detect.Trainer(args)
    trainer.train_loop()
    assert os.path.isdir(save / "model_best")
