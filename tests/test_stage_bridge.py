"""Stage-1 -> stage-2 bridge: run_rpn --save_results dumps must load through
RPNClassificationDataset and drive the RCNN steps."""

import numpy as np

import jax

from nerf_rpn_tpu.data.datasets import (
    RPNClassificationDataset,
    collate_classification_batch,
)

MESH = (32, 32, 32)


def test_save_results_feeds_classification_dataset(tmp_path):
    from nerf_rpn_tpu.cli import run_rpn

    rng = np.random.default_rng(0)
    scenes = []
    for i in range(2):
        name = f"scene{i}"
        vol = np.zeros((*MESH, 4), np.float32)
        lo = rng.integers(2, 14, 3)
        hi = lo + rng.integers(8, 12, 3)
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1.0
        np.savez(tmp_path / f"{name}.npz", rgbsigma=vol)
        np.save(tmp_path / f"{name}.npy", np.asarray([[*lo, *hi]], np.float32))
        scenes.append(name)
    np.savez(tmp_path / "split.npz",
             train_scenes=np.array(scenes[:1]),
             val_scenes=np.array(scenes[:1]),
             test_scenes=np.array(scenes))

    save = tmp_path / "out"
    args = run_rpn.parse_args([
        "--mode", "eval",
        "--dataset_name", "hypersim",
        "--features_path", str(tmp_path),
        "--boxes_path", str(tmp_path),
        "--dataset_split", str(tmp_path / "split.npz"),
        "--save_path", str(save),
        "--backbone_type", "resnet_tiny",
        "--resolution", "32",
        "--rpn_head_conv_depth", "1",
        "--rpn_pre_nms_top_n_test", "32",
        "--rpn_post_nms_top_n_test", "16",
        "--save_results",
        "--save_results_path", str(save / "results"),
        "--pad_multiple", "32",
    ])
    trainer = run_rpn.Trainer(args)
    from nerf_rpn_tpu.cli import common as cli_common

    _, _, test_set = cli_common.build_datasets(args, "eval", augment=False)
    trainer.init_state(1)
    trainer.eval(test_set)

    feat_dir = save / "results" / "features"
    roi_dir = save / "results" / "proposals"
    assert (feat_dir / "scene0.npz").is_file()
    assert (roi_dir / "scene0.npz").is_file()

    ds = RPNClassificationDataset(
        str(feat_dir), str(tmp_path), str(roi_dir), scene_names=scenes)
    assert len(ds) == 2
    feats, boxes, props, levels, name = ds[0]
    assert len(feats) == 4  # FPN levels, channels-last
    assert feats[0].shape[-1] == 32  # resnet_tiny out_channels
    assert props.shape[1] == 6
    assert len(levels) == len(props)

    batch = collate_classification_batch([ds[0], ds[1]], max_rois=16, max_gt=4)
    assert batch["features"][0].shape[0] == 2
    assert batch["roi_valid"].any()

    # drive the RCNN eval step on the bridged batch
    from nerf_rpn_tpu.models.detector import RCNNConfig, RCNNHead
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from nerf_rpn_tpu.train.steps import make_rcnn_eval_step
    from flax.core import FrozenDict
    import jax.numpy as jnp

    cfg = RCNNConfig(output_size=(2, 2, 2))
    head = RCNNHead(in_channels=32)
    hv = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 2, 32)))
    tx, _ = make_optimizer(1e-3, 1)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=hv["params"],
                       batch_stats=FrozenDict(),
                       opt_state=tx.init(hv["params"]), tx=tx)
    eval_step = make_rcnn_eval_step(head, cfg, (4, 8, 16, 32))
    arrays = {k: v for k, v in batch.items() if k != "names"}
    out = eval_step(state, arrays)
    assert np.isfinite(np.asarray(out["scores"])).all()
