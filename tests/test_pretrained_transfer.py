"""--pretrained backbone transfer into the fine-tune RCNN driver."""

import numpy as np

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.train import checkpoint as ckpt_lib
from nerf_rpn_tpu.train.state import create_train_state, make_optimizer


def test_pretrained_backbone_transfer(tmp_path):
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.cli import run_rpn_detect

    # stage-1 checkpoint with a tiny backbone
    model = NeRFRPN(backbone_type="resnet_tiny", resolution=32, conv_depth=1,
                    num_anchors=1)
    tx, _ = make_optimizer(1e-3, 1)
    s1 = create_train_state(model, jax.random.PRNGKey(3),
                            jnp.zeros((1, 32, 32, 32, 4)), tx)
    ckpt_dir = tmp_path / "stage1"
    ckpt_lib.save_checkpoint(s1, str(ckpt_dir))

    args = run_rpn_detect.parse_args([
        "--mode", "train",
        "--fine_tune",
        "--backbone_type", "resnet",
        "--pretrained", str(ckpt_dir),
        "--feature_input_dim", "32",
        "--output_size", "2", "2", "2",
        "--is_flatten",
    ])
    trainer = run_rpn_detect.Trainer(args)
    # swap in the matching tiny backbone so shapes line up
    from nerf_rpn_tpu.models.nerf_rpn import build_backbone

    trainer.backbone = build_backbone("resnet_tiny", 32)
    trainer.init_state(1, None)

    donor = {str(k): v for k, v
             in jax.tree_util.tree_leaves_with_path(s1.params["backbone"])}
    got = {str(k): v for k, v
           in jax.tree_util.tree_leaves_with_path(
               trainer.state.params["backbone"])}
    assert set(donor) == set(got)
    for k in donor:
        np.testing.assert_array_equal(np.asarray(donor[k]), np.asarray(got[k]),
                                      err_msg=k)
