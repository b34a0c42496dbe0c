"""Converted reference checkpoint (.msgpack) -> driver state restore chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_msgpack_checkpoint_roundtrip(tmp_path):
    """Fake a reference torch checkpoint, convert it with the CLI tool, and
    restore it into a driver state; the restored model must match the torch
    head outputs (resnet_tiny-scale resnet for speed)."""
    import sys

    for name in [m for m in sys.modules if m == "model" or m.startswith("model.")]:
        del sys.modules[name]
    sys.path.insert(0, "/root/reference/nerf_rpn")
    from tests.test_weight_parity import _install_torchvision_shim

    _install_torchvision_shim()
    import importlib

    fe = importlib.import_module("model.feature_extractor")
    anchor_mod = importlib.import_module("model.anchor")

    torch.manual_seed(0)
    backbone = fe.ResNet_FPN_256(fe.Bottleneck, [1, 1, 1, 1], input_dim=4,
                                 is_max_pool=True).eval()
    head = anchor_mod.RPNHead(256, 13, conv_depth=2, rotate=False).eval()
    ckpt_file = tmp_path / "ref.pt"
    torch.save({
        "epoch": 7,
        "backbone_state_dict": backbone.state_dict(),
        "rpn_head_state_dict": head.state_dict(),
        "train_args": {"backbone_type": "resnet"},
    }, ckpt_file)

    out_file = tmp_path / "converted.msgpack"
    from nerf_rpn_tpu.tools import convert_weights

    ckpt = convert_weights.load_torch_checkpoint(str(ckpt_file))
    variables = convert_weights.convert_rpn_checkpoint(
        ckpt, "resnet", conv_depth=2, rotated=False, layers=(1, 1, 1, 1))
    from flax.serialization import msgpack_serialize

    out_file.write_bytes(msgpack_serialize(variables))

    # restore through the checkpoint module into a live state
    from flax.core import FrozenDict
    from nerf_rpn_tpu.models.heads import RPNHead3D
    from nerf_rpn_tpu.models.resnet import ResNetFPN256
    from nerf_rpn_tpu.train.checkpoint import restore_checkpoint
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = ResNetFPN256(layers=(1, 1, 1, 1), is_max_pool=True,
                                 name="backbone")(x, train=train)
            logits, deltas = RPNHead3D(in_channels=256, num_anchors=13,
                                       conv_depth=2, name="rpn_head")(feats)
            return feats, logits, deltas

    model = Tiny()
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 32, 4)).astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tx, _ = make_optimizer(1e-3, 1)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=init_vars["params"],
                       batch_stats=init_vars["batch_stats"],
                       opt_state=tx.init(init_vars["params"]), tx=tx)
    state = restore_checkpoint(state, str(out_file))

    feats, logits, deltas = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x))

    with torch.no_grad():
        tfeats = backbone(torch.tensor(np.moveaxis(x, -1, 1).copy()))
        tlogits, tdeltas = head(list(tfeats))
    from nerf_rpn_tpu.tools.convert_weights import anchor_permutation
    from nerf_rpn_tpu.models.anchors import DEFAULT_ASPECT_RATIOS

    perm = anchor_permutation(DEFAULT_ASPECT_RATIOS[0])
    ref_l = np.transpose(tlogits[0].numpy(), (0, 2, 3, 4, 1))[..., perm]
    np.testing.assert_allclose(np.asarray(logits[0]), ref_l, rtol=5e-3,
                               atol=5e-4)

    for name in [m for m in sys.modules if m == "model" or m.startswith("model.")]:
        del sys.modules[name]
