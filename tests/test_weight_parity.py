"""Converted-weight parity: reference torch modules vs this framework.

Builds the ACTUAL reference torch models (imported from /root/reference,
with a tiny torchvision shim since that package isn't installed), randomly
initialises them, converts the state dicts with ``tools/convert_weights``,
and checks the jax forward matches the torch forward on the same input.
This is the acceptance-gate mechanism for loading released pretrained
weights (SURVEY 5.4).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/nerf_rpn"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")


def _install_torchvision_shim():
    """The reference imports torchvision.ops.{stochastic_depth,misc}; provide
    behaviour-compatible minimal stand-ins (StochasticDepth is identity in
    eval mode; MLP mirrors torchvision's Linear/act/dropout stack)."""
    if "torchvision" in sys.modules:
        return
    from torch import nn

    class StochasticDepth(nn.Module):
        def __init__(self, p, mode):
            super().__init__()
            self.p = p

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1 - self.p
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1))) < keep
            return x * mask / keep

    class Permute(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = dims

        def forward(self, x):
            return torch.permute(x, self.dims)

    class MLP(nn.Sequential):
        def __init__(self, in_channels, hidden_channels, activation_layer=nn.ReLU,
                     inplace=None, bias=True, dropout=0.0):
            layers = []
            in_dim = in_channels
            for h in hidden_channels[:-1]:
                layers.append(nn.Linear(in_dim, h, bias=bias))
                layers.append(activation_layer())
                layers.append(nn.Dropout(dropout))
                in_dim = h
            layers.append(nn.Linear(in_dim, hidden_channels[-1], bias=bias))
            layers.append(nn.Dropout(dropout))
            super().__init__(*layers)

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    sd_mod = types.ModuleType("torchvision.ops.stochastic_depth")
    sd_mod.StochasticDepth = StochasticDepth
    misc = types.ModuleType("torchvision.ops.misc")
    misc.MLP = MLP
    misc.Permute = Permute
    ops.stochastic_depth = sd_mod
    ops.misc = misc
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.stochastic_depth"] = sd_mod
    sys.modules["torchvision.ops.misc"] = misc


@pytest.fixture(scope="module")
def ref_models():
    _install_torchvision_shim()
    # purge fakes other test modules may have seeded under the 'model' name
    for name in [m for m in sys.modules if m == "model" or m.startswith("model.")]:
        del sys.modules[name]
    sys.path.insert(0, REF)
    import importlib

    fe = importlib.import_module("model.feature_extractor")
    anchor = importlib.import_module("model.anchor")
    return fe, anchor


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _to_torch_in(x_jax):
    """(B, X, Y, Z, C) numpy -> torch (B, C, X, Y, Z)."""
    return torch.from_numpy(np.transpose(x_jax, (0, 4, 1, 2, 3)).copy())


def _from_torch_out(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))


def test_resnet_fpn256_parity(ref_models):
    fe, _ = ref_models
    torch.manual_seed(0)
    ref = fe.ResNet_FPN_256(fe.Bottleneck, [1, 1, 1, 1], input_dim=4,
                            is_max_pool=True).eval()
    from nerf_rpn_tpu.models.resnet import ResNetFPN256
    from nerf_rpn_tpu.tools.convert_weights import convert_resnet_fpn256

    params, stats = convert_resnet_fpn256(_sd_numpy(ref), layers=(1, 1, 1, 1))
    model = ResNetFPN256(layers=(1, 1, 1, 1), is_max_pool=True)

    x = np.random.default_rng(0).normal(size=(1, 32, 32, 32, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_to_torch_in(x))
    ours = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    assert len(ref_out) == len(ours)
    for r, o in zip(ref_out, ours):
        np.testing.assert_allclose(
            _from_torch_out(r), np.asarray(o), rtol=2e-3, atol=2e-4)


def test_vgg_fpn_parity(ref_models):
    fe, _ = ref_models
    torch.manual_seed(1)
    ref = fe.VGG_FPN("AF", 4, True, 32).eval()
    from nerf_rpn_tpu.models.vgg import VGGFPN
    from nerf_rpn_tpu.tools.convert_weights import convert_vgg_fpn

    params, stats = convert_vgg_fpn(_sd_numpy(ref), cfg="AF", input_size=32)
    model = VGGFPN(cfg="AF", input_size=32)
    x = np.random.default_rng(1).normal(size=(1, 16, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_to_torch_in(x))
    ours = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    for r, o in zip(ref_out, ours):
        np.testing.assert_allclose(
            _from_torch_out(r), np.asarray(o), rtol=2e-3, atol=2e-4)


def test_swin_fpn_parity(ref_models):
    fe, _ = ref_models
    torch.manual_seed(2)
    ref = fe.SwinTransformer_FPN(
        patch_size=[4, 4, 4], embed_dim=8, depths=[2, 2], num_heads=[2, 4],
        window_size=[4, 4, 4], stochastic_depth_prob=0.1, expand_dim=True,
    ).eval()
    from nerf_rpn_tpu.models.swin import SwinFPN
    from nerf_rpn_tpu.tools.convert_weights import convert_swin_fpn

    params, _ = convert_swin_fpn(_sd_numpy(ref), depths=(2, 2))
    model = SwinFPN(embed_dim=8, depths=(2, 2), num_heads=(2, 4))
    x = np.random.default_rng(2).normal(size=(1, 16, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_to_torch_in(x))
    ours = model.apply({"params": params}, jnp.asarray(x))
    for r, o in zip(ref_out, ours):
        np.testing.assert_allclose(
            _from_torch_out(r), np.asarray(o), rtol=3e-3, atol=5e-4)


def test_rpn_head_parity_with_anchor_permutation(ref_models):
    fe, anchor_mod = ref_models
    torch.manual_seed(3)
    from nerf_rpn_tpu.models.anchors import DEFAULT_ASPECT_RATIOS

    ratios = DEFAULT_ASPECT_RATIOS[0]
    ref = anchor_mod.RPNHead(16, 13, conv_depth=2, rotate=True).eval()
    from nerf_rpn_tpu.models.heads import RPNHead3D
    from nerf_rpn_tpu.tools.convert_weights import (
        anchor_permutation,
        convert_rpn_head,
    )

    params = convert_rpn_head(_sd_numpy(ref), conv_depth=2, ratios=ratios,
                              rotated=True)
    head = RPNHead3D(in_channels=16, num_anchors=13, conv_depth=2, rotate=True)
    x = np.random.default_rng(3).normal(size=(1, 8, 8, 8, 16)).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_deltas = ref([_to_torch_in(x)])
    logits, deltas = head.apply({"params": params}, [jnp.asarray(x)])

    perm = anchor_permutation(ratios)
    # reference channel a corresponds to our channel j where perm[j] = a
    ref_l = _from_torch_out(ref_logits[0])[..., perm]
    np.testing.assert_allclose(ref_l, np.asarray(logits[0]), rtol=2e-3, atol=1e-5)
    ref_d = _from_torch_out(ref_deltas[0]).reshape(1, 8, 8, 8, 13, 8)[..., perm, :]
    np.testing.assert_allclose(
        ref_d.reshape(1, 8, 8, 8, -1), np.asarray(deltas[0]), rtol=2e-3, atol=1e-5)


def test_anchor_set_identical(ref_models):
    """Our insertion-order anchors = reference set-order anchors as SETS,
    and the permutation maps one onto the other exactly."""
    _, anchor_mod = ref_models
    from nerf_rpn_tpu.models.anchors import (
        DEFAULT_ANCHOR_SIZES,
        DEFAULT_ASPECT_RATIOS,
        base_anchors,
    )
    from nerf_rpn_tpu.tools.convert_weights import anchor_permutation

    gen = anchor_mod.AnchorGenerator3D(DEFAULT_ANCHOR_SIZES, DEFAULT_ASPECT_RATIOS)
    ref_base = gen.generate_anchors(
        DEFAULT_ANCHOR_SIZES[0], DEFAULT_ASPECT_RATIOS[0]).numpy()
    ours = base_anchors(DEFAULT_ANCHOR_SIZES[0], DEFAULT_ASPECT_RATIOS[0])
    perm = anchor_permutation(DEFAULT_ASPECT_RATIOS[0])
    np.testing.assert_allclose(ref_base[perm], ours)
