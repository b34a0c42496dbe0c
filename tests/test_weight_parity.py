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


def _sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2,
                        reduction="none"):
    """torchvision.ops.sigmoid_focal_loss, verbatim semantics (needed at
    import time by reference ``model/fcos/loss.py:18``)."""
    import torch.nn.functional as F

    p = torch.sigmoid(inputs)
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def _install_torchvision_shim():
    """The reference imports torchvision.ops.{stochastic_depth,misc}; provide
    behaviour-compatible minimal stand-ins (StochasticDepth is identity in
    eval mode; MLP mirrors torchvision's Linear/act/dropout stack)."""
    if "torchvision" in sys.modules:
        # an earlier install may predate sigmoid_focal_loss; patch it in
        ops = sys.modules.get("torchvision.ops")
        if ops is not None and not hasattr(ops, "sigmoid_focal_loss"):
            ops.sigmoid_focal_loss = _sigmoid_focal_loss
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
    ops.sigmoid_focal_loss = _sigmoid_focal_loss
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


@pytest.fixture(scope="module")
def ref_fcos(ref_models):
    """Reference ``model.fcos.fcos`` importable on CPU: needs the
    torchvision shim (sigmoid_focal_loss) + a fake ``sort_vertices``
    extension (imported transitively via fcos/loss.py -> rotated_iou)."""
    from tests.test_proposal_parity_rotated import _np_sort_vertices

    fake_ext = types.ModuleType("sort_vertices")
    fake_ext.sort_vertices_forward = _np_sort_vertices
    sys.modules.setdefault("sort_vertices", fake_ext)
    import importlib

    fcos_mod = importlib.import_module("model.fcos.fcos")
    fcos_inf = importlib.import_module("model.fcos.inference")
    # the reference postprocessor force-bounces through .cuda()
    # (model/fcos/utils.py analogue of utils.py:410-413); run on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield fcos_mod, fcos_inf
    finally:
        torch.Tensor.cuda = orig_cuda


@pytest.mark.parametrize("use_obb", [False, True])
def test_fcos_head_converted_parity(ref_models, ref_fcos, use_obb):
    """Converted ``fcos_state_dict`` head weights -> per-level cls / bbox /
    centerness forward parity vs reference ``FCOSHead``
    (``model/fcos/fcos.py:27-130``), eval mode (norm_reg_targets relu +
    stride multiply), both AABB and OBB output layouts."""
    fcos_mod, _ = ref_fcos
    torch.manual_seed(4)
    strides = [4, 8, 16, 32]
    ref = fcos_mod.FCOSHead(in_channels=32, num_convs=2, fpn_strides=strides,
                            norm_reg_targets=True, centerness_on_reg=True,
                            use_obb=use_obb).eval()
    # re-randomise past the std=0.01 init so the comparison is non-trivial
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.3)

    from nerf_rpn_tpu.models.heads import FCOSHead3D
    from nerf_rpn_tpu.tools.convert_weights import convert_fcos_head

    params = convert_fcos_head(_sd_numpy(ref), num_convs=2)
    head = FCOSHead3D(in_channels=32, num_convs=2, rotate=use_obb,
                      centerness_on_reg=True, norm_reg_targets=True,
                      fpn_strides=tuple(strides))

    rng = np.random.default_rng(4)
    # no 1^3 level: torch group_norm rejects single-value-per-channel
    # inputs, and real strides-4..32 pyramids never produce one
    feats = [rng.normal(size=(1, s, s, s, 32)).astype(np.float32)
             for s in (8, 4, 2, 2)]
    with torch.no_grad():
        ref_cls, ref_reg, ref_ctr = ref([_to_torch_in(f) for f in feats])
    cls, reg, ctr = head.apply(
        {"params": params}, [jnp.asarray(f) for f in feats], train=False)
    for lvl in range(4):
        np.testing.assert_allclose(
            _from_torch_out(ref_cls[lvl]), np.asarray(cls[lvl]),
            rtol=2e-3, atol=2e-4, err_msg=f"cls level {lvl}")
        np.testing.assert_allclose(
            _from_torch_out(ref_ctr[lvl]), np.asarray(ctr[lvl]),
            rtol=2e-3, atol=2e-4, err_msg=f"ctr level {lvl}")
        np.testing.assert_allclose(
            _from_torch_out(ref_reg[lvl]), np.asarray(reg[lvl]),
            rtol=2e-3, atol=2e-3, err_msg=f"reg level {lvl}")


def test_fcos_converted_checkpoint_end_to_end(ref_models, ref_fcos):
    """The released-weight ``{dataset}_fcos_{backbone}`` layout end to end:
    a reference-built checkpoint dict ``{backbone_state_dict,
    fcos_state_dict}`` through ``convert_fcos_checkpoint`` -> full jax
    forward parity -> ``fcos_inference`` output vs the reference
    ``FCOSPostProcessor`` on the reference model's own outputs."""
    fe, _ = ref_models
    fcos_mod, fcos_inf = ref_fcos
    torch.manual_seed(5)
    strides = [4, 8, 16, 32]
    backbone = fe.ResNet_FPN_256(fe.Bottleneck, [1, 1, 1, 1], input_dim=4,
                                 is_max_pool=True).eval()
    head = fcos_mod.FCOSHead(in_channels=256, num_convs=2,
                             fpn_strides=strides, norm_reg_targets=True,
                             centerness_on_reg=True, use_obb=True).eval()
    with torch.no_grad():
        for p in head.parameters():
            p.normal_(0.0, 0.2)
    ckpt = {
        "backbone_state_dict": {k: v.numpy()
                                for k, v in backbone.state_dict().items()},
        # released checkpoints store the FCOSModule: head weights under
        # ``head.*`` (run_fcos.py:248-262)
        "fcos_state_dict": {f"head.{k}": v.numpy()
                            for k, v in head.state_dict().items()},
    }

    from nerf_rpn_tpu.models.fcos import (
        FCOSConfig,
        fcos_inference,
        fcos_locations,
        flatten_fcos_outputs,
    )
    from nerf_rpn_tpu.models.heads import FCOSHead3D
    from nerf_rpn_tpu.models.resnet import ResNetFPN256
    from nerf_rpn_tpu.tools.convert_weights import convert_fcos_checkpoint

    variables = convert_fcos_checkpoint(ckpt, "resnet", num_convs=2,
                                        layers=(1, 1, 1, 1))

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = ResNetFPN256(layers=(1, 1, 1, 1), is_max_pool=True,
                                 name="backbone")(x, train=train)
            return FCOSHead3D(in_channels=256, num_convs=2, rotate=True,
                              centerness_on_reg=True, norm_reg_targets=True,
                              fpn_strides=tuple(strides),
                              name="fcos_head")(feats, train=train)

    # 64^3 keeps the stride-32 level at 2^3 (torch group_norm rejects 1^3)
    mesh = (64, 64, 64)
    x = np.random.default_rng(5).normal(
        size=(1, *mesh, 4)).astype(np.float32)
    cls, reg, ctr = Tiny().apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, jnp.asarray(x))

    with torch.no_grad():
        tfeats = backbone(_to_torch_in(x))
        ref_cls, ref_reg, ref_ctr = head(list(tfeats))
    for lvl in range(4):
        np.testing.assert_allclose(
            _from_torch_out(ref_cls[lvl]), np.asarray(cls[lvl]),
            rtol=5e-3, atol=5e-4, err_msg=f"cls level {lvl}")
        np.testing.assert_allclose(
            _from_torch_out(ref_ctr[lvl]), np.asarray(ctr[lvl]),
            rtol=5e-3, atol=5e-4, err_msg=f"ctr level {lvl}")
        np.testing.assert_allclose(
            _from_torch_out(ref_reg[lvl]), np.asarray(reg[lvl]),
            rtol=5e-3, atol=5e-3, err_msg=f"reg level {lvl}")

    # end-to-end eval: our fcos_inference on our converted-model outputs vs
    # the reference postprocessor on the reference model's outputs
    level_shapes = [tuple(f.shape[1:4]) for f in cls]
    locations, _, counts, _, _ = fcos_locations(level_shapes, strides)
    cfg = FCOSConfig(rotated=True, pre_nms_thresh=0.1, pre_nms_top_n=64,
                     fpn_post_nms_top_n=32, nms_thresh=0.3, min_size=1e-3)
    out = fcos_inference(
        cfg,
        flatten_fcos_outputs(cls, 1),
        flatten_fcos_outputs(reg, 8),
        flatten_fcos_outputs(ctr, 1),
        jnp.asarray(locations), counts,
        jnp.asarray([mesh], jnp.int32),
    )
    post = fcos_inf.FCOSPostProcessor(
        pre_nms_thresh=0.1, pre_nms_top_n=64, nms_thresh=0.3,
        fpn_post_nms_top_n=32, min_size=1e-3, num_classes=2, use_obb=True)
    locs_t, off = [], 0
    for c in counts:
        locs_t.append(torch.tensor(np.asarray(locations[off:off + c])))
        off += c
    with torch.no_grad():
        boxes_res, scores_res = post(
            locs_t, ref_cls, ref_reg, ref_ctr, [mesh], None)
    ref_boxes = boxes_res[0].numpy()
    ref_scores = scores_res[0].numpy()
    v = np.asarray(out["valid"][0])
    our_boxes = np.asarray(out["boxes"][0])[v]
    our_scores = np.asarray(out["scores"][0])[v]
    assert len(ref_boxes) == len(our_boxes), (len(ref_boxes), len(our_boxes))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(our_boxes[:, :3], ref_boxes[:, 1:4],
                               rtol=1e-2, atol=5e-2)
    np.testing.assert_allclose(np.sort(our_boxes[:, 3:5], -1),
                               np.sort(ref_boxes[:, 4:6], -1),
                               rtol=1e-2, atol=5e-2)
    np.testing.assert_allclose(our_boxes[:, 5], ref_boxes[:, 6],
                               rtol=1e-2, atol=5e-2)


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
