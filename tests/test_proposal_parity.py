"""End-to-end proposal parity: reference RegionProposalNetwork inference vs
this framework's generate_proposals on the same head outputs.

This exercises the whole Recall/AP-driving chain — per-level top-k, AABB
decode, clipping, small-box/score filtering, per-level NMS, global cap —
against the actual reference torch implementation (AABB path; the rotated
path needs the CUDA extension, which is stubbed out and must not be hit).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/nerf_rpn"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_rpn():
    for name in [m for m in sys.modules
                 if m == "model" or m.startswith("model.")]:
        del sys.modules[name]

    # stub the CUDA rotated-IoU module: AABB inference must never call it
    def _must_not_call(*a, **k):
        raise AssertionError("rotated-IoU CUDA path hit in AABB test")

    fake = types.ModuleType("model.rotated_iou.oriented_iou_loss")
    for fn in ("cal_iou_3d", "cal_giou_3d", "cal_diou_3d", "box2corners_th"):
        setattr(fake, fn, _must_not_call)
    fake_pkg = types.ModuleType("model.rotated_iou")
    fake_pkg.oriented_iou_loss = fake
    sys.modules["model.rotated_iou"] = fake_pkg
    sys.modules["model.rotated_iou.oriented_iou_loss"] = fake
    sys.path.insert(0, REF)
    import importlib

    importlib.import_module("model")  # real package init
    sys.modules["model.rotated_iou"] = fake_pkg
    sys.modules["model.rotated_iou.oriented_iou_loss"] = fake
    rpn = importlib.import_module("model.rpn")
    anchor = importlib.import_module("model.anchor")
    yield rpn, anchor
    for name in [m for m in sys.modules
                 if m == "model" or m.startswith("model.")]:
        del sys.modules[name]


MESH = (64, 64, 64)
SIZES = ((8.0,), (16.0,), (32.0,), (64.0,))
RATIOS = (((1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (1.0, 2.0, 2.0), (1.0, 1.0, 3.0),
           (1.0, 3.0, 3.0)),) * 4


def test_aabb_proposal_parity(ref_rpn):
    rpn_mod, anchor_mod = ref_rpn
    from nerf_rpn_tpu.models.heads import RPNHead3D
    from nerf_rpn_tpu.models.rpn import (
        RPNConfig,
        build_level_tables,
        flatten_head_outputs,
        generate_proposals,
    )
    from nerf_rpn_tpu.tools.convert_weights import (
        anchor_permutation,
        convert_rpn_head,
    )

    torch.manual_seed(0)
    gen = anchor_mod.AnchorGenerator3D(SIZES, RATIOS)
    head = anchor_mod.RPNHead(16, 13, conv_depth=1, rotate=False).eval()
    ref = rpn_mod.RegionProposalNetwork(
        gen, head,
        fg_iou_thresh=0.35, bg_iou_thresh=0.2,
        batch_size_per_mesh=32, positive_fraction=0.5,
        pre_nms_top_n=dict(training=64, testing=64),
        post_nms_top_n=dict(training=32, testing=32),
        nms_thresh=0.3, score_thresh=0.0,
    ).eval()

    # random FPN features for strides 4..32 over a 64^3 mesh
    rng = np.random.default_rng(0)
    feats_np = [
        rng.normal(size=(1, *(s,) * 3, 16)).astype(np.float32) * 0.5
        for s in (16, 8, 4, 2)
    ]
    meshes = torch.zeros(1, 4, *MESH)
    feats_t = [torch.tensor(np.moveaxis(f, -1, 1).copy()) for f in feats_np]
    with torch.no_grad():
        boxes, level_idx, losses, scores = ref(
            meshes, feats_t, [MESH], targets=None)
    ref_boxes = boxes[0].numpy()
    ref_scores = scores[0].numpy()

    # ours: converted head weights over the same features
    cfg = RPNConfig(anchor_sizes=SIZES, aspect_ratios=RATIOS,
                    pre_nms_top_n=64, post_nms_top_n=32, nms_thresh=0.3)
    anchors, _, strides, counts = build_level_tables(
        cfg, MESH, [(16,) * 3, (8,) * 3, (4,) * 3, (2,) * 3])
    params = convert_rpn_head(
        {k: v.numpy() for k, v in head.state_dict().items()},
        conv_depth=1, ratios=RATIOS[0], rotated=False)
    jhead = RPNHead3D(in_channels=16, num_anchors=13, conv_depth=1,
                      rotate=False)
    logits, deltas = jhead.apply(
        {"params": params}, [jnp.asarray(f) for f in feats_np])

    # reference anchor order within each location differs by the set-vs-
    # insertion permutation; reorder OUR flattened outputs to compare against
    # the reference anchors by permuting head channels already handled by
    # convert_rpn_head — outputs are in OUR anchor order matching OUR tables.
    obj, dl = flatten_head_outputs(logits, deltas, 6)
    out = generate_proposals(cfg, obj, dl, jnp.asarray(anchors), counts, MESH)
    v = np.asarray(out["valid"][0])
    our_boxes = np.asarray(out["boxes"][0])[v]
    our_scores = np.asarray(out["scores"][0])[v]

    assert len(ref_boxes) == len(our_boxes), (len(ref_boxes), len(our_boxes))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(our_boxes, ref_boxes, rtol=1e-3, atol=1e-3)
