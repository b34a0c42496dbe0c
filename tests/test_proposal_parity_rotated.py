"""End-to-end ROTATED (OBB) proposal parity vs the reference torch code.

Covers the chain VERDICT r1 flagged as untested: OBB decode (midpoint-offset)
-> clip-by-center -> rotated NMS (``/root/reference/nerf_rpn/model/rpn.py:303-370``
with the forced-CUDA OBB IoU at ``model/utils.py:410-413``) and the FCOS OBB
inference path (``model/fcos/inference.py:48-195``).

The reference needs CUDA for (a) the ``sort_vertices`` extension inside the
rotated-IoU polygon clip and (b) explicit ``.cuda()`` bounces.  Here the
extension is replaced by a numpy implementation of the kernel's *contract*
(CCW-sort the valid clipped-polygon vertices around their centroid, wrap the
first index, pad with an invalid-intersection slot — the shoelace area is
invariant to cyclic rotation/orientation so any consistent CCW order
reproduces the CUDA kernel's areas, including its identical-box dedup corner
case, ``sort_vert_kernel.cu:110-129``), and ``Tensor.cuda`` is patched to a
no-op so everything runs on CPU.
"""

import importlib
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


# ---------------------------------------------------------------------------
# numpy stand-in for the CUDA sort_vertices extension
# ---------------------------------------------------------------------------


def _np_sort_vertices(vertices, mask, num_valid):
    """Emulates ``sort_vertices.sort_vertices_forward`` on CPU.

    vertices: (B, N, 24, 2) float, already centroid-normalised.
    mask:     (B, N, 24) bool.
    num_valid:(B, N) int.
    Returns (B, N, 9) int64 indices: valid vertices in CCW order, first index
    duplicated after the last valid one, remaining slots = an invalid
    *intersection* index (>= 8, value (0,0) in the unnormalised tensor).
    """
    v = vertices.detach().cpu().numpy()
    m = mask.detach().cpu().numpy().astype(bool)
    nv = num_valid.detach().cpu().numpy()
    B, N, M, _ = v.shape
    assert M == 24

    # pad slot: first invalid intersection index (kernel scans j >= 8)
    pad = 8 + np.argmin(m[..., 8:], axis=-1)  # first False (always exists)

    # dedup identical coordinates (identical-box corner case): a vertex equal
    # to an earlier valid vertex is dropped, as the kernel's strict comparator
    # never re-takes an equal vertex
    dx = np.abs(v[..., :, None, 0] - v[..., None, :, 0])
    dy = np.abs(v[..., :, None, 1] - v[..., None, :, 1])
    same = (dx < 1e-8) & (dy < 1e-8)  # [j, k]
    earlier = np.tril(np.ones((M, M), bool), -1)  # k < j
    dup = (same & earlier[None, None] & m[..., None, :]).any(-1)
    valid = m & ~dup

    ang = np.arctan2(v[..., 1], v[..., 0])
    key = np.where(valid, ang, np.inf)
    order = np.argsort(key, axis=-1)  # CCW; invalid pushed to the end
    counts = valid.sum(-1)

    j = np.arange(9)
    idx = np.where(j < counts[..., None], order[..., :9], pad[..., None])
    idx = np.where(j == counts[..., None], order[..., :1], idx)  # wrap
    idx = np.where((nv < 3)[..., None], pad[..., None], idx)
    return torch.from_numpy(np.ascontiguousarray(idx)).long()


@pytest.fixture(scope="module")
def ref_rotated():
    """Reference model package importable + runnable on CPU."""
    for name in [m for m in sys.modules
                 if m == "model" or m.startswith("model.")]:
        del sys.modules[name]

    fake_ext = types.ModuleType("sort_vertices")
    fake_ext.sort_vertices_forward = _np_sort_vertices
    sys.modules["sort_vertices"] = fake_ext
    sys.path.insert(0, REF)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        rpn = importlib.import_module("model.rpn")
        anchor = importlib.import_module("model.anchor")
        fcos_inf = importlib.import_module("model.fcos.inference")
        oil = importlib.import_module("model.rotated_iou.oriented_iou_loss")
        yield rpn, anchor, fcos_inf, oil
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.modules.pop("sort_vertices", None)
        sys.path.remove(REF)
        for name in [m for m in sys.modules
                     if m == "model" or m.startswith("model.")]:
            del sys.modules[name]


# ---------------------------------------------------------------------------
# sanity: the numpy sort reproduces reference rotated IoU values
# ---------------------------------------------------------------------------


def test_reference_rotated_iou_matches_ours(ref_rotated):
    from nerf_rpn_tpu.ops.rotated_iou import iou_rotated_3d

    _, _, _, oil = ref_rotated
    rng = np.random.default_rng(3)
    n = 64
    boxes1 = np.stack([
        rng.uniform(5, 30, n), rng.uniform(5, 30, n), rng.uniform(5, 30, n),
        rng.uniform(2, 12, n), rng.uniform(2, 12, n), rng.uniform(2, 12, n),
        rng.uniform(-np.pi / 2, np.pi / 2, n),
    ], -1).astype(np.float32)
    boxes2 = boxes1 + rng.normal(0, 2, boxes1.shape).astype(np.float32)
    boxes2[:, 3:6] = np.abs(boxes2[:, 3:6]) + 0.5
    # include the identical-box corner case
    boxes2[:4] = boxes1[:4]

    with torch.no_grad():
        ref_iou = oil.cal_iou_3d(
            torch.tensor(boxes1)[None], torch.tensor(boxes2)[None]
        )[0].numpy()
    ours = np.asarray(iou_rotated_3d(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    np.testing.assert_allclose(ours, ref_iou, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ref_iou[:4], 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# rotated anchor-RPN proposal parity
# ---------------------------------------------------------------------------

MESH = (64, 64, 64)
SIZES = ((8.0,), (16.0,), (32.0,), (64.0,))
RATIOS = (((1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (1.0, 2.0, 2.0), (1.0, 1.0, 3.0),
           (1.0, 3.0, 3.0)),) * 4


def test_obb_proposal_parity(ref_rotated):
    rpn_mod, anchor_mod, _, _ = ref_rotated
    from nerf_rpn_tpu.models.heads import RPNHead3D
    from nerf_rpn_tpu.models.rpn import (
        RPNConfig,
        build_level_tables,
        flatten_head_outputs,
        generate_proposals,
    )
    from nerf_rpn_tpu.tools.convert_weights import convert_rpn_head

    torch.manual_seed(0)
    gen = anchor_mod.AnchorGenerator3D(SIZES, RATIOS)
    head = anchor_mod.RPNHead(16, 13, conv_depth=1, rotate=True).eval()
    with torch.no_grad():
        # spread the objectness logits: at N(0, 0.01) init every sigmoid
        # score bunches at 0.5 within ~1e-3 and greedy-NMS ordering becomes
        # numerically fragile (any float noise reorders near-ties); both
        # sides below run from this same scaled state dict
        head.cls_logits.weight.mul_(100.0)
        # nudge all decoded centres strictly inside the mesh: reference
        # anchors sit at stride*i so 0-face anchors have centres exactly on
        # the boundary and decode OOB ~50% of the time, which triggers the
        # reference's clip/score misalignment bug (clip_boxes_to_mesh OBB
        # filters boxes but filter_proposals keeps unfiltered scores,
        # model/rpn.py:348-356 + model/utils.py:360-367) — parity is only
        # well-defined while that bug is dormant (nothing dropped)
        bias = head.bbox_pred.bias.view(13, 8)
        bias[:, 0:3] = 0.02
    ref = rpn_mod.RegionProposalNetwork(
        gen, head,
        fg_iou_thresh=0.35, bg_iou_thresh=0.2,
        batch_size_per_mesh=32, positive_fraction=0.5,
        pre_nms_top_n=dict(training=64, testing=64),
        post_nms_top_n=dict(training=32, testing=32),
        nms_thresh=0.3, score_thresh=0.0,
        rotated_bbox=True,
    ).eval()

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
    assert len(ref_boxes) == 32

    cfg = RPNConfig(rotated=True, anchor_sizes=SIZES, aspect_ratios=RATIOS,
                    pre_nms_top_n=64, post_nms_top_n=32, nms_thresh=0.3)
    anchors, _, strides, counts = build_level_tables(
        cfg, MESH, [(16,) * 3, (8,) * 3, (4,) * 3, (2,) * 3])
    params = convert_rpn_head(
        {k: v.numpy() for k, v in head.state_dict().items()},
        conv_depth=1, ratios=RATIOS[0], rotated=True)
    jhead = RPNHead3D(in_channels=16, num_anchors=13, conv_depth=1,
                      rotate=True)
    logits, deltas = jhead.apply(
        {"params": params}, [jnp.asarray(f) for f in feats_np])

    obj, dl = flatten_head_outputs(logits, deltas, 8)

    # precondition for comparability: no decoded centre may leave the mesh,
    # otherwise the reference's misalignment bug (see above) fires
    all_decoded = np.asarray(cfg.decode(dl, jnp.asarray(anchors)[None]))
    ctrs = all_decoded[0, :, :3]
    assert ctrs.min() > 0 and ctrs.max() < 64, (ctrs.min(), ctrs.max())

    out = generate_proposals(cfg, obj, dl, jnp.asarray(anchors), counts, MESH)
    v = np.asarray(out["valid"][0])
    our_boxes = np.asarray(out["boxes"][0])[v]
    our_scores = np.asarray(out["scores"][0])[v]

    assert len(ref_boxes) == len(our_boxes), (len(ref_boxes), len(our_boxes))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-4, atol=1e-5)
    # theta may differ by pi with (w, l) swapped under regularisation ties;
    # compare boxes canonically: centres+sizes directly, orientation via the
    # direction of the first midpoint
    np.testing.assert_allclose(our_boxes[:, :3], ref_boxes[:, :3],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.sort(our_boxes[:, 3:5], -1),
                               np.sort(ref_boxes[:, 3:5], -1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(our_boxes[:, 5], ref_boxes[:, 5],
                               rtol=1e-3, atol=1e-3)
    dtheta = np.abs(our_boxes[:, 6] - ref_boxes[:, 6])
    dtheta = np.minimum(dtheta, np.abs(dtheta - np.pi / 2))
    dtheta = np.minimum(dtheta, np.abs(dtheta - np.pi))
    assert np.all(dtheta < 1e-3), dtheta.max()


# ---------------------------------------------------------------------------
# FCOS OBB inference parity
# ---------------------------------------------------------------------------


def test_fcos_obb_inference_parity(ref_rotated):
    _, _, fcos_inf, _ = ref_rotated
    from nerf_rpn_tpu.models.fcos import (
        FCOSConfig,
        fcos_inference,
        fcos_locations,
        flatten_fcos_outputs,
    )

    level_shapes = [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]
    strides = [4, 8, 16, 32]
    mesh = (32, 32, 32)
    rng = np.random.default_rng(1)

    cls_np = [rng.normal(0, 1, (1, 1, *s)).astype(np.float32)
              for s in level_shapes]
    ctr_np = [rng.normal(0, 1, (1, 1, *s)).astype(np.float32)
              for s in level_shapes]
    # distances positive and box-like; midpoint offsets small
    reg_np = []
    for s in level_shapes:
        r = rng.uniform(1.0, 8.0, (1, 8, *s)).astype(np.float32)
        r[:, 6:] = rng.uniform(-0.4, 0.4, (1, 2, *s)).astype(np.float32)
        reg_np.append(r)

    post = fcos_inf.FCOSPostProcessor(
        pre_nms_thresh=0.3, pre_nms_top_n=64, nms_thresh=0.3,
        fpn_post_nms_top_n=32, min_size=0.1, num_classes=2, use_obb=True,
    )
    locs_t = []
    locations, _, counts, _, _ = fcos_locations(level_shapes, strides)
    off = 0
    for c in counts:
        locs_t.append(torch.tensor(np.asarray(locations[off:off + c])))
        off += c
    with torch.no_grad():
        boxes_res, scores_res = post(
            locs_t,
            [torch.tensor(c) for c in cls_np],
            [torch.tensor(r) for r in reg_np],
            [torch.tensor(c) for c in ctr_np],
            [mesh], None,
        )
    ref_boxes = boxes_res[0].numpy()           # (K, 1+7): level idx column 0
    ref_scores = scores_res[0].numpy()

    cfg = FCOSConfig(rotated=True, pre_nms_thresh=0.3, pre_nms_top_n=64,
                     fpn_post_nms_top_n=32, nms_thresh=0.3, min_size=0.1)
    to_last = lambda a: jnp.asarray(np.moveaxis(a, 1, -1))
    cls = flatten_fcos_outputs([to_last(c) for c in cls_np], 1)
    reg = flatten_fcos_outputs([to_last(r) for r in reg_np], 8)
    ctr = flatten_fcos_outputs([to_last(c) for c in ctr_np], 1)
    out = fcos_inference(
        cfg, cls, reg, ctr, jnp.asarray(locations), counts,
        jnp.asarray([mesh], jnp.int32),
    )
    v = np.asarray(out["valid"][0])
    our_boxes = np.asarray(out["boxes"][0])[v]
    our_scores = np.asarray(out["scores"][0])[v]
    our_levels = np.asarray(out["level_idx"][0])[v]

    assert len(ref_boxes) == len(our_boxes), (len(ref_boxes), len(our_boxes))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(our_levels, ref_boxes[:, 0], atol=0)
    np.testing.assert_allclose(our_boxes, ref_boxes[:, 1:],
                               rtol=1e-3, atol=1e-3)
