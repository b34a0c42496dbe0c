"""Metric parity vs the actual reference eval.py (torch).

The reference's ``eval.py`` only needs ``box_iou_3d`` from its model package
(whose import chain requires the CUDA extension), so we pre-seed fake
``model``/``model.utils`` modules with a pure-torch AABB IoU and import the
real metric code.  Random proposals/gt then must score identically under
both implementations — the golden test for Recall/AR/AP semantics.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/nerf_rpn"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "eval.py")),
    reason="reference repo not mounted",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_eval():
    def box_iou_3d(boxes1, boxes2):
        v1 = ((boxes1[:, 3] - boxes1[:, 0]) * (boxes1[:, 4] - boxes1[:, 1])
              * (boxes1[:, 5] - boxes1[:, 2]))
        v2 = ((boxes2[:, 3] - boxes2[:, 0]) * (boxes2[:, 4] - boxes2[:, 1])
              * (boxes2[:, 5] - boxes2[:, 2]))
        lt = torch.max(boxes1[:, None, :3], boxes2[:, :3])
        rb = torch.min(boxes1[:, None, 3:], boxes2[:, 3:])
        whd = (rb - lt).clamp(min=0)
        inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
        return inter / (v1[:, None] + v2 - inter)

    # purge real/other 'model' modules so eval.py binds to the fakes,
    # and restore a clean slate afterwards for other test modules
    for name in [m for m in sys.modules
                 if m in ("model", "eval") or m.startswith("model.")]:
        del sys.modules[name]
    fake_pkg = types.ModuleType("model")
    fake_utils = types.ModuleType("model.utils")
    fake_utils.box_iou_3d = box_iou_3d
    fake_utils.print_shape = lambda *a, **k: None
    fake_pkg.utils = fake_utils
    sys.modules["model"] = fake_pkg
    sys.modules["model.utils"] = fake_utils
    sys.path.insert(0, REF)
    import importlib

    mod = importlib.import_module("eval")
    yield mod
    for name in [m for m in sys.modules
                 if m in ("model", "eval") or m.startswith("model.")]:
        del sys.modules[name]


def _random_data(seed, scenes=3, props=40, gts=5):
    rng = np.random.default_rng(seed)
    proposals, scores, gt = [], [], []
    for _ in range(scenes):
        lo = rng.uniform(0, 40, (props, 3))
        sz = rng.uniform(2, 20, (props, 3))
        p = np.concatenate([lo, lo + sz], -1).astype(np.float32)
        glo = rng.uniform(0, 40, (gts, 3))
        gsz = rng.uniform(4, 20, (gts, 3))
        g = np.concatenate([glo, glo + gsz], -1).astype(np.float32)
        # make some proposals near-hits so recall isn't trivially 0
        p[:gts] = g + rng.uniform(-1.5, 1.5, (gts, 6)).astype(np.float32)
        proposals.append(p)
        scores.append(rng.uniform(0, 1, props).astype(np.float32))
        gt.append(g)
    return proposals, scores, gt


def test_recall_parity(ref_eval):
    from nerf_rpn_tpu.evaluation.metrics import evaluate_box_proposals_recall

    proposals, scores, gt = _random_data(0)
    for limit in (10, None):
        ref = ref_eval.evaluate_box_proposals_recall(
            [torch.tensor(p) for p in proposals],
            [torch.tensor(s) for s in scores],
            [torch.tensor(g) for g in gt],
            thresholds=torch.arange(0.25, 1.0, 0.05), limit=limit)
        ours = evaluate_box_proposals_recall(
            proposals, scores, gt, thresholds=np.arange(0.25, 1.0, 0.05),
            limit=limit)
        np.testing.assert_allclose(ours["recalls"], ref["recalls"].numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(ours["ar"], float(ref["ar"]), atol=1e-6)
        assert ours["num_pos"] == ref["num_pos"]


def test_ap_parity(ref_eval):
    from nerf_rpn_tpu.evaluation.metrics import evaluate_box_proposals_ap

    proposals, scores, gt = _random_data(1)
    for iou_thresh in (0.25, 0.5):
        for top_k in (None, 15):
            ref = ref_eval.evaluate_box_proposals_ap(
                [torch.tensor(p) for p in proposals],
                [torch.tensor(s) for s in scores],
                [torch.tensor(g) for g in gt],
                iou_thresh=iou_thresh, top_k=top_k)
            ours = evaluate_box_proposals_ap(
                proposals, scores, gt, iou_thresh=iou_thresh, top_k=top_k)
            np.testing.assert_allclose(ours["ap"], float(ref["ap"]), atol=1e-6)


def test_precision_parity(ref_eval):
    from nerf_rpn_tpu.evaluation.metrics import evaluate_box_proposals_precision

    proposals, scores, gt = _random_data(2)
    ref = ref_eval.evaluate_box_proposals_precision(
        [torch.tensor(p) for p in proposals],
        [torch.tensor(s) for s in scores],
        [torch.tensor(g) for g in gt],
        score_thresh=0.3, limit=20)
    ours = evaluate_box_proposals_precision(
        proposals, scores, gt, score_thresh=0.3, limit=20)
    np.testing.assert_allclose(ours["precisions"], ref["precisions"].numpy(),
                               atol=1e-6)
    assert ours["num_det"] == ref["num_det"]


def test_conf_sweep_ap_parity(ref_eval):
    from nerf_rpn_tpu.evaluation.metrics import (
        evaluate_box_proposals_average_precision,
    )

    proposals, scores, gt = _random_data(3)
    ref = ref_eval.evaluate_box_proposals_average_precision(
        [torch.tensor(p) for p in proposals],
        [torch.tensor(s) for s in scores],
        [torch.tensor(g) for g in gt],
        iou_thresh=0.25, top_k=20)
    ours = evaluate_box_proposals_average_precision(
        proposals, scores, gt, iou_thresh=0.25, top_k=20)
    np.testing.assert_allclose(ours["ap"], float(ref["ap"]), atol=1e-6)
    np.testing.assert_allclose(ours["precisions"], ref["precisions"].numpy(),
                               atol=1e-6)
