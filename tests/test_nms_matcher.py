"""NMS vs brute-force oracle; matcher / sampler semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.nms import nms_mask, topk_after_nms
from nerf_rpn_tpu.utils.target_assign import match_anchors, sample_balanced
from nerf_rpn_tpu.utils.losses import smooth_l1, bce_with_logits, sigmoid_focal_loss


def brute_nms(boxes, scores, thresh):
    """Sequential greedy NMS oracle (numpy)."""
    def iou(a, b):
        lo = np.maximum(a[:3], b[:3])
        hi = np.minimum(a[3:], b[3:])
        inter = np.prod(np.clip(hi - lo, 0, None))
        va = np.prod(a[3:] - a[:3])
        vb = np.prod(b[3:] - b[:3])
        return inter / (va + vb - inter)

    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        for j in order:
            if alive[j] and j != i and scores[j] <= scores[i]:
                if iou(boxes[i], boxes[j]) > thresh:
                    alive[j] = False
    return sorted(keep)


def test_nms_matches_oracle(rng):
    n = 64
    lo = rng.uniform(0, 20, (n, 3))
    sz = rng.uniform(2, 10, (n, 3))
    boxes = np.concatenate([lo, lo + sz], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thresh in (0.1, 0.3, 0.7):
        keep = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thresh)
        )
        expected = brute_nms(boxes, scores, thresh)
        assert sorted(np.where(keep)[0].tolist()) == expected, thresh


def test_nms_invalid_never_kept(rng):
    boxes = jnp.asarray([[0, 0, 0, 2, 2, 2], [10, 10, 10, 12, 12, 12]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    keep = np.asarray(nms_mask(boxes, scores, jnp.asarray([True, False]), 0.5))
    assert keep.tolist() == [True, False]


def test_nms_category_isolation():
    """Identical overlapping boxes in different categories both survive."""
    boxes = jnp.asarray([[0, 0, 0, 2, 2, 2], [0, 0, 0, 2, 2, 2]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.ones(2, bool)
    keep_same = np.asarray(nms_mask(boxes, scores, valid, 0.5, jnp.asarray([0, 0])))
    keep_diff = np.asarray(nms_mask(boxes, scores, valid, 0.5, jnp.asarray([0, 1])))
    assert keep_same.tolist() == [True, False]
    assert keep_diff.tolist() == [True, True]


def test_nms_obb_path():
    boxes = jnp.asarray(
        [[5, 5, 5, 4, 4, 4, 0.0], [5, 5, 5, 4, 4, 4, 0.1], [20, 20, 20, 4, 4, 4, 0.0]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_mask(boxes, scores, jnp.ones(3, bool), 0.25))
    assert keep.tolist() == [True, False, True]


def test_nms_obb_pair_budget_equivalence(rng):
    """The upper-bound-gated/compacted OBB path (``pair_budget``) must be
    bit-identical to clipping every pair, including when chunks need many
    rank-select rounds (pair_budget=1)."""
    n = 192
    centers = rng.uniform(0, 80, (6, 3))
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :3] = centers[rng.integers(0, 6, n)] + rng.normal(0, 3, (n, 3))
    boxes[:, 3:6] = rng.uniform(2, 10, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-9:] = False
    ref = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.25, row_chunk=64,
                              pair_budget=None))
    for budget in (64, 1):
        got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), 0.25, row_chunk=64,
                                  pair_budget=budget))
        np.testing.assert_array_equal(ref, got, err_msg=f"budget={budget}")
    assert 0 < ref.sum() < valid.sum()


def test_rotated_iou_upper_bound_is_valid(rng):
    """ub >= exact rotated IoU for every pair (within the 1e-3 gating slack)."""
    from nerf_rpn_tpu.ops.rotated_iou_pairwise import (
        iou_rotated_3d_upper_bound,
        pairwise_iou_rotated_3d_soa,
    )

    n = 96
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :3] = rng.uniform(0, 40, (n, 3))
    boxes[:, 3:6] = rng.uniform(2, 12, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, n)
    b = jnp.asarray(boxes)
    iou = np.asarray(pairwise_iou_rotated_3d_soa(b, b))
    ub = np.asarray(iou_rotated_3d_upper_bound(b, b))
    assert (iou - ub).max() < 1e-3
    # axis-aligned boxes: bound is tight
    boxes[:, 6] = 0.0
    b = jnp.asarray(boxes)
    iou = np.asarray(pairwise_iou_rotated_3d_soa(b, b))
    ub = np.asarray(iou_rotated_3d_upper_bound(b, b))
    np.testing.assert_allclose(ub, iou, atol=2e-5)


def test_topk_after_nms():
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7])
    keep = jnp.asarray([True, True, False, True])
    idx, valid = topk_after_nms(scores, keep, 3)
    assert np.asarray(idx).tolist() == [1, 3, 0]
    assert np.asarray(valid).all()


def test_matcher_thresholds():
    # 2 gt x 5 anchors
    iou = jnp.asarray(
        [
            [0.9, 0.25, 0.1, 0.05, 0.0],
            [0.1, 0.10, 0.4, 0.05, 0.0],
        ]
    )
    m = np.asarray(
        match_anchors(iou, jnp.ones(2, bool), 0.35, 0.2, allow_low_quality=False)
    )
    assert m.tolist() == [0, -2, 1, -1, -1]


def test_matcher_low_quality():
    """gt1's best anchor (idx 3, iou .15 < low) gets force-matched."""
    iou = jnp.asarray(
        [
            [0.9, 0.25, 0.1, 0.05, 0.0],
            [0.1, 0.10, 0.02, 0.15, 0.0],
        ]
    )
    m = np.asarray(match_anchors(iou, jnp.ones(2, bool), 0.35, 0.2, allow_low_quality=True))
    assert m[0] == 0
    assert m[3] == 1  # force-matched despite below-low
    assert m[2] == -1


def test_matcher_gt_padding():
    """A padded gt row with huge IoU must not match anything."""
    iou = jnp.asarray([[0.1, 0.2], [0.99, 0.99]])
    m = np.asarray(
        match_anchors(iou, jnp.asarray([True, False]), 0.35, 0.2, allow_low_quality=True)
    )
    assert np.all(m <= 0)  # only gt 0 or negatives


def test_sampler_budgets():
    matches = jnp.asarray([2, 1, 0, -1, -1, -1, -1, -2] * 8)  # 16 pos, 32 neg, 8 ignore... per 8
    key = jax.random.PRNGKey(0)
    pos, neg = sample_balanced(key, matches, batch_size=32, positive_fraction=0.5)
    pos, neg = np.asarray(pos), np.asarray(neg)
    m = np.asarray(matches)
    assert pos.sum() == 16  # min(16 available, 16 budget)
    assert neg.sum() == 16
    assert np.all(m[pos] >= 0)
    assert np.all(m[neg] == -1)
    assert not np.any(pos & neg)


def test_sampler_scarce_positives():
    matches = jnp.asarray([1] * 3 + [-1] * 61)
    pos, neg = sample_balanced(jax.random.PRNGKey(1), matches, 32, 0.5)
    assert int(np.asarray(pos).sum()) == 3
    assert int(np.asarray(neg).sum()) == 29  # tops up to the budget


def test_losses_reference_values():
    # smooth_l1 beta=1: |d|=0.5 -> 0.125; |d|=2 -> 1.5
    np.testing.assert_allclose(
        np.asarray(smooth_l1(jnp.asarray([0.5, 2.0]), jnp.zeros(2), beta=1.0)),
        [0.125, 1.5],
    )
    # bce at logit 0 is log 2
    np.testing.assert_allclose(
        float(bce_with_logits(jnp.asarray(0.0), jnp.asarray(1.0))), np.log(2), rtol=1e-6
    )
    # focal loss with gamma=0, alpha=-1 reduces to bce
    np.testing.assert_allclose(
        np.asarray(sigmoid_focal_loss(jnp.asarray([0.3]), jnp.asarray([1.0]), alpha=-1, gamma=0.0)),
        np.asarray(bce_with_logits(jnp.asarray([0.3]), jnp.asarray([1.0]))),
        rtol=1e-6,
    )


def test_focal_loss_torchvision_value():
    """Cross-checked against torchvision.ops.sigmoid_focal_loss."""
    import torch
    from torch.nn.functional import binary_cross_entropy_with_logits

    logits = np.linspace(-2, 2, 9).astype(np.float32)
    targets = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0], np.float32)
    lt = torch.tensor(logits)
    tt = torch.tensor(targets)
    p = torch.sigmoid(lt)
    ce = binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    expected = ce * ((1 - p_t) ** 2.0)
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    expected = (alpha_t * expected).numpy()
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_suppression_graph_kernel_parity(rng):
    """Pallas packed suppression graph == jnp reference, incl. padding."""
    from nerf_rpn_tpu.ops.nms_graph import (
        suppression_graph,
        suppression_graph_reference,
    )

    n = 512
    boxes = np.zeros((n, 6), np.float32)
    lo = rng.uniform(0, 150, (n, 3))
    sz = rng.uniform(2, 40, (n, 3))
    boxes[:, :3] = lo
    boxes[:, 3:] = lo + sz
    boxes[480:] = 0.0  # padded rows never overlap anything
    jb = jnp.asarray(boxes)
    ref = suppression_graph_reference(jb, 0.3)
    out = suppression_graph(jb, 0.3, row_tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_suppression_graph_kernel_vmap(rng):
    """The kernel must stay exact under vmap (the per-(scene, level) NMS
    batching in generate_proposals_levels)."""
    import jax

    from nerf_rpn_tpu.ops.nms_graph import (
        suppression_graph,
        suppression_graph_reference,
    )

    b, n = 3, 256
    lo = rng.uniform(0, 100, (b, n, 3))
    boxes = np.concatenate([lo, lo + rng.uniform(2, 30, (b, n, 3))],
                           -1).astype(np.float32)
    jb = jnp.asarray(boxes)
    ref = jax.vmap(lambda x: suppression_graph_reference(x, 0.25))(jb)
    out = jax.vmap(
        lambda x: suppression_graph(x, 0.25, row_tile=128, interpret=True)
    )(jb)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_sampler_batched_matches_semantics():
    """sample_balanced_batch (radix-select path, the train-step hot fix of
    r3: the double-argsort pair cost ~48 ms/step) must deliver the same
    contract as the per-scene sampler: exact budgets, eligibility, and
    disjoint masks — for abundant and scarce positives."""
    from nerf_rpn_tpu.utils.target_assign import sample_balanced_batch

    rng = np.random.default_rng(3)
    matches = jnp.asarray(
        rng.choice([-2, -1, 0, 3], (4, 9000), p=[0.1, 0.7, 0.1, 0.1]))
    pos, neg = sample_balanced_batch(jax.random.PRNGKey(5), matches, 256, 0.5)
    m = np.asarray(matches)
    for b in range(4):
        p, ng = np.asarray(pos[b]), np.asarray(neg[b])
        assert p.sum() == min((m[b] >= 0).sum(), 128)
        assert ng.sum() == min((m[b] == -1).sum(), 256 - p.sum())
        assert np.all(m[b][p] >= 0) and np.all(m[b][ng] == -1)
        assert not np.any(p & ng)

    # scarce positives: bg tops the budget up to 256
    scarce = jnp.asarray(np.where(rng.random((2, 6000)) < 0.0008, 1, -1))
    p2, n2 = sample_balanced_batch(jax.random.PRNGKey(6), scarce, 256, 0.5)
    for b in range(2):
        n_pos = int(np.asarray(scarce[b] >= 0).sum())
        assert int(p2[b].sum()) == min(n_pos, 128)
        assert int(p2[b].sum()) + int(n2[b].sum()) == 256
