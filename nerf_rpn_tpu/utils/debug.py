"""Debug instrumentation (SURVEY 4.5 / 2.4).

``inspect_anchor_gt_iou`` mirrors the reference's
``vis_iou_of_anchor_and_gt`` (``model/utils.py:461-496``): per-scene
statistics of the best anchor IoU per gt box and the fg/bg anchor counts at
the matcher thresholds — the first thing to look at when recall is zero.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from nerf_rpn_tpu.ops.aabb import pairwise_iou_aabb
from nerf_rpn_tpu.ops.obb import obb2hbb_3d


def inspect_anchor_gt_iou(anchors, targets_list, pos_thres=0.7, neg_thres=0.3,
                          print_fn=print):
    """anchors: (N, 6); targets_list: list of per-scene (G, 6|7) numpy."""
    title = "#" * 40 + " IOU of anchors and GT " + "#" * 40
    print_fn(title)
    stats = []
    anchors = jnp.asarray(anchors)
    for mesh_idx, target in enumerate(targets_list):
        print_fn(f"Checking IOU of mesh {mesh_idx}...")
        t = jnp.asarray(np.asarray(target, np.float32))
        if t.shape[-1] == 7:
            t = obb2hbb_3d(t)
        ious = np.asarray(pairwise_iou_aabb(anchors, t))  # (N, G)
        best_per_gt = ious.max(axis=0)
        best_anchor = ious.argmax(axis=0)
        for g in range(len(best_per_gt)):
            print_fn(
                f"\ttarget={np.asarray(target)[g]}, iou={best_per_gt[g]:.3f}, "
                f"best_match={np.asarray(anchors[int(best_anchor[g])])}")
        per_anchor = ious.max(axis=1)
        n_pos = int((per_anchor > pos_thres).sum())
        n_neg = int((per_anchor < neg_thres).sum())
        print_fn(f"\tmean_iou={best_per_gt.mean():.4f}")
        print_fn(f"\tnum_pos_anchors={n_pos}\n\tnum_neg_anchors={n_neg}")
        stats.append({
            "mean_best_iou": float(best_per_gt.mean()),
            "num_pos_anchors": n_pos,
            "num_neg_anchors": n_neg,
        })
    print_fn("#" * len(title))
    return stats
