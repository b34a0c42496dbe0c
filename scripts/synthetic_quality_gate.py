"""Train-to-quality gate on synthetic scenes, via the REAL drivers.

For each (head x box-type) combo this script generates a synthetic dataset
(``nerf_rpn_tpu.data.synthetic``), trains the tiny config from scratch with
the real CLI driver (``run_rpn`` / ``run_fcos``), runs the real eval
protocol on the held-out test split, and asserts AP@0.25 from ``eval.json``
clears the gate: >= 0.9 for AABB, >= 0.8 for OBB.

This is the stand-in for the reference's real-data acceptance run (reference
``run_rpn.py:533-583`` + the paper tables): the one class of bug the
unit/parity suite cannot catch is "loss decreases but the detector never
localizes", and this catches it.

Usage (CPU-forced by default so it can run beside a TPU job):

    python scripts/synthetic_quality_gate.py            # all five combos
    python scripts/synthetic_quality_gate.py --combos rpn_aabb fcos_obb

The pytest wrappers in ``tests/test_synthetic_quality.py`` run the same
helpers (gated behind NERF_RPN_QUALITY_GATE=1 — minutes per combo on CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = {
    "rpn_aabb": 0.9,
    # rpn_obb: proven ceiling of the reference's own formulation, not a
    # porting bug (root-caused r5, README "Anchor-OBB vs FCOS-OBB"):
    # the midpoint-offset coder is bit-identical to the reference's, but
    # smooth-L1 on 8 midpoint deltas gives no direct orientation
    # gradient — measured AP@25 0.758 (smooth_l1, reference-default
    # config) / 0.844 (diou) / 0.859 (nms 0.1) vs FCOS-OBB 1.000 on the
    # same scenes.  Gate sits under the reference-default measurement.
    "rpn_obb": 0.7,
    "fcos_aabb": 0.9,
    "fcos_obb": 0.8,
    # stage-2 RCNN fine-tune: AP@25 of the refined+filtered proposals, plus
    # a classification-accuracy gate checked separately in run_combo
    "rcnn": 0.8,
    # headline bench shape class (VERDICT r4 #8): swin_s anchor RPN on
    # (200, 200, 130) scenes bucket-padded to 208x208x144 — gates the
    # large-N propose path (safe_top_k at ~1.2M anchors, bitmask NMS, the
    # native-layout delta gather) and the bucketing machinery the 32^3
    # combos never touch.  TPU-sized: run with --platform default on the
    # chip (CPU would take hours).
    "rpn_aabb_r200": 0.9,
}
RCNN_ACCURACY_GATE = 0.9

# AP@0.5 gates (VERDICT r3 #2): localization quality, not just detection.
# The r3 README table recorded anchor AP@50 at 0.52/0.40 from a stale
# mid-r3 run; re-measured on current code (2026-08-19) the 60-epoch runs
# reach rpn_aabb 1.00 (every eval-time NMS/score/top-k sweep also 1.00 —
# /tmp-archived diag, see README), so the anchor path localizes fine and
# the gap was a stale measurement.  Thresholds sit a margin below the
# measured values so seed jitter does not flake the gate while real
# localization regressions (coder/NMS/matcher bugs) still trip it.
# rpn_obb's 0.5 is the root-caused formulation ceiling (measured 0.62
# smooth_l1 / 0.70 diou / 0.71 nms-0.1; see GATES comment above).
GATES_AP50 = {
    "rpn_aabb": 0.8,
    "rpn_obb": 0.5,
    "fcos_aabb": 0.8,
    "fcos_obb": 0.8,
    "rcnn": 0.8,
    "rpn_aabb_r200": 0.8,
}


def _common_data_args(data_dir):
    return [
        "--features_path", data_dir,
        "--boxes_path", data_dir,
        "--dataset_split", os.path.join(data_dir, "split.npz"),
        "--resolution", "32",
        "--pad_multiple", "32",
        "--max_gt", "8",
    ]


def run_rpn_gate(data_dir, save_path, rotated, num_epochs=60, seed=0):
    """Train + eval the anchor RPN via the real driver; returns eval.json."""
    from nerf_rpn_tpu.cli import run_rpn

    common = _common_data_args(data_dir) + [
        "--save_path", save_path,
        "--backbone_type", "resnet_tiny",
        "--rpn_head_conv_depth", "2",
        "--rpn_pre_nms_top_n_train", "512",
        "--rpn_post_nms_top_n_train", "256",
        "--rpn_pre_nms_top_n_test", "512",
        "--rpn_post_nms_top_n_test", "256",
    ] + (["--rotated_bbox"] if rotated else [])
    run_rpn.main(common + [
        "--mode", "train",
        "--num_epochs", str(num_epochs),
        "--batch_size", "4",
        "--lr", "3e-3",
        "--flip_prob", "0.5", "--rotate_prob", "0.5",
        "--rot_scale_prob", "0.0",
        "--eval_interval", "5",
        "--log_to_file",
        "--seed", str(seed),
    ])
    run_rpn.main(common + [
        "--mode", "eval",
        "--checkpoint", os.path.join(save_path, "model_best"),
    ])
    with open(os.path.join(save_path, "eval.json")) as f:
        return json.load(f)


def run_rpn_gate_r200(data_dir, save_path, num_epochs=60, seed=0):
    """Headline-shape-class gate: anchor RPN on (200, 200, 130) scenes
    bucket-padded to 208x208x144 (the bench.py headline shape, reference
    ``run_rpn.py:594-617`` benchmark shape).  Trains from scratch on 8
    synthetic scenes; a correctly-wired large-shape propose path
    (hierarchical top-k over ~1.4M anchors, NMS, native-layout decode)
    must localize.

    Uses the 32^3 gates' convergence-reliable recipe (resnet_tiny, f32,
    lr 3e-3, head depth 2) — the gated machinery (matching/sampling over
    1.4M anchors, safe_top_k, NMS, bucketed padding) is backbone-
    agnostic, and a from-scratch swin_s + bf16 at lr 1e-3 provably does
    NOT discriminate objectness in 240 steps (first r5 attempt: obj BCE
    pinned at log 2 for 60 epochs, AP@25 0.054 with Recall@25@2500 1.0 —
    regression learned, ranking did not; see benchmarks/README.md)."""
    from nerf_rpn_tpu.cli import run_rpn

    common = [
        "--features_path", data_dir,
        "--boxes_path", data_dir,
        "--dataset_split", os.path.join(data_dir, "split.npz"),
        "--resolution", "200",
        "--pad_multiple", "16",
        "--max_gt", "8",
        "--save_path", save_path,
        "--backbone_type", "resnet_tiny",
        "--rpn_head_conv_depth", "2",
    ]
    run_rpn.main(common + [
        "--mode", "train",
        "--num_epochs", str(num_epochs),
        "--batch_size", "2",
        "--lr", "3e-3",
        "--flip_prob", "0.5", "--rotate_prob", "0.5",
        "--rot_scale_prob", "0.0",
        "--eval_interval", "10",
        "--log_to_file",
        "--seed", str(seed),
    ])
    run_rpn.main(common + [
        "--mode", "eval",
        "--checkpoint", os.path.join(save_path, "model_best"),
    ])
    with open(os.path.join(save_path, "eval.json")) as f:
        return json.load(f)


def run_fcos_gate(data_dir, save_path, rotated, num_epochs=60, seed=0):
    """Train + eval FCOS via the real driver; returns eval.json."""
    from nerf_rpn_tpu.cli import run_fcos

    common = _common_data_args(data_dir) + [
        "--save_path", save_path,
        "--backbone_type", "resnet_tiny",
        "--num_convs", "2",
        "--norm_reg_targets", "--centerness_on_reg",
        "--pre_nms_top_n", "512",
        "--fpn_post_nms_top_n", "256",
    ] + (["--rotated_bbox"] if rotated else [])
    run_fcos.main(common + [
        "--mode", "train",
        "--num_epochs", str(num_epochs),
        "--batch_size", "4",
        "--lr", "3e-3",
        "--flip_prob", "0.5", "--rotate_prob", "0.5",
        "--rot_scale_prob", "0.0",
        "--eval_interval", "5",
        "--log_to_file",
        "--seed", str(seed),
    ])
    run_fcos.main(common + [
        "--mode", "eval",
        "--checkpoint", os.path.join(save_path, "model_best"),
    ])
    with open(os.path.join(save_path, "eval.json")) as f:
        return json.load(f)


def run_rcnn_gate(data_dir, save_path, num_epochs=40, seed=0):
    """Train + eval the stage-2 RCNN fine-tune via the real driver.

    Inputs are the synthetic scenes plus generated proposal dumps
    (jittered-gt positives, far negatives —
    ``data/synthetic.write_synthetic_rois``); the gate asserts the refined+
    filtered AP@25 and the objectness classification accuracy from the
    driver's eval.json.
    """
    from nerf_rpn_tpu.cli import run_rpn_detect

    roi_dir = os.path.join(data_dir, "rois")
    common = [
        "--features_path", data_dir,
        "--boxes_path", data_dir,
        "--rois_path", roi_dir,
        "--dataset_split", os.path.join(data_dir, "split.npz"),
        "--save_path", save_path,
        "--fine_tune", "--remap",
        "--backbone_type", "resnet_tiny",
        "--feature_input_dim", "32",
        "--resolution", "32",
        "--output_size", "2", "2", "2",
        "--is_flatten",
        "--max_rois", "20",
        "--cls_batch_size", "64",
        "--batch_size", "4",
        "--nms_thresh", "0.3",
        "--filter_score_threhold", "0.5",
        "--filter_num_threhold", "20",
    ]
    run_rpn_detect.main(common + [
        "--mode", "train",
        "--num_epochs", str(num_epochs),
        "--lr", "3e-3",
        "--eval_interval", "5",
        "--log_to_file",
        "--seed", str(seed),
    ])
    run_rpn_detect.main(common + [
        "--mode", "eval",
        "--checkpoint", os.path.join(save_path, "model_best"),
    ])
    with open(os.path.join(save_path, "eval.json")) as f:
        return json.load(f)


def parse_recall_curve(log_path):
    """Val Recall@50 per eval from the driver's own log file (one 'Top N:
    Recall@50 x ...' line per eval_interval epochs)."""
    import re

    curve = []
    if not os.path.isfile(log_path):
        return curve
    with open(log_path) as f:
        for line in f:
            m = re.search(r"Top \d+: Recall@50 ([0-9.]+)", line)
            if m:
                curve.append(float(m.group(1)))
    return curve


def run_combo(combo, work_dir, num_epochs=60, seed=0):
    """Generate data, train, eval; returns (ap25, ap50, aux_metric,
    eval.json, val curve).  aux_metric is Recall@25 for the stage-1 combos
    and classification accuracy for the rcnn combo."""
    from nerf_rpn_tpu.data.synthetic import (
        write_synthetic_dataset,
        write_synthetic_rois,
    )

    rotated = combo.endswith("obb")
    data_dir = os.path.join(work_dir, f"data_{combo}")
    save_path = os.path.join(work_dir, f"out_{combo}")
    if combo == "rpn_aabb_r200":
        # bench shape class: fewer, bigger scenes (each npz ~21 MB)
        write_synthetic_dataset(
            data_dir, n_train=8, n_val=2, n_test=4,
            resolution=(200, 200, 130), box_size=(24.0, 72.0), max_boxes=4,
            seed=seed)
        results = run_rpn_gate_r200(data_dir, save_path,
                                    num_epochs=num_epochs, seed=seed)
        ap25 = results["ap_25"]["ap"]
        ap50 = results["ap_50"]["ap"]
        r25 = next(v["ar"] for k, v in results.items()
                   if k.startswith("recall_25"))
        curve = parse_recall_curve(os.path.join(save_path, "run_rpn.log"))
        return ap25, ap50, r25, results, curve
    write_synthetic_dataset(data_dir, rotated=rotated, seed=seed)

    if combo == "rcnn":
        write_synthetic_rois(data_dir, os.path.join(data_dir, "rois"),
                             seed=seed)
        results = run_rcnn_gate(data_dir, save_path,
                                num_epochs=min(num_epochs, 40), seed=seed)
        return (results["ap_25"]["ap"], results["ap_50"]["ap"],
                results["classification"]["accuracy"], results, [])

    runner = run_rpn_gate if combo.startswith("rpn") else run_fcos_gate
    results = runner(data_dir, save_path, rotated,
                     num_epochs=num_epochs, seed=seed)
    ap25 = results["ap_25"]["ap"]
    ap50 = results["ap_50"]["ap"]
    r25 = next(v["ar"] for k, v in results.items()
               if k.startswith("recall_25"))
    log_name = "run_rpn.log" if combo.startswith("rpn") else "run_fcos.log"
    curve = parse_recall_curve(os.path.join(save_path, log_name))
    return ap25, ap50, r25, results, curve


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    # r200 is TPU-sized and opt-in: run it explicitly with
    #   python scripts/synthetic_quality_gate.py --combos rpn_aabb_r200 \
    #       --platform default
    p.add_argument("--combos", nargs="+",
                   default=sorted(k for k in GATES if k != "rpn_aabb_r200"),
                   choices=sorted(GATES))
    p.add_argument("--num_epochs", type=int, default=60)
    p.add_argument("--work_dir", default=None,
                   help="Defaults to a fresh temp dir.")
    p.add_argument("--platform", default="cpu", choices=["cpu", "default"],
                   help="cpu (default): force the CPU backend so the gate "
                        "can run beside a TPU job.")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    work_dir = args.work_dir or tempfile.mkdtemp(prefix="nerf_rpn_gate_")
    print(f"work dir: {work_dir}")
    failures, summary = [], {}
    for combo in args.combos:
        t0 = time.time()
        ap25, ap50, aux, _, curve = run_combo(
            combo, work_dir, num_epochs=args.num_epochs, seed=args.seed)
        gate = GATES[combo]
        gate50 = GATES_AP50[combo]
        ok = ap25 >= gate and ap50 >= gate50
        aux_key = "cls_accuracy" if combo == "rcnn" else "recall25"
        if combo == "rcnn":
            ok = ok and aux >= RCNN_ACCURACY_GATE
        summary[combo] = {
            "combo": combo, "ap25": round(ap25, 4), "ap50": round(ap50, 4),
            aux_key: round(aux, 4), "gate_ap25": gate, "gate_ap50": gate50,
            "pass": ok,
            "val_recall50_curve": [round(v, 3) for v in curve],
            "minutes": round((time.time() - t0) / 60, 1),
        }
        print(json.dumps(summary[combo]), flush=True)
        if not ok:
            failures.append(combo)
    with open(os.path.join(work_dir, "gate_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if failures:
        print(f"FAILED combos: {failures}", file=sys.stderr)
        return 1
    print("all gates passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
