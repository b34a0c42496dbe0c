"""Jitted train / eval steps for the anchor RPN and FCOS pipelines.

One ``jit`` per step; batches arrive with the scene axis sharded over the
mesh's ``data`` axis and XLA's SPMD partitioner inserts the gradient /
normaliser collectives (the reference's DDP + in-loss ``reduce_sum``,
SURVEY 2.11, with zero communication code here).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nerf_rpn_tpu.train.state import recorded_grad_norm

from nerf_rpn_tpu.models import rpn as rpn_lib
from nerf_rpn_tpu.models import fcos as fcos_lib
from nerf_rpn_tpu.models.rpn import RPNConfig
from nerf_rpn_tpu.models.fcos import FCOSConfig


def level_shapes_for(mesh_shape: Sequence[int], strides: Sequence[int]):
    """Feature shapes per FPN level: SAME-padded stride-2 stacks produce
    ceil-divided spatial dims."""
    return [tuple(-(-int(m) // s) for m in mesh_shape) for s in strides]


def _swin_split_units(model):
    """Swin-backbone eval compile units, or ``None`` for other backbones.

    Swin inference runs as split compile units: [patch embed (+ stages)] |
    [conv-free stages, Pallas window attention ON] | [FPN + head convs].
    The Pallas kernel wins ~2x at block scale but loses ~5 ms when convs
    share its XLA program (layout-assignment poison, see
    ShiftedWindowAttention3D); in its own conv-free unit it wins ~2.8 ms at
    the bench shape (benchmarks/microbench_split_jits.py).  Since the
    staged-s2d patch embed (microbench_pe4.py) the embed unit is conv-free
    too for 4-divisible grids, but MERGING it into the stages unit measured
    WORSE (35.44 -> 33.97 scenes/s same-session: the embed matmul joining
    the Pallas-attention program shifts XLA's fusion/layout choices), so
    the separate units stay the default; ``NERF_RPN_TPU_MERGE_EMBED=1`` is
    the experiment knob.

    Returns (backbone_units, neck): ``backbone_units`` is a tuple of
    jitted fns chained grids -> ... -> per-stage features; the caller
    wraps ``neck`` plus its head into the final jit.  The
    ``NERF_RPN_TPU_FUSED_MIN_WINDOWS`` env var (0 = XLA attention) is the
    experiment knob used by benchmarks/trace_forward.py --jnp-attn.
    """
    import os

    from nerf_rpn_tpu.models.swin import SWIN_VARIANTS, make_swin_fpn

    if model.backbone_type not in SWIN_VARIANTS:
        return None
    fused_min = int(os.environ.get("NERF_RPN_TPU_FUSED_MIN_WINDOWS", "128"))
    bb = make_swin_fpn(model.backbone_type, dtype=model.dtype,
                       fused_min_windows=fused_min)

    @jax.jit
    def fwd_embed(state, grids):
        return bb.apply({"params": state.params["backbone"]}, grids,
                        stage="embed")

    @jax.jit
    def fwd_stages(state, tokens):
        return bb.apply({"params": state.params["backbone"]}, tokens,
                        stage="stages")

    @jax.jit
    def fwd_embed_stages(state, grids):
        tokens = bb.apply({"params": state.params["backbone"]}, grids,
                          stage="embed")
        return bb.apply({"params": state.params["backbone"]}, tokens,
                        stage="stages")

    def neck(state, stage_feats):
        return bb.apply({"params": state.params["backbone"]}, stage_feats,
                        stage="neck")

    if os.environ.get("NERF_RPN_TPU_MERGE_EMBED", "0") != "0":
        return (fwd_embed_stages,), neck
    return (fwd_embed, fwd_stages), neck


# ---------------------------------------------------------------------------
# Anchor RPN
# ---------------------------------------------------------------------------


def make_rpn_train_step(model, cfg: RPNConfig, mesh_shape, strides=(4, 8, 16, 32)):
    """Returns train_step(state, batch, key) -> (state, metrics)."""
    shapes = level_shapes_for(mesh_shape, strides)
    anchors_np, _, level_strides, counts = rpn_lib.build_level_tables(
        cfg, mesh_shape, shapes
    )
    anchors_per_loc = model.num_anchors
    max_dim = int(max(mesh_shape))

    @jax.jit
    def train_step(state, batch, key):
        padding = rpn_lib.dynamic_padding_masks(
            shapes, level_strides, anchors_per_loc, batch["ori_sizes"]
        )
        # separate streams: anchor sampling vs stochastic depth (the Swin
        # backbone's drop_path needs a "dropout" rng in train mode)
        key, drop_key = jax.random.split(key)

        def loss_fn(params):
            (feats, logits, deltas), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["grids"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_key},
            )
            # use only the levels covered by the anchor tables; deltas stay
            # in the head's native (B, X, Y, Z, A*D) layout — the loss
            # gathers its K sampled rows per level (the (B, N, D)
            # flatten+concat cost ~2 ms of relayout at the train.sh shape)
            b = batch["grids"].shape[0]
            obj = jnp.concatenate(
                [l.reshape(b, -1) for l in logits[: len(shapes)]], axis=1)
            losses = rpn_lib.rpn_losses(
                cfg, key, obj, list(deltas[: len(shapes)]),
                jnp.asarray(anchors_np),
                batch["gt_boxes"], batch["gt_mask"],
                padding_mask=padding, max_mesh_dim=max_dim,
                level_counts=counts, anchors_per_loc=anchors_per_loc,
            )
            total = (
                losses["loss_objectness"]
                + cfg.reg_loss_weight * losses["loss_rpn_box_reg"]
                + cfg.reg_loss_weight_2d * losses["loss_rpn_box_reg_2d"]
            )
            return total, (losses, mutated["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        # the SPMD analogue of the reference's wandb.watch gradient logging
        # (run_rpn.py:238-239): global gradient/parameter norms, computed
        # in-graph (per-parameter histograms would force a full device
        # fetch).  grad_norm reuses the clip transform's own reduction
        # (train/state.py) instead of a second full pass over the grads.
        gnorm = recorded_grad_norm(state.opt_state)
        if gnorm is None:
            gnorm = optax.global_norm(grads)
        metrics = {"loss": total, **losses,
                   "grad_norm": gnorm,
                   "param_norm": optax.global_norm(state.params)}
        return state, metrics

    return train_step, counts


def make_rpn_eval_step(model, cfg: RPNConfig, mesh_shape,
                       strides=(4, 8, 16, 32), return_features=False):
    """Returns eval_step(state, batch) -> proposals dict (fixed shapes).

    ``return_features`` additionally returns the FPN pyramid (the reference's
    ``--save_results`` dump feeding the RCNN stage, ``run_rpn.py:485-505``).
    """
    shapes = level_shapes_for(mesh_shape, strides)
    anchors_np, _, level_strides, counts = rpn_lib.build_level_tables(
        cfg, mesh_shape, shapes
    )
    anchors_per_loc = model.num_anchors

    # numpy per-level anchor tables (trace-time constants)
    level_anchors = np.split(anchors_np, np.cumsum(counts)[:-1])

    # Multiple jits, not one: the tunnel AOT compiler is superlinear in
    # program size, and splitting backbone-forward from proposal-gen cuts a
    # >30 min monolith compile into few-minute (independently cached) units.
    # Head outputs cross the boundary PER LEVEL (flat (B, N_l) views, free
    # reshapes) — concatenating them first cost ~1.7 ms of layout copies at
    # the bench shape (see generate_proposals_levels).

    def _flatten(feats, logits, deltas, b):
        obj_l = [l.reshape(b, -1) for l in logits[: len(shapes)]]
        # deltas stay in the head's native voxel-major layout (B, V, A*D):
        # flattening to (B, N, D) splits the minor axis and costs ~1 ms of
        # relayout copies at the bench shape (trace reshape.64/copy.153);
        # generate_proposals_levels selects the anchor on survivors only
        dl_l = [d.reshape(b, -1, d.shape[-1]) for d in deltas[: len(shapes)]]
        vox = rpn_lib.voxel_objectness_scores(logits[: len(shapes)])
        return feats[: len(shapes)], obj_l, dl_l, vox

    split = _swin_split_units(model)
    if split is not None:
        from nerf_rpn_tpu.models.heads import RPNHead3D

        backbone_units, neck = split
        head = RPNHead3D(in_channels=256, num_anchors=model.num_anchors,
                         conv_depth=model.conv_depth, rotate=model.rotated,
                         dtype=model.dtype)

        @jax.jit
        def fwd_neck_head(state, stage_feats):
            pyr = neck(state, stage_feats)
            logits, deltas = head.apply(
                {"params": state.params["rpn_head"]}, list(pyr))
            return _flatten(list(pyr), logits, deltas,
                            stage_feats[0].shape[0])

        def forward(state, grids):
            x = grids
            for unit in backbone_units:
                x = unit(state, x)
            return fwd_neck_head(state, x)

        forward_units = (*backbone_units, fwd_neck_head)
    else:
        @jax.jit
        def forward(state, grids):
            feats, logits, deltas = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                grids,
                train=False,
            )
            return _flatten(feats, logits, deltas, grids.shape[0])

        forward_units = (forward,)

    @jax.jit
    def propose(obj_l, dl_l, ori_sizes):
        pads = rpn_lib.dynamic_padding_masks_levels(
            shapes, level_strides, anchors_per_loc, ori_sizes
        )
        return rpn_lib.generate_proposals_levels(
            cfg, obj_l, dl_l, [jnp.asarray(a) for a in level_anchors],
            mesh_shape, padding_masks=pads,
        )

    def eval_step(state, batch):
        feats, obj, dl, vox = forward(state, batch["grids"])
        out = propose(obj, dl, batch["ori_sizes"])
        out["voxel_scores"] = vox
        if return_features:
            out["features"] = [f.astype(jnp.float32) for f in feats]
        return out

    # expose the compile units (bench.py times/cost-analyses them separately)
    eval_step.forward = forward
    eval_step.forward_units = forward_units
    eval_step.propose = propose
    return eval_step


# ---------------------------------------------------------------------------
# FCOS
# ---------------------------------------------------------------------------


def make_fcos_train_step(model, cfg: FCOSConfig, mesh_shape):
    shapes = level_shapes_for(mesh_shape, cfg.fpn_strides)
    loc, level_of, counts, stride_of, soi = fcos_lib.fcos_locations(
        shapes, cfg.fpn_strides
    )

    @jax.jit
    def train_step(state, batch, key):
        # FCOS target assignment is deterministic; the key only feeds the
        # Swin backbone's stochastic-depth "dropout" stream
        def loss_fn(params):
            (feats, cls, reg, ctr), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["grids"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            cls_f = fcos_lib.flatten_fcos_outputs(cls, 1)
            reg_f = fcos_lib.flatten_fcos_outputs(reg, cfg.reg_dim)
            ctr_f = fcos_lib.flatten_fcos_outputs(ctr, 1)
            padding = fcos_lib.fcos_padding_mask(loc, batch["ori_sizes"])
            losses = fcos_lib.fcos_losses(
                cfg, cls_f, reg_f, ctr_f, jnp.asarray(loc),
                jnp.asarray(stride_of), jnp.asarray(soi),
                batch["gt_boxes"], batch["gt_mask"], padding_mask=padding,
            )
            total = losses["loss_cls"] + losses["loss_reg"] + losses["loss_centerness"]
            return total, (losses, mutated.get("batch_stats", state.batch_stats))

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        gnorm = recorded_grad_norm(state.opt_state)
        if gnorm is None:
            gnorm = optax.global_norm(grads)
        return state, {"loss": total, **losses,
                       "grad_norm": gnorm,
                       "param_norm": optax.global_norm(state.params)}

    return train_step, counts


def _rcnn_feature_barrier() -> bool:
    """Experiment knob: NERF_RPN_TPU_RCNN_FEATURE_BARRIER=1 puts an
    optimization barrier between the FPN outputs and the RoI-align flat
    buffer in the fine-tune train step — probing whether the RoI scatter's
    layout keeps XLA's batch-fold-into-space conv rewrite from firing on
    the FPN conv backward (r5 trace: dgrad 6.2 ms at 35% MFU vs the same
    conv's forward at 95.6%)."""
    import os

    return os.environ.get("NERF_RPN_TPU_RCNN_FEATURE_BARRIER", "0") != "0"


def make_rcnn_train_step(head_model, cfg, spatial_scales, rois_per_image,
                         backbone=None, reg_loss_weight=1.0, obj_only=False):
    """RCNN second stage (reference ``Classification_Model.forward`` +
    ``train_epoch``, ``run_rpn_detect.py:342``).  ``backbone`` is the
    optional fine-tune feature extractor applied to raw grids;
    ``reg_loss_weight``/``obj_only`` mirror the driver's loss combination
    (``run_rpn_detect.py:358-362``)."""
    import jax.random as jrandom

    from nerf_rpn_tpu.models import detector as det
    from nerf_rpn_tpu.ops.roi_align import multilevel_roi_align_batched

    @jax.jit
    def train_step(state, batch, key):
        key, drop_key = jax.random.split(key)

        def loss_fn(params):
            mutated = {}
            if backbone is not None:
                variables = {"params": params["backbone"]}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                features, mut = backbone.apply(
                    variables, batch["grids"], train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_key},
                )
                mutated = mut
                head_params = params["head"]
            else:
                features = batch["features"]
                head_params = params

            b = batch["rois"].shape[0]
            keys = jrandom.split(key, b)
            sampled = jax.vmap(
                lambda k, r, lv, v, g, gm: det.sample_rois(
                    cfg, k, r, lv, v, g, gm, rois_per_image
                )
            )(keys, batch["rois"], batch["roi_levels"], batch["roi_valid"],
              batch["gt_boxes"], batch["gt_mask"])

            feats = list(features)
            if _rcnn_feature_barrier():
                feats = list(jax.lax.optimization_barrier(tuple(feats)))
            pooled = multilevel_roi_align_batched(
                feats, sampled["boxes"], sampled["levels"],
                sampled["valid"], spatial_scales, cfg.output_size,
                cfg.sampling_ratio, cfg.pool_mode, rotated=cfg.rotated,
                enlarge_scale=cfg.enlarge_scale,
            )
            flat = pooled.reshape(-1, *pooled.shape[2:])
            deltas, scores = head_model.apply({"params": head_params}, flat)
            losses = det.rcnn_losses(
                cfg, deltas, scores,
                sampled["labels"].reshape(-1),
                sampled["matched_gt"].reshape(-1, cfg.box_dim),
                sampled["boxes"].reshape(-1, cfg.box_dim),
                sampled["valid"].reshape(-1),
            )
            losses["loss_rpn_box_reg"] = (
                losses["loss_rpn_box_reg"] * reg_loss_weight
            )
            if obj_only:
                total = losses["loss_objectness"]
            else:
                total = losses["loss_objectness"] + losses["loss_rpn_box_reg"]
            new_bs = mutated.get("batch_stats", state.batch_stats)
            return total, (losses, new_bs)

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        gnorm = recorded_grad_norm(state.opt_state)
        if gnorm is None:
            gnorm = optax.global_norm(grads)
        return state, {"loss": total, **losses,
                       "grad_norm": gnorm,
                       "param_norm": optax.global_norm(state.params)}

    return train_step


def make_rcnn_eval_step(head_model, cfg, spatial_scales, backbone=None):
    """Score/refine every RoI (no sampling; reference eval splits RoIs into
    cls_batch_size chunks, ``run_rpn_detect.py:459-491`` — fixed shapes make
    that unnecessary here)."""
    from nerf_rpn_tpu.models import detector as det
    from nerf_rpn_tpu.ops.roi_align import multilevel_roi_align_batched

    @jax.jit
    def eval_step(state, batch):
        if backbone is not None:
            variables = {"params": state.params["backbone"]}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            features = backbone.apply(variables, batch["grids"], train=False)
            head_params = state.params["head"]
        else:
            features = batch["features"]
            head_params = state.params

        labels, matched = jax.vmap(
            lambda r, v, g, gm: det.label_all_rois(cfg, r, v, g, gm)
        )(batch["rois"], batch["roi_valid"], batch["gt_boxes"], batch["gt_mask"])

        pooled = multilevel_roi_align_batched(
            list(features), batch["rois"], batch["roi_levels"],
            batch["roi_valid"], spatial_scales, cfg.output_size,
            cfg.sampling_ratio, cfg.pool_mode, rotated=cfg.rotated,
            enlarge_scale=cfg.enlarge_scale,
        )
        b, r = pooled.shape[:2]
        flat = pooled.reshape(b * r, *pooled.shape[2:])
        deltas, scores = head_model.apply({"params": head_params}, flat)
        deltas = deltas.reshape(b, r, -1)
        probs = jax.nn.softmax(scores, axis=-1).reshape(b, r, -1)
        refined = cfg.decode(deltas, batch["rois"])
        return {
            "scores": probs,
            "refined_boxes": refined,
            "labels": labels,
            "valid": batch["roi_valid"],
        }

    return eval_step


def make_rcnn_filter_step(cfg, score_threshold, nms_threshold, num_threshold,
                          min_size=1e-3):
    """Stage-2 eval-time proposal filter over a batch (reference
    ``filter_proposals``, ``run_rpn_detect.py:403-439`` applied at
    ``:495-497``).  Returns filter_step(boxes, probs, valid, mesh_sizes) ->
    (boxes, keep, order) with fixed shapes; ``mesh_sizes`` is (B, 3)."""
    from functools import partial

    from nerf_rpn_tpu.models import detector as det

    @jax.jit
    def filter_step(boxes, probs, valid, mesh_sizes):
        fn = partial(
            det.filter_refined_proposals,
            cfg,
            score_threshold=score_threshold,
            nms_threshold=nms_threshold,
            num_threshold=num_threshold,
            min_size=min_size,
        )
        # lax.map, not vmap: vmapped NMS turns its while_loops into
        # worst-case lockstep over the batch (see ops/nms.py notes)
        return jax.lax.map(
            lambda args: fn(boxes=args[0], probs=args[1], valid=args[2],
                            mesh_size=args[3]),
            (boxes, probs, valid, mesh_sizes),
        )

    return filter_step


def make_fcos_eval_step(model, cfg: FCOSConfig, mesh_shape):
    shapes = level_shapes_for(mesh_shape, cfg.fpn_strides)
    loc, level_of, counts, stride_of, soi = fcos_lib.fcos_locations(
        shapes, cfg.fpn_strides
    )

    def _flatten(cls, reg, ctr):
        cls_f = fcos_lib.flatten_fcos_outputs(cls, 1)
        reg_f = fcos_lib.flatten_fcos_outputs(reg, cfg.reg_dim)
        ctr_f = fcos_lib.flatten_fcos_outputs(ctr, 1)
        vox = fcos_lib.fcos_voxel_scores(cls, ctr)
        return cls_f, reg_f, ctr_f, vox

    split = _swin_split_units(model)
    if split is not None:
        from nerf_rpn_tpu.models.heads import FCOSHead3D

        backbone_units, neck = split
        head = FCOSHead3D(in_channels=256, num_convs=model.num_convs,
                          rotate=model.rotated,
                          centerness_on_reg=model.centerness_on_reg,
                          norm_reg_targets=model.norm_reg_targets,
                          fpn_strides=tuple(model.fpn_strides),
                          dtype=model.dtype)

        @jax.jit
        def fwd_neck_head(state, stage_feats):
            pyr = neck(state, stage_feats)
            cls, reg, ctr = head.apply(
                {"params": state.params["fcos_head"]}, list(pyr),
                train=False)
            return _flatten(cls, reg, ctr)

        def forward(state, grids):
            x = grids
            for unit in backbone_units:
                x = unit(state, x)
            return fwd_neck_head(state, x)

        forward_units = (*backbone_units, fwd_neck_head)
    else:
        @jax.jit
        def forward(state, grids):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            feats, cls, reg, ctr = model.apply(variables, grids, train=False)
            return _flatten(cls, reg, ctr)

        forward_units = (forward,)

    @jax.jit
    def propose(cls_f, reg_f, ctr_f, ori_sizes):
        padding = fcos_lib.fcos_padding_mask(loc, ori_sizes)
        return fcos_lib.fcos_inference(
            cfg, cls_f, reg_f, ctr_f, jnp.asarray(loc), counts,
            ori_sizes, padding_mask=padding,
        )

    def eval_step(state, batch):
        cls_f, reg_f, ctr_f, vox = forward(state, batch["grids"])
        out = propose(cls_f, reg_f, ctr_f, batch["ori_sizes"])
        out["voxel_scores"] = vox
        return out

    eval_step.forward = forward
    eval_step.forward_units = forward_units
    eval_step.propose = propose
    return eval_step
