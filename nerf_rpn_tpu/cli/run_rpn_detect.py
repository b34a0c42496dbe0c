"""RCNN objectness second-stage driver: train / eval.

Flag-compatible with the reference ``nerf_rpn/run_rpn_detect.py`` (same
public flags: ``--rois_path``, ``--fine_tune``, ``--cls_batch_size``,
``--fg_threshold``/``--bg_threshold``, ``--output_size``, ``--remap``,
``--is_add_layer``, ``--is_flatten``, ``--rotated_bbox``...).  The CUDA
ROIAlign flag ``--use_cuda`` is accepted and ignored (the TPU path is always
the Pallas/gather align).
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.cli import common
from nerf_rpn_tpu.data.datasets import (
    RPNClassificationDataset,
    collate_classification_batch,
    load_split,
)
from nerf_rpn_tpu.evaluation.metrics import (
    evaluate_box_proposals_ap,
    evaluate_classification,
)
from nerf_rpn_tpu.models.detector import RCNNConfig, RCNNHead
from nerf_rpn_tpu.models.nerf_rpn import build_backbone
from nerf_rpn_tpu.data.loader import prefetch_iterator
from nerf_rpn_tpu.ops.roi_align import map_rois_to_levels_np
from nerf_rpn_tpu.parallel.mesh import (local_replica, make_mesh_for_batch,
                                         process_barrier, shard_batch)
from nerf_rpn_tpu.train import checkpoint as ckpt_lib
from nerf_rpn_tpu.train.state import make_optimizer
from nerf_rpn_tpu.train.steps import (
    make_rcnn_eval_step,
    make_rcnn_filter_step,
    make_rcnn_train_step,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="RCNN second stage (TPU).")
    p.add_argument("--mode", default="train", choices=["train", "eval"])
    p.add_argument("--features_path", default="")
    p.add_argument("--boxes_path", default="")
    p.add_argument("--rois_path", default="")
    p.add_argument("--save_root", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("--dataset_split", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--pretrained", default="", help="Pretrained backbone (fine_tune).")
    p.add_argument("--fine_tune", action="store_true")
    p.add_argument("--backbone_type", default="resnet",
                   choices=["resnet", "resnet_tiny", "vgg_AF", "vgg_EF",
                            "swin"])
    p.add_argument("--backbone_input_dim", type=int, default=4)
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--normalize_density", action="store_true")
    p.add_argument("--output_proposals", action="store_true")
    p.add_argument("--filter", choices=["none", "tp", "fp"], default="none")
    p.add_argument("--filter_threshold", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reg_loss_weight", type=float, default=5.0)
    p.add_argument("--weight_decay", type=float, default=0.0005)
    p.add_argument("--clip_grad_norm", type=float, default=0.1)
    p.add_argument("--rotate_prob", type=float, default=0.5)
    p.add_argument("--flip_prob", type=float, default=0.5)
    p.add_argument("--rot_scale_prob", type=float, default=0.5)
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--eval_interval", type=int, default=1)
    p.add_argument("--keep_checkpoints", type=int, default=1)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--gpus", default="", help="Ignored: SPMD uses all jax devices.")
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--output_size", nargs="+", type=int, default=[4, 4, 4])
    p.add_argument("--spatial_scale", nargs="+", type=int, default=[4, 8, 16, 32])
    p.add_argument("--feature_input_dim", type=int, default=256)
    p.add_argument("--obj_only", action="store_true")
    p.add_argument("--enlarge_scale", type=float, default=0.2)
    p.add_argument("--use_cuda", action="store_true", help="Ignored on TPU.")
    p.add_argument("--remap", action="store_true")
    p.add_argument("--is_add_layer", action="store_true")
    p.add_argument("--feature_extracting_type", default="pooling",
                   choices=["pooling", "interpolation"])
    p.add_argument("--nms_thresh", type=float, default=0.1)
    p.add_argument("--filter_score_threhold", type=float, default=0.5)
    p.add_argument("--filter_num_threhold", type=float, default=300)
    p.add_argument("--cls_batch_size", type=int, default=512)
    p.add_argument("--fg_fraction", type=float, default=0.5)
    p.add_argument("--fg_threshold", type=float, default=0.35)
    p.add_argument("--bg_threshold", type=float, default=0.15)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--is_flatten", action="store_true")
    p.add_argument("--log_to_file", action="store_true")
    p.add_argument("--output_all", action="store_true")
    # TPU extras
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute path.")
    p.add_argument("--max_rois", type=int, default=1024)
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=4,
                   help="Sample-loading threads (reference DataLoader "
                        "num_workers); 0 = load in-line.")
    p.add_argument("--prefetch_batches", type=int, default=2,
                   help="Batches assembled + device-transferred ahead of "
                        "the step; 0 disables background prefetch.")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


class Trainer:
    def __init__(self, args):
        common.enable_compilation_cache()
        self.args = args
        if args.save_root and not args.save_path:
            args.save_path = os.path.join(args.save_root, "rcnn")
        self.logger = common.setup_logger(args.save_path, args.log_to_file,
                                          "run_rpn_detect")
        self.wandb = common.maybe_wandb(args)
        self.mesh = make_mesh_for_batch(args.batch_size)
        self.eval_mesh = (
            self.mesh if jax.process_count() == 1
            else make_mesh_for_batch(args.batch_size, jax.local_devices()))
        self.box_dim = 7 if args.rotated_bbox else 6
        self.cfg = RCNNConfig(
            rotated=args.rotated_bbox,
            batch_size=args.cls_batch_size,
            fg_fraction=args.fg_fraction,
            fg_threshold=args.fg_threshold,
            bg_threshold=args.bg_threshold,
            output_size=tuple(args.output_size),
            enlarge_scale=args.enlarge_scale,
            pool_mode="avg" if args.feature_extracting_type == "interpolation" else "max",
            remap_levels=args.remap,
        )
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        self.head = RCNNHead(
            in_channels=args.feature_input_dim,
            n_classes=args.n_classes,
            rotated=args.rotated_bbox,
            add_conv_layers=args.is_add_layer,
            flatten=args.is_flatten,
            dtype=dtype,
        )
        bb_type = "swin_s" if args.backbone_type == "swin" else args.backbone_type
        self.backbone = (
            build_backbone(bb_type, args.resolution, dtype=dtype)
            if args.fine_tune else None
        )
        self.spatial_scales = tuple(args.spatial_scale)
        self.state = None

    def _dataset(self, scenes, augment=False):
        """``augment``: fine-tune train set only (reference passes the
        rotate/flip/rot_scale probs only to the train dataset,
        ``run_rpn_detect.py:280-285``)."""
        a = self.args
        return RPNClassificationDataset(
            a.features_path, a.boxes_path, a.rois_path,
            scene_names=scenes, fine_tune=a.fine_tune,
            normalize_density=a.normalize_density,
            flip_prob=a.flip_prob if augment else 0.0,
            rotate_prob=a.rotate_prob if augment else 0.0,
            rot_scale_prob=a.rot_scale_prob if augment else 0.0,
            seed=a.seed,
        )

    def _collate(self, samples):
        batch = collate_classification_batch(
            samples, max_rois=self.args.max_rois, max_gt=self.args.max_gt,
            box_dim=self.box_dim,
        )
        if self.args.remap:
            # numpy on purpose: this runs on the host per batch, and a jnp
            # call here would cost a device round-trip per training batch
            n = len(self.spatial_scales)
            batch["roi_levels"] = map_rois_to_levels_np(
                batch["rois"], 0, n - 1,
                canonical_scale=self.cfg.canonical_scale,
                canonical_level=self.cfg.canonical_level)
        return batch

    def init_state(self, total_steps, sample_batch):
        tx, _ = make_optimizer(self.args.lr, total_steps,
                               self.args.weight_decay, self.args.clip_grad_norm)
        pooled_shape = (1, *self.cfg.output_size, self.args.feature_input_dim)
        key = jax.random.PRNGKey(self.args.seed)
        if self.backbone is not None:
            import optax
            from flax.core import FrozenDict

            bvars = self.backbone.init(
                key, jnp.zeros((1, 32, 32, 32, self.args.backbone_input_dim)))
            hvars = self.head.init(key, jnp.zeros(pooled_shape))
            params = {"backbone": bvars["params"], "head": hvars["params"]}
            from nerf_rpn_tpu.train.state import TrainState

            self.state = TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                batch_stats=bvars.get("batch_stats", FrozenDict()),
                opt_state=tx.init(params), tx=tx)
        else:
            hvars = self.head.init(key, jnp.zeros(pooled_shape))
            from flax.core import FrozenDict
            from nerf_rpn_tpu.train.state import TrainState

            self.state = TrainState(
                step=jnp.zeros((), jnp.int32), params=hvars["params"],
                batch_stats=FrozenDict(), opt_state=tx.init(hvars["params"]),
                tx=tx)
        if self.args.pretrained and self.backbone is not None:
            # initialise the fine-tune backbone from a stage-1 checkpoint
            # (reference --pretrained, run_rpn_detect.py:279-300)
            try:
                raw = ckpt_lib.load_raw_checkpoint(self.args.pretrained)
                params = dict(self.state.params)
                params["backbone"] = raw["params"]["backbone"]
                # stage-1 batch_stats nest under 'backbone'; the fine-tune
                # state's stats are the backbone's own tree
                bs = (raw.get("batch_stats") or {}).get("backbone")
                self.state = self.state.replace(
                    params=params,
                    batch_stats=bs if bs else self.state.batch_stats)
                self.logger.info(
                    f"Loaded pretrained backbone {self.args.pretrained}")
            except Exception as e:
                self.logger.warning(
                    f"Could not load pretrained backbone: {e}")
        if self.args.checkpoint:
            self.state = ckpt_lib.restore_checkpoint(self.state, self.args.checkpoint)
            self.logger.info(f"Loaded checkpoint {self.args.checkpoint}")

    def _batches(self, dataset, shuffle=False, seed=0, local=False):
        """Process-sharded batches (the reference's ``DistributedSampler``,
        ``run_rpn_detect.py:291-295``).  Train (shuffle) drops the ragged
        trailing batch to keep one compiled batch shape; eval pads it by
        repeating the last scene.  Yields (host_batch, device_batch, n_real)
        with loading + transfer prefetched ahead of the step (the reference's
        DataLoader(num_workers=4, pin_memory=True) analogue).
        ``local=True`` = the rank-0-only eval path: no process sharding,
        process-local mesh."""
        order = np.arange(len(dataset))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        world = 1 if local else jax.process_count()
        if world > 1:
            # pad every rank to ceil(n/world) (DistributedSampler wrap) so
            # all ranks run the same number of jitted collective steps
            total = -(-len(order) // world) * world
            if total > len(order):
                order = np.concatenate([order, order[: total - len(order)]])
            order = order[jax.process_index()::world]
        bs = (self.args.batch_size if local
              else common.local_batch_size(self.args.batch_size))
        nw = self.args.num_workers
        pool = ThreadPoolExecutor(nw) if nw > 0 else None

        def gen():
            try:
                for start in range(0, len(order), bs):
                    idx = order[start : start + bs]
                    n_real = len(idx)
                    if n_real < bs:
                        if shuffle:
                            break
                        idx = np.concatenate(
                            [idx, np.repeat(idx[-1:], bs - n_real)])
                    if pool is not None:
                        samples = list(
                            pool.map(dataset.__getitem__, map(int, idx)))
                    else:
                        samples = [dataset[int(i)] for i in idx]
                    yield self._collate(samples), n_real
            finally:
                if pool is not None:
                    pool.shutdown(wait=False, cancel_futures=True)

        mesh = self.eval_mesh if local else self.mesh
        return prefetch_iterator(
            gen(), depth=self.args.prefetch_batches,
            transform=lambda bn: (bn[0], shard_batch(mesh, bn[0]), bn[1]))

    def train_loop(self):
        args = self.args
        train_scenes, val_scenes, _ = load_split(args.dataset_split)
        train_set = self._dataset(train_scenes, augment=args.fine_tune)
        val_set = self._dataset(val_scenes)
        self.logger.info(f"{len(train_set)} train / {len(val_set)} val scenes")
        steps = max(1, len(train_set) // args.batch_size) * args.num_epochs
        first = self._collate([train_set[0]] * args.batch_size)
        self.init_state(steps, first)
        rois_per_image = max(1, args.cls_batch_size // args.batch_size)
        train_step = make_rcnn_train_step(
            self.head, self.cfg, self.spatial_scales, rois_per_image,
            backbone=self.backbone, reg_loss_weight=args.reg_loss_weight,
            obj_only=args.obj_only)
        os.makedirs(args.save_path, exist_ok=True)
        key = jax.random.PRNGKey(args.seed)
        best = None
        multiproc = jax.process_count() > 1
        compiled_step = None
        for epoch in range(1, args.num_epochs + 1):
            for i, (_, arrays, _n) in enumerate(
                self._batches(train_set, True, seed=epoch)
            ):
                key, sub = jax.random.split(key)
                if multiproc and compiled_step is None:
                    # AOT-compile + rendezvous: see mesh.process_barrier
                    compiled_step = train_step.lower(
                        self.state, arrays, sub).compile()
                    process_barrier("rcnn_train_step_compiled")
                    train_step = compiled_step
                self.state, metrics = train_step(self.state, arrays, sub)
                if i % args.log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    self.logger.info(
                        f"Epoch {epoch} [{i}] loss {m['loss']:.4f} "
                        f"obj {m['loss_objectness']:.4f} "
                        f"reg {m['loss_rpn_box_reg']:.4f}")
            if jax.process_index() == 0 and (
                    epoch % args.eval_interval == 0 or epoch == args.num_epochs):
                metric = self.eval(val_set)
                if best is None or metric > best:
                    best = metric
                    ckpt_lib.save_checkpoint(
                        self.state, os.path.join(args.save_path, "model_best"),
                        vars(args))
                ckpt_lib.save_checkpoint(
                    self.state, os.path.join(args.save_path, f"epoch_{epoch}"),
                    vars(args))
                ckpt_lib.delete_old_checkpoints(args.save_path,
                                                args.keep_checkpoints)
            # re-align ranks after rank-0's eval/checkpoint
            process_barrier(f"rcnn_epoch_{epoch}_done")

    def eval(self, dataset):
        args = self.args
        eval_step = make_rcnn_eval_step(self.head, self.cfg,
                                        self.spatial_scales,
                                        backbone=self.backbone)
        # refined proposals are filtered before AP / output (reference
        # filter_proposals applied at run_rpn_detect.py:495-497)
        filter_step = make_rcnn_filter_step(
            self.cfg, args.filter_score_threhold, args.nms_thresh,
            int(args.filter_num_threhold))
        # rank-local eval needs a rank-local copy of the (global-mesh) state
        state = (self.state if jax.process_count() == 1
                 else local_replica(self.state))
        scores_list, labels_list = [], []
        refined_list, filt_scores_list, gt_list, names = [], [], [], []
        for batch, arrays, n_real in self._batches(dataset, local=True):
            out = eval_step(state, arrays)
            # "mesh size" for clipping: level-0 feature shape x stride-4
            # scale (grid shape x scale in fine-tune, reproducing the
            # reference's degenerate fine-tune sizes, run_rpn_detect.py:495)
            mesh_sizes = (
                batch["feat_shapes"] * self.spatial_scales[0]
            ).astype(np.float32)
            fboxes, keep, order = filter_step(
                out["refined_boxes"], out["scores"], out["valid"],
                jnp.asarray(mesh_sizes))
            # float32 at the host boundary (bf16 breaks plain-numpy readers)
            probs = np.asarray(out["scores"]).astype(np.float32, copy=False)
            labels = np.asarray(out["labels"])
            valid = np.asarray(out["valid"])
            fboxes = np.asarray(fboxes).astype(np.float32, copy=False)
            keep, order = np.asarray(keep), np.asarray(order)
            for i in range(n_real):
                v = valid[i]
                # classification metrics over all valid rois (unfiltered)
                scores_list.append(probs[i][v][:, 1])
                labels_list.append(labels[i][v].astype(np.int32))
                # AP over the filtered set, score-descending
                ranked = order[i][keep[i][order[i]]]
                refined_list.append(fboxes[i][ranked][:, : self.box_dim])
                filt_scores_list.append(probs[i][ranked][:, 1])
                gt_list.append(batch["gt_boxes"][i][batch["gt_mask"][i]])
                names.append(batch["names"][i])
        cls = evaluate_classification(scores_list, labels_list, 0.5)
        self.logger.info(
            f"cls precision {cls['precision']:.4f} accuracy {cls['accuracy']:.4f} "
            f"precision@100 {cls['precision_100']:.4f}")
        ap25 = evaluate_box_proposals_ap(refined_list, filt_scores_list,
                                         gt_list, 0.25, args.top_k)
        ap50 = evaluate_box_proposals_ap(refined_list, filt_scores_list,
                                         gt_list, 0.5, args.top_k)
        self.logger.info(f"AP@25 {ap25['ap']:.4f}  AP@50 {ap50['ap']:.4f}")
        if args.save_path:
            # eval.json, mirroring the stage-1 drivers' convention (the
            # reference stage-2 only logs; a machine-readable dump feeds
            # the synthetic quality gate)
            os.makedirs(args.save_path, exist_ok=True)
            clean = {
                k: {kk: (vv.tolist() if isinstance(vv, np.ndarray) else vv)
                    for kk, vv in v.items()}
                for k, v in (("ap_25", ap25), ("ap_50", ap50))
            }
            clean["classification"] = {k: float(v) for k, v in cls.items()}
            with open(os.path.join(args.save_path, "eval.json"), "w") as f:
                json.dump(clean, f, indent=2)
        if args.output_proposals:
            common.output_proposals_npz(
                args.save_path, names, refined_list, filt_scores_list,
                gt_list, args.filter, args.filter_threshold)
        return cls["accuracy"]


def main(argv=None):
    args = parse_args(argv)
    trainer = Trainer(args)
    if args.mode == "train":
        trainer.train_loop()
    else:
        _, _, test_scenes = load_split(args.dataset_split)
        test_set = trainer._dataset(test_scenes)
        first = trainer._collate([test_set[0]] * args.batch_size)
        trainer.init_state(1, first)
        trainer.eval(test_set)


if __name__ == "__main__":
    main()
