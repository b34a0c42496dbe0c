"""Anchor-free FCOS driver: train / eval / benchmark.

Flag-compatible with the reference ``nerf_rpn/run_fcos.py`` (same public
flags: ``--dataset``, ``--rotated_bbox``, ``--norm_reg_targets``,
``--centerness_on_reg``, ``--iou_loss_type``, the FCOSPostProcessor
parameters, ``--save_level_index``...).  TPU extras as in run_rpn.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.cli import common
from nerf_rpn_tpu.data.datasets import batch_iterator, round_up
from nerf_rpn_tpu.data.loader import prefetch_iterator
from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
from nerf_rpn_tpu.models.fcos import FCOSConfig
from nerf_rpn_tpu.train import checkpoint as ckpt_lib
from nerf_rpn_tpu.train.state import create_train_state, make_optimizer
from nerf_rpn_tpu.train.steps import make_fcos_eval_step, make_fcos_train_step
from nerf_rpn_tpu.parallel.mesh import (local_replica, make_mesh_for_batch,
                                         process_barrier, shard_batch)

STRIDES = (4, 8, 16, 32)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train and eval NeRF RPN with FCOS (TPU).")
    p.add_argument("--mode", default="train", choices=["train", "eval", "benchmark"])
    p.add_argument("--dataset", "--dataset_name", dest="dataset_name",
                   default="hypersim",
                   choices=["hypersim", "front3d", "general", "scannet"])
    p.add_argument("--features_path", default="")
    p.add_argument("--boxes_path", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("--dataset_split", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--load_backbone_only", action="store_true")
    p.add_argument("--preload", action="store_true")
    p.add_argument("--train_csv", default="")
    p.add_argument("--val_csv", default="")
    p.add_argument("--test_csv", default="")
    p.add_argument("--backbone_type", default="swin_s",
                   choices=["resnet", "resnet_tiny", "vgg_AF", "vgg_EF",
                            "swin_t", "swin_s", "swin_b", "swin_l"])
    p.add_argument("--input_dim", type=int, default=4)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--normalize_density", action="store_true")
    p.add_argument("--output_proposals", action="store_true")
    p.add_argument("--save_level_index", action="store_true")
    p.add_argument("--filter", choices=["none", "tp", "fp"], default="none")
    p.add_argument("--filter_threshold", type=float, default=0.7)
    p.add_argument("--output_voxel_scores", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reg_loss_weight", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--clip_grad_norm", type=float, default=0.1)
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--log_to_file", action="store_true")
    p.add_argument("--eval_interval", type=int, default=1)
    p.add_argument("--keep_checkpoints", type=int, default=1)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--rotate_prob", type=float, default=0.5)
    p.add_argument("--flip_prob", type=float, default=0.5)
    p.add_argument("--rot_scale_prob", type=float, default=0.5)
    p.add_argument("--gpus", default="", help="Ignored: SPMD uses all jax devices.")
    p.add_argument("--num_convs", type=int, default=4)
    p.add_argument("--norm_reg_targets", action="store_true")
    p.add_argument("--centerness_on_reg", action="store_true")
    p.add_argument("--center_sampling_radius", type=float, default=1.5)
    p.add_argument("--iou_loss_type", default="iou",
                   choices=["iou", "linear_iou", "giou", "diou", "smooth_l1"])
    p.add_argument("--use_additional_l1_loss", action="store_true")
    p.add_argument("--conv_at_start", action="store_true")
    p.add_argument("--proj2d_loss_weight", type=float, default=0.0)
    p.add_argument("--pre_nms_top_n", type=int, default=2500)
    p.add_argument("--fpn_post_nms_top_n", type=int, default=2500)
    p.add_argument("--nms_thresh", type=float, default=0.3)
    p.add_argument("--pre_nms_thresh", type=float, default=0.0)
    p.add_argument("--min_size", type=float, default=0.0)
    p.add_argument("--ap_top_n", type=int, default=None)
    p.add_argument("--output_all", action="store_true")
    # TPU extras
    p.add_argument("--pad_multiple", type=int, default=32)
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=4,
                   help="Sample-loading threads (reference DataLoader "
                        "num_workers); 0 = load in-line.")
    p.add_argument("--prefetch_batches", type=int, default=2,
                   help="Batches assembled + device-transferred ahead of "
                        "the step; 0 disables background prefetch.")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


class Trainer:
    def __init__(self, args):
        common.enable_compilation_cache()
        self.args = args
        self.logger = common.setup_logger(args.save_path, args.log_to_file, "run_fcos")
        self.wandb = common.maybe_wandb(args)
        self.mesh = make_mesh_for_batch(args.batch_size)
        self.eval_mesh = (
            self.mesh if jax.process_count() == 1
            else make_mesh_for_batch(args.batch_size, jax.local_devices()))
        self.box_dim = 7 if args.rotated_bbox else 6
        side = round_up(args.resolution, args.pad_multiple)
        self.mesh_shape = (side, side, side)
        self.model = FCOSOverNeRF(
            backbone_type=args.backbone_type,
            resolution=args.resolution,
            num_convs=args.num_convs,
            rotated=args.rotated_bbox,
            norm_reg_targets=args.norm_reg_targets,
            centerness_on_reg=args.centerness_on_reg,
            fpn_strides=STRIDES,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        self.cfg = FCOSConfig(
            rotated=args.rotated_bbox,
            fpn_strides=STRIDES,
            center_sampling_radius=args.center_sampling_radius,
            iou_loss_type=args.iou_loss_type,
            norm_reg_targets=args.norm_reg_targets,
            use_additional_l1_loss=args.use_additional_l1_loss,
            proj2d_loss_weight=args.proj2d_loss_weight,
            pre_nms_thresh=args.pre_nms_thresh,
            pre_nms_top_n=args.pre_nms_top_n,
            nms_thresh=args.nms_thresh,
            fpn_post_nms_top_n=args.fpn_post_nms_top_n,
            min_size=args.min_size,
        )
        self.state = None

    def init_state(self, total_steps: int):
        tx, self.schedule = make_optimizer(
            self.args.lr, total_steps, self.args.weight_decay,
            self.args.clip_grad_norm)
        sample = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(self.args.seed), sample, tx)
        if self.args.checkpoint:
            self.state = ckpt_lib.restore_checkpoint(
                self.state, self.args.checkpoint,
                backbone_only=self.args.load_backbone_only,
                load_opt_state=False)
            self.logger.info(f"Loaded checkpoint {self.args.checkpoint}")

    def _batches(self, dataset, shuffle, seed=0, local=False):
        """(host_batch, device_batch) pairs, prefetched ahead of the step
        (see run_rpn.py._batches; ``local=True`` = the rank-0-only eval
        path: no process sharding, process-local mesh)."""
        it = batch_iterator(
            dataset,
            self.args.batch_size if local
            else common.local_batch_size(self.args.batch_size),
            shuffle=shuffle, seed=seed,
            pad_multiple=self.args.pad_multiple, max_gt=self.args.max_gt,
            box_dim=self.box_dim, fixed_shape=self.mesh_shape,
            # drop ragged trailing train batches: a different batch dim
            # would force a fresh (minutes-long) compile
            drop_last=shuffle,
            process_index=0 if local else jax.process_index(),
            process_count=1 if local else jax.process_count(),
            num_workers=self.args.num_workers,
            # host-side cast to the model dtype (identical values, half the
            # transfer; see run_rpn.py._batches)
            grid_dtype=self.model.dtype)
        mesh = self.eval_mesh if local else self.mesh
        n_mesh = len(mesh.devices.ravel())

        def tx(b):
            m = b["grids"].shape[0]
            if not shuffle and m % n_mesh:
                # ragged trailing EVAL batch: re-mesh over a divisor count
                # (the eval step recompiles for the new batch shape anyway)
                sub = make_mesh_for_batch(m, list(mesh.devices.ravel()))
                return (b, shard_batch(sub, b))
            return (b, shard_batch(mesh, b))

        return prefetch_iterator(
            it, depth=self.args.prefetch_batches, transform=tx)

    def train_loop(self):
        args = self.args
        train_set, val_set, _ = common.build_datasets(args, "train", augment=True)
        self.logger.info(
            f"Loaded {len(train_set)} training scenes, {len(val_set)} validation scenes")
        steps_per_epoch = max(1, len(train_set) // args.batch_size)
        self.init_state(args.num_epochs * steps_per_epoch)
        train_step, _ = make_fcos_train_step(self.model, self.cfg, self.mesh_shape)
        os.makedirs(args.save_path, exist_ok=True)
        key = jax.random.PRNGKey(args.seed)
        best_metric = None
        multiproc = jax.process_count() > 1
        compiled_step = None
        for epoch in range(1, args.num_epochs + 1):
            for i, (_, batch) in enumerate(
                    self._batches(train_set, True, seed=epoch)):
                key, sub = jax.random.split(key)
                if multiproc and compiled_step is None:
                    # AOT-compile + rendezvous: see mesh.process_barrier
                    compiled_step = train_step.lower(
                        self.state, batch, sub).compile()
                    process_barrier("fcos_train_step_compiled")
                    train_step = compiled_step
                self.state, metrics = train_step(self.state, batch, sub)
                if i % args.log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    self.logger.info(
                        f"Epoch {epoch} [{i}] loss {m['loss']:.4f} "
                        f"cls {m['loss_cls']:.4f} reg {m['loss_reg']:.4f} "
                        f"ctr {m['loss_centerness']:.4f}")
                    if self.wandb:
                        self.wandb.log({**m, "epoch": epoch})
            if jax.process_index() == 0 and (
                    epoch % args.eval_interval == 0 or epoch == args.num_epochs):
                recalls, aps = self.eval(val_set, write_json=False)
                metric = recalls[-1] if recalls else -1.0
                if best_metric is None or metric > best_metric:
                    best_metric = metric
                    ckpt_lib.save_checkpoint(
                        self.state, os.path.join(args.save_path, "model_best"),
                        vars(args))
                ckpt_lib.save_checkpoint(
                    self.state, os.path.join(args.save_path, f"epoch_{epoch}"),
                    vars(args))
                ckpt_lib.delete_old_checkpoints(args.save_path, args.keep_checkpoints)
            # re-align ranks after rank-0's eval/checkpoint
            process_barrier(f"fcos_epoch_{epoch}_done")

    def eval(self, dataset, write_json=True):
        args = self.args
        eval_step = make_fcos_eval_step(self.model, self.cfg, self.mesh_shape)
        # rank-local eval needs a rank-local copy of the (global-mesh) state
        state = (self.state if jax.process_count() == 1
                 else local_replica(self.state))
        proposals_list, scores_list, levels_list = [], [], []
        gt_boxes_list, scenes_list = [], []
        for batch, sb in self._batches(dataset, False, local=True):
            names = batch["names"]
            gt_mask = batch["gt_mask"]
            out = eval_step(state, sb)
            props, scs, lvls = common.unmask_proposals(out, self.box_dim)
            proposals_list.extend(props)
            scores_list.extend(scs)
            levels_list.extend(lvls)
            scenes_list.extend(names)
            for i in range(len(names)):
                gt = batch["gt_boxes"][i][gt_mask[i]][:, : self.box_dim]
                gt_boxes_list.append(gt.astype(np.float32))
            if args.output_voxel_scores:
                for i, name in enumerate(names):
                    common.output_voxel_scores_npz(
                        args.save_path, name,
                        [np.asarray(v[i]) for v in out["voxel_scores"]],
                        batch["ori_sizes"][i], STRIDES)
        if args.output_proposals:
            common.output_proposals_npz(
                args.save_path, scenes_list, proposals_list, scores_list,
                gt_boxes_list, args.filter, args.filter_threshold,
                level_indices=levels_list if args.save_level_index else None)
        if not any(len(g) for g in gt_boxes_list):
            return None, None
        return common.report_metrics(
            proposals_list, scores_list, gt_boxes_list, args, self.logger,
            args.fpn_post_nms_top_n, self.wandb, write_json=write_json)

    def benchmark(self, reps=300, warmup=10):
        """Reference protocol (``run_fcos.py:537-560``): dummy 160^3 grid."""
        args = self.args
        shape = tuple(round_up(s, args.pad_multiple) for s in (160, 160, 160))
        self.mesh_shape = shape
        if self.state is None:
            self.init_state(1)
        eval_step = make_fcos_eval_step(self.model, self.cfg, shape)
        grids = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, *shape, 4)),
            jnp.float32)
        ori = jnp.asarray([[160, 160, 160]], jnp.int32)

        # eval_step is two compile units; don't re-wrap it in an outer jit
        perturb = jax.jit(lambda g, c: g + (c * 1e-20).astype(g.dtype))
        summarize = jax.jit(lambda out: jnp.sum(out["scores"]))

        def step(state, grids, ori, carry):
            out = eval_step(state, {"grids": perturb(grids, carry),
                                    "ori_sizes": ori})
            return summarize(out)

        from nerf_rpn_tpu.utils.profiling import benchmark_fn

        mean_s = benchmark_fn(
            lambda carry: step(self.state, grids, ori, carry),
            warmup=warmup, reps=reps)
        self.logger.info(f"Average inference time: {mean_s * 1e3:.4f} ms "
                         f"({1.0 / mean_s:.2f} scenes/sec)")
        return mean_s * 1e3


def main(argv=None):
    args = parse_args(argv)
    trainer = Trainer(args)
    if args.mode == "train":
        trainer.train_loop()
    elif args.mode == "eval":
        trainer.init_state(1)
        if args.output_all:
            train_set, val_set, _ = common.build_datasets(args, "train",
                                                          augment=False)
            _, _, test_set = common.build_datasets(args, "eval", augment=False)
            for ds in (train_set, val_set, test_set):
                if ds is not None and len(ds):
                    trainer.eval(ds)
        else:
            _, _, test_set = common.build_datasets(args, "eval", augment=False)
            trainer.eval(test_set)
    else:
        trainer.benchmark()


if __name__ == "__main__":
    main()
