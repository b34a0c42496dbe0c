"""Anchor-based NeRF-RPN driver: train / eval / benchmark.

Flag-compatible with the reference ``nerf_rpn/run_rpn.py`` (same names and
defaults for the public surface: dataset selection, ``--rotated_bbox``,
``--normalize_density``, ``--output_proposals``, the rpn_* hyperparameters,
``--mode {train,eval,benchmark}``, ``--check_arch``).  TPU-specific extras:
``--pad_multiple`` (shape bucketing), ``--max_gt``, ``--bf16``.

The reference's DDP flags (``--gpus``) are accepted but ignored: scale-out
is SPMD over the jax device mesh (all local devices by default).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerf_rpn_tpu.cli import common
from nerf_rpn_tpu.data.datasets import batch_iterator, round_up
from nerf_rpn_tpu.data.loader import prefetch_iterator
from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
from nerf_rpn_tpu.models.rpn import RPNConfig
from nerf_rpn_tpu.train import checkpoint as ckpt_lib
from nerf_rpn_tpu.train.state import create_train_state, make_optimizer
from nerf_rpn_tpu.train.steps import make_rpn_eval_step, make_rpn_train_step
from nerf_rpn_tpu.parallel.mesh import (local_replica, make_mesh_for_batch,
                                         process_barrier, shard_batch)

STRIDES = (4, 8, 16, 32)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train and eval the NeRF RPN (TPU).")
    p.add_argument("--mode", default="train", choices=["train", "eval", "benchmark"])
    p.add_argument("--dataset_name", "-dn", default="hypersim",
                   choices=["hypersim", "front3d", "general", "scannet"])
    p.add_argument("--features_path", default="")
    p.add_argument("--boxes_path", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("--dataset_split", default="")
    p.add_argument("--preload", action="store_true")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--load_backbone_only", action="store_true")
    p.add_argument("--backbone_type", default="resnet",
                   choices=["resnet", "resnet_tiny", "vgg_AF", "vgg_EF",
                            "swin_t", "swin_s", "swin_b", "swin_l"])
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--train_csv", default="")
    p.add_argument("--val_csv", default="")
    p.add_argument("--test_csv", default="")
    p.add_argument("--resolution", type=int, default=160)
    p.add_argument("--rotated_bbox", action="store_true")
    p.add_argument("--normalize_density", action="store_true")
    p.add_argument("--output_proposals", action="store_true")
    p.add_argument("--output_voxel_scores", action="store_true")
    p.add_argument("--filter", choices=["none", "tp", "fp"], default="none")
    p.add_argument("--filter_threshold", type=float, default=0.7)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--rotate_prob", type=float, default=0.5)
    p.add_argument("--flip_prob", type=float, default=0.5)
    p.add_argument("--rot_scale_prob", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--reg_loss_weight", type=float, default=5.0)
    p.add_argument("--reg_loss_weight_2d", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--clip_grad_norm", type=float, default=0.1)
    p.add_argument("--log_to_file", action="store_true")
    p.add_argument("--log_interval", type=int, default=20)
    p.add_argument("--eval_interval", type=int, default=1)
    p.add_argument("--keep_checkpoints", type=int, default=1)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--gpus", default="", help="Ignored: SPMD uses all jax devices.")
    p.add_argument("--rpn_head_conv_depth", type=int, default=4)
    p.add_argument("--rpn_pre_nms_top_n_train", type=int, default=2500)
    p.add_argument("--rpn_pre_nms_top_n_test", type=int, default=2500)
    p.add_argument("--rpn_post_nms_top_n_train", type=int, default=2500)
    p.add_argument("--rpn_post_nms_top_n_test", type=int, default=2500)
    p.add_argument("--rpn_nms_thresh", type=float, default=0.3)
    p.add_argument("--rpn_fg_iou_thresh", type=float, default=0.35)
    p.add_argument("--rpn_bg_iou_thresh", type=float, default=0.2)
    p.add_argument("--rpn_batch_size_per_mesh", type=int, default=256)
    p.add_argument("--rpn_positive_fraction", type=float, default=0.5)
    p.add_argument("--rpn_score_thresh", type=float, default=0.0)
    p.add_argument("--reg_loss_type", default="smooth_l1",
                   choices=["smooth_l1", "iou", "linear_iou", "giou", "diou"])
    p.add_argument("--check_arch", action="store_true")
    p.add_argument("--save_results", action="store_true")
    p.add_argument("--save_results_path", default="")
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
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute path.")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


class Trainer:
    def __init__(self, args):
        common.enable_compilation_cache()
        self.args = args
        self.logger = common.setup_logger(args.save_path, args.log_to_file, "run_rpn")
        self.wandb = common.maybe_wandb(args)
        self.mesh = make_mesh_for_batch(args.batch_size)
        self.eval_mesh = (
            self.mesh if jax.process_count() == 1
            else make_mesh_for_batch(args.batch_size, jax.local_devices()))
        self.box_dim = 7 if args.rotated_bbox else 6
        side = round_up(args.resolution, args.pad_multiple)
        self.mesh_shape = (side, side, side)
        self.model = NeRFRPN(
            backbone_type=args.backbone_type,
            resolution=args.resolution,
            conv_depth=args.rpn_head_conv_depth,
            rotated=args.rotated_bbox,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
        self.cfg_train = self._make_cfg(
            args.rpn_pre_nms_top_n_train, args.rpn_post_nms_top_n_train)
        self.cfg_test = self._make_cfg(
            args.rpn_pre_nms_top_n_test, args.rpn_post_nms_top_n_test)
        self._eval_steps = {}
        self.state = None

    def _make_cfg(self, pre_nms, post_nms):
        a = self.args
        return RPNConfig(
            rotated=a.rotated_bbox,
            fg_iou_thresh=a.rpn_fg_iou_thresh,
            bg_iou_thresh=a.rpn_bg_iou_thresh,
            batch_size_per_mesh=a.rpn_batch_size_per_mesh,
            positive_fraction=a.rpn_positive_fraction,
            pre_nms_top_n=pre_nms,
            post_nms_top_n=post_nms,
            nms_thresh=a.rpn_nms_thresh,
            score_thresh=a.rpn_score_thresh,
            reg_loss_type=a.reg_loss_type,
            reg_loss_weight=a.reg_loss_weight,
            reg_loss_weight_2d=a.reg_loss_weight_2d,
        )

    # -- state ------------------------------------------------------------

    def init_state(self, total_steps: int):
        tx, self.schedule = make_optimizer(
            self.args.lr, total_steps, self.args.weight_decay,
            self.args.clip_grad_norm,
        )
        if self.args.freeze_backbone:
            import optax

            def label(params):
                return {k: ("frozen" if k == "backbone" else "train")
                        for k in params}

            tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()},
                                       label)
        sample = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(self.args.seed), sample, tx)
        if self.args.checkpoint:
            self.state = ckpt_lib.restore_checkpoint(
                self.state, self.args.checkpoint,
                backbone_only=self.args.load_backbone_only,
                load_opt_state=False,
            )
            self.logger.info(f"Loaded checkpoint {self.args.checkpoint}")

    def _batches(self, dataset, shuffle, seed=0, local=False):
        """Yields (host_batch, device_batch) pairs, loaded + transferred up
        to ``--prefetch_batches`` ahead of the consumer (the reference's
        DataLoader(num_workers=4, pin_memory=True) analogue).

        ``local=True`` = the rank-0-only EVAL path (reference evaluates the
        whole val set on rank 0, ``run_rpn.py:359-370``): no process
        sharding and a process-local mesh — a jit over the global mesh
        would deadlock when only rank 0 calls it."""
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
            # bf16 models cast grids at the first conv anyway; casting in the
            # host collate gives identical values, half the transfer, and
            # ~0.45 ms/scene on the embed unit (microbench_embed_layout.py)
            grid_dtype=self.model.dtype,
        )
        mesh = self.eval_mesh if local else self.mesh
        n_mesh = len(mesh.devices.ravel())

        def tx(b):
            m = b["grids"].shape[0]
            if not shuffle and m % n_mesh:
                # ragged trailing EVAL batch (drop_last only trims train
                # batches): re-mesh over a device count dividing it — the
                # eval step recompiles for the new batch shape anyway
                sub = make_mesh_for_batch(m, list(mesh.devices.ravel()))
                return (b, shard_batch(sub, b))
            return (b, shard_batch(mesh, b))

        return prefetch_iterator(
            it, depth=self.args.prefetch_batches, transform=tx)

    # -- train ------------------------------------------------------------

    def train_loop(self):
        args = self.args
        train_set, val_set, _ = common.build_datasets(args, "train", augment=True)
        self.logger.info(
            f"Loaded {len(train_set)} training scenes, {len(val_set)} validation scenes")
        steps_per_epoch = max(1, len(train_set) // args.batch_size)
        self.init_state(args.num_epochs * steps_per_epoch)
        train_step, _ = make_rpn_train_step(
            self.model, self.cfg_train, self.mesh_shape, STRIDES)
        os.makedirs(args.save_path, exist_ok=True)
        key = jax.random.PRNGKey(args.seed)
        best_metric = None
        step = 0
        multiproc = jax.process_count() > 1
        compiled_step = None
        for epoch in range(1, args.num_epochs + 1):
            for i, (_, batch) in enumerate(
                    self._batches(train_set, True, seed=epoch)):
                key, sub = jax.random.split(key)
                if multiproc and compiled_step is None:
                    # AOT-compile then rendezvous: ranks compile the step
                    # graph at different speeds, and a rank that starts
                    # EXECUTING while another still compiles blows the
                    # ~30s CPU-collective handshake (see process_barrier)
                    compiled_step = train_step.lower(
                        self.state, batch, sub).compile()
                    process_barrier("rpn_train_step_compiled")
                    train_step = compiled_step
                t0 = time.perf_counter()
                self.state, metrics = train_step(self.state, batch, sub)
                if i % args.log_interval == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    dt = time.perf_counter() - t0
                    self.logger.info(
                        f"Epoch {epoch} [{i}] loss {metrics['loss']:.4f} "
                        f"obj {metrics['loss_objectness']:.4f} "
                        f"reg {metrics['loss_rpn_box_reg']:.4f} "
                        f"reg2d {metrics['loss_rpn_box_reg_2d']:.4f} "
                        f"({dt:.2f}s/it)")
                    if self.wandb:
                        self.wandb.log({"loss": metrics["loss"],
                                        "objectness_loss": metrics["loss_objectness"],
                                        "regression_loss": metrics["loss_rpn_box_reg"],
                                        # wandb.watch analogue (reference
                                        # run_rpn.py:238-239)
                                        "grad_norm": metrics.get("grad_norm"),
                                        "param_norm": metrics.get("param_norm"),
                                        "epoch": epoch, "iter": step})
                step += 1
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
            # re-align ranks after rank-0's eval/checkpoint (which can
            # exceed the CPU-collective timeout the next step would hit)
            process_barrier(f"rpn_epoch_{epoch}_done")

    # -- eval ---------------------------------------------------------------

    def _save_results(self, names, out, levels_list, offset):
        """Dump FPN level features + RoIs for the RCNN stage (reference
        ``--save_results``, ``run_rpn.py:485-505``): features as flattened
        (C, X, Y, Z) object arrays + per-scene proposals/level_indices."""
        args = self.args
        root = args.save_results_path or os.path.join(args.save_path, "results")
        feat_dir = os.path.join(root, "features")
        roi_dir = os.path.join(root, "proposals")
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(roi_dir, exist_ok=True)
        # float32 at the host boundary (bf16 npz breaks plain-numpy readers)
        feats = [np.asarray(f).astype(np.float32, copy=False)
                 for f in out["features"]]
        boxes = np.asarray(out["boxes"]).astype(np.float32, copy=False)
        scores_v = np.asarray(out["valid"])
        for i, name in enumerate(names):
            # channels-last -> the reference's (C, X, Y, Z) dump layout
            per_level = [np.moveaxis(f[i], -1, 0) for f in feats]
            np.savez(
                os.path.join(feat_dir, f"{name}.npz"),
                level_features=np.array(
                    [f.reshape(-1).astype(object) for f in per_level],
                    dtype=object),
                resolution=np.array([f.shape for f in per_level]),
            )
            v = scores_v[i]
            np.savez(
                os.path.join(roi_dir, f"{name}.npz"),
                proposals=boxes[i][v][:, : self.box_dim],
                level_indices=levels_list[offset + i],
            )

    def eval(self, dataset, write_json=True):
        args = self.args
        key = (self.mesh_shape, args.save_results)
        eval_step = self._eval_steps.get(key)
        if eval_step is None:
            eval_step = make_rpn_eval_step(
                self.model, self.cfg_test, self.mesh_shape, STRIDES,
                return_features=args.save_results)
            self._eval_steps[key] = eval_step
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
                if gt_mask[i].any():
                    gt_boxes_list.append(
                        batch["gt_boxes"][i][gt_mask[i]][:, : self.box_dim])
                else:
                    gt_boxes_list.append(np.zeros((0, self.box_dim), np.float32))
            if args.output_voxel_scores:
                for i, name in enumerate(names):
                    common.output_voxel_scores_npz(
                        args.save_path, name,
                        [np.asarray(v[i]) for v in out["voxel_scores"]],
                        batch["ori_sizes"][i], STRIDES)
            if args.save_results:
                self._save_results(names, out, levels_list,
                                   len(scenes_list) - len(names))
        if args.output_proposals:
            common.output_proposals_npz(
                args.save_path, scenes_list, proposals_list, scores_list,
                gt_boxes_list, args.filter, args.filter_threshold)
        if not any(len(g) for g in gt_boxes_list):
            return None, None
        return common.report_metrics(
            proposals_list, scores_list, gt_boxes_list, args, self.logger,
            args.rpn_post_nms_top_n_test, self.wandb, write_json=write_json)

    # -- benchmark ----------------------------------------------------------

    def benchmark(self, reps=300, warmup=10):
        """Reference benchmark protocol (``run_rpn.py:594-617``): dummy
        (200, 200, 130) grid, mean +- std forward latency."""
        args = self.args
        side = args.pad_multiple
        shape = tuple(round_up(s, side) for s in (200, 200, 130))
        self.mesh_shape = shape
        if self.state is None:
            self.init_state(1)
        eval_step = make_rpn_eval_step(self.model, self.cfg_test, shape, STRIDES)
        grids = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, *shape, 4)),
            self.model.dtype)
        ori = jnp.asarray([[200, 200, 130]], jnp.int32)

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
    if args.check_arch:
        sample = jnp.zeros((1, 64, 64, 64, 4), jnp.float32)
        variables = trainer.model.init(jax.random.PRNGKey(0), sample)
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        trainer.logger.info(f"Model builds OK; {n_params / 1e6:.2f}M params")
        return
    if args.mode == "train":
        trainer.train_loop()
    elif args.mode == "eval":
        trainer.init_state(1)
        if args.output_all:
            # proposals for train/val/test alike (reference --output_all)
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
