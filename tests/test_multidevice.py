"""SPMD equivalence: the same step on 1 vs 8 devices gives the same numbers.

The jax analogue of 'test multi-node without a cluster' (SURVEY 4): batches
sharded over a virtual 8-CPU-device mesh must produce the same losses and
proposals as the single-device run — XLA inserts the cross-device reductions
and they must match the unsharded math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
from nerf_rpn_tpu.models.rpn import RPNConfig
from nerf_rpn_tpu.parallel.mesh import DATA_AXIS, make_mesh
from nerf_rpn_tpu.train.state import create_train_state, make_optimizer
from nerf_rpn_tpu.train.steps import make_rpn_eval_step, make_rpn_train_step

MESH_SHAPE = (32, 32, 32)
SIZES = ((8.0,), (16.0,))
RATIOS = (((1.0, 1.0, 1.0),), ((1.0, 1.0, 1.0),))

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup():
    model = NeRFRPN(backbone_type="resnet_tiny", resolution=32, conv_depth=1,
                    num_anchors=1)
    cfg = RPNConfig(anchor_sizes=SIZES, aspect_ratios=RATIOS,
                    pre_nms_top_n=64, post_nms_top_n=32)
    tx, _ = make_optimizer(1e-3, 10)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, *MESH_SHAPE, 4)), tx)
    rng = np.random.default_rng(0)
    b = 8
    grids = rng.uniform(0, 1, (b, *MESH_SHAPE, 4)).astype(np.float32)
    gt = np.zeros((b, 2, 6), np.float32)
    for i in range(b):
        lo = rng.integers(2, 14, (2, 3))
        gt[i, :, :3] = lo
        gt[i, :, 3:] = lo + rng.integers(6, 10, (2, 3))
    batch = {
        "grids": grids,
        "ori_sizes": np.full((b, 3), 32, np.int32),
        "gt_boxes": gt,
        "gt_mask": np.ones((b, 2), bool),
    }
    return model, cfg, state, batch


def _run(state, batch, step_fn, devices, key):
    mesh = make_mesh(devices)
    with mesh:
        sh = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        dbatch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        dstate = jax.device_put(state, repl)
        return step_fn(dstate, dbatch, key)


def test_train_step_1_vs_8_devices():
    model, cfg, state, batch = _setup()
    train_step, _ = make_rpn_train_step(model, cfg, MESH_SHAPE, (4, 8))
    key = jax.random.PRNGKey(1)
    s1, m1 = _run(state, batch, train_step, jax.devices()[:1], key)
    s8, m8 = _run(state, batch, train_step, jax.devices()[:8], key)
    for k in m1:
        # grad_norm is looser by design: every backbone conv feeds a
        # BatchNorm whose backward projects the cotangent to zero mean per
        # channel, so backbone conv weight-grads are near-cancellation sums
        # at random init and f32 reduction order under different
        # partitionings moves them 1-12% relative (probed: head grads match
        # to 2e-4 at any device count; backbone grads wobble
        # non-monotonically with device count for BOTH stem variants; the
        # raw stem-conv VJP alone is sharding-stable to 5e-7, so this is
        # conditioning, not a partitioner bug).  The global norm is
        # dominated by the well-conditioned head grads, so 5e-3 still
        # catches real divergence.
        rtol = 5e-3 if k == "grad_norm" else 2e-4
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=rtol,
                                   err_msg=k)
    # updated parameters agree too (atol: one AdamW update is ~lr-sized and
    # near-zero gradients can flip sign under cross-device reduction order,
    # so allow a couple of update quanta)
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_eval_step_1_vs_8_devices():
    model, cfg, state, batch = _setup()
    eval_step = make_rpn_eval_step(model, cfg, MESH_SHAPE, (4, 8))
    batch = {k: v for k, v in batch.items() if k in ("grids", "ori_sizes")}

    def run(devs):
        mesh = make_mesh(devs)
        with mesh:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            repl = NamedSharding(mesh, P())
            b = {k: jax.device_put(v, sh) for k, v in batch.items()}
            return eval_step(jax.device_put(state, repl), b)

    o1 = run(jax.devices()[:1])
    o8 = run(jax.devices()[:8])
    np.testing.assert_allclose(np.asarray(o1["scores"]), np.asarray(o8["scores"]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o1["valid"]), np.asarray(o8["valid"]))
    np.testing.assert_allclose(np.asarray(o1["boxes"]), np.asarray(o8["boxes"]),
                               atol=1e-4)


def test_rcnn_train_step_1_vs_8_devices():
    """Stage-2 (RCNN) step sharded over the mesh: same losses + params on
    1 vs 8 devices (the reference trains stage 2 under DDP,
    run_rpn_detect.py:209)."""
    from flax.core import FrozenDict

    from nerf_rpn_tpu.models.detector import RCNNConfig, RCNNHead
    from nerf_rpn_tpu.train.state import TrainState
    from nerf_rpn_tpu.train.steps import make_rcnn_train_step

    rng = np.random.default_rng(2)
    b, r, g = 8, 16, 4
    level_res = [(8, 8, 8), (4, 4, 4)]
    feats = [rng.normal(size=(b, *s, 16)).astype(np.float32)
             for s in level_res]
    lo = rng.uniform(0, 20, (b, r, 3)).astype(np.float32)
    rois = np.concatenate([lo, lo + rng.uniform(2, 10, (b, r, 3))], -1)
    glo = rng.uniform(0, 20, (b, g, 3)).astype(np.float32)
    gt = np.concatenate([glo, glo + rng.uniform(4, 10, (b, g, 3))], -1)
    batch = {
        "features": feats,
        "rois": rois.astype(np.float32),
        "roi_levels": rng.integers(0, 2, (b, r)).astype(np.int32),
        "roi_valid": np.ones((b, r), bool),
        "gt_boxes": gt.astype(np.float32),
        "gt_mask": np.ones((b, g), bool),
    }

    cfg = RCNNConfig(rotated=False, output_size=(2, 2, 2),
                     fg_threshold=0.3, bg_threshold=0.2)
    head = RCNNHead(in_channels=16, n_classes=2, flatten=True)
    tx, _ = make_optimizer(1e-3, 10)
    hvars = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 2, 16)))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=hvars["params"],
                       batch_stats=FrozenDict(), opt_state=tx.init(hvars["params"]),
                       tx=tx)
    train_step = make_rcnn_train_step(head, cfg, (4, 8), rois_per_image=8)
    key = jax.random.PRNGKey(3)

    def run(devs):
        mesh = make_mesh(devs)
        with mesh:
            sh = NamedSharding(mesh, P(DATA_AXIS))
            repl = NamedSharding(mesh, P())
            db = {}
            for k, v in batch.items():
                if isinstance(v, list):
                    db[k] = [jax.device_put(x, sh) for x in v]
                else:
                    db[k] = jax.device_put(v, sh)
            return train_step(jax.device_put(state, repl), db, key)

    s1, m1 = run(jax.devices()[:1])
    s8, m8 = run(jax.devices()[:8])
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-4,
                                   err_msg=k)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_fcos_losses_axis_name_shard_map():
    """The explicit axis_name psum path in fcos_losses (the reference's
    in-loss reduce_sum, model/fcos/loss.py:202-208) matches the global
    (unsharded) loss when each device holds a slice of the batch."""
    from functools import partial

    from jax.experimental.shard_map import shard_map

    from nerf_rpn_tpu.models.fcos import (
        FCOSConfig,
        fcos_locations,
        fcos_losses,
    )

    cfg = FCOSConfig(rotated=False)
    shapes = [(8, 8, 8), (4, 4, 4), (2, 2, 2), (1, 1, 1)]
    locations, _, counts, stride_of_loc, soi = fcos_locations(
        shapes, (4, 8, 16, 32))
    l_total = sum(counts)
    rng = np.random.default_rng(0)
    b = 8
    cls = jnp.asarray(rng.normal(0, 1, (b, l_total, 1)), jnp.float32)
    reg = jnp.asarray(rng.uniform(0.5, 8, (b, l_total, 6)), jnp.float32)
    ctr = jnp.asarray(rng.normal(0, 1, (b, l_total, 1)), jnp.float32)
    gt = np.zeros((b, 2, 6), np.float32)
    for i in range(b):
        lo = rng.integers(2, 14, (2, 3))
        gt[i, :, :3] = lo
        gt[i, :, 3:] = lo + rng.integers(6, 12, (2, 3))
    gt = jnp.asarray(gt)
    gt_mask = jnp.ones((b, 2), bool)
    args = (jnp.asarray(locations), jnp.asarray(stride_of_loc),
            jnp.asarray(soi))

    # global (single-device) losses
    ref = fcos_losses(cfg, cls, reg, ctr, *args, gt, gt_mask)

    mesh = make_mesh(jax.devices()[:8])
    spec = P(DATA_AXIS)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=P(),
    )
    def sharded_losses(cls, reg, ctr, gt, gt_mask):
        losses = fcos_losses(cfg, cls, reg, ctr, *args, gt, gt_mask,
                             axis_name=DATA_AXIS)
        # per-device sums with pmean'd normalisers -> mean over devices
        # equals the reference's reduce_sum/num_gpus semantics
        return jax.tree.map(lambda x: jax.lax.pmean(x, DATA_AXIS), losses)

    out = sharded_losses(cls, reg, ctr, gt, gt_mask)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-5, atol=1e-6,
            err_msg=k)


# ---------------------------------------------------------------------------
# Multi-host seams (mocked process_index/process_count; the reference's
# DistributedSampler + rank-0 gating contracts, run_rpn.py:336-339,359-370)
# ---------------------------------------------------------------------------


def _fake_dataset(n, rng):
    """List-like dataset of (rgbsigma, boxes, name) tuples (collate_batch's
    sample contract); the name encodes the index for tracking."""
    return [
        (rng.uniform(0, 1, (8, 8, 8, 4)).astype(np.float32),
         np.asarray([[1, 1, 1, 5, 5, 5]], np.float32),
         f"scene{i}")
        for i in range(n)
    ]


def _iterate_names(dataset, process_index, process_count, seed, shuffle=True,
                   drop_last=False):
    from nerf_rpn_tpu.data.datasets import batch_iterator

    names = []
    for batch in batch_iterator(
            dataset, batch_size=2, shuffle=shuffle, seed=seed,
            drop_last=drop_last, process_index=process_index,
            process_count=process_count, pad_multiple=8, max_gt=4):
        names.extend(batch["names"])
    return names


def test_batch_iterator_process_sharding_equal_and_covering():
    """Across process_index in 0..N-1 the per-process streams together cover
    every scene, every rank yields EXACTLY the same number of samples (and
    hence jitted steps — unequal step counts deadlock collectives at epoch
    end), and the only duplicates are the ceil-padding wrap (torch
    DistributedSampler semantics)."""
    rng = np.random.default_rng(0)
    n, world = 13, 4
    ds = _fake_dataset(n, rng)
    shards = [_iterate_names(ds, p, world, seed=3) for p in range(world)]
    all_names = [x for s in shards for x in s]
    # padded to ceil(13/4)*4 = 16: every scene present, 3 wrap duplicates
    assert len(all_names) == 16
    assert set(all_names) == {f"scene{i}" for i in range(n)}
    sizes = [len(s) for s in shards]
    assert sizes == [4, 4, 4, 4], sizes
    from collections import Counter
    counts = Counter(all_names)
    assert sum(c - 1 for c in counts.values()) == 3
    assert max(counts.values()) <= 2


def test_batch_iterator_process_sharding_deterministic_per_epoch():
    """Same (seed, process) -> identical order; different seed (the
    reference's sampler.set_epoch) -> different global permutation; the
    shuffle must be the SAME permutation on every process (disjointness
    across hosts depends on it)."""
    rng = np.random.default_rng(1)
    ds = _fake_dataset(16, rng)
    a1 = _iterate_names(ds, 1, 4, seed=7)
    a2 = _iterate_names(ds, 1, 4, seed=7)
    assert a1 == a2
    b1 = _iterate_names(ds, 1, 4, seed=8)
    assert a1 != b1
    # global permutation consistency: process p's shard at seed 7 equals
    # every 4th element of the full seed-7 permutation starting at p
    full = _iterate_names(ds, 0, 1, seed=7)
    for p in range(4):
        assert _iterate_names(ds, p, 4, seed=7) == full[p::4]


def test_batch_iterator_drop_last_per_process():
    """drop_last drops the ragged trailing batch AFTER process slicing (a
    different trailing batch dim would retrigger compilation per host)."""
    rng = np.random.default_rng(2)
    ds = _fake_dataset(13, rng)  # 13 -> process 0 gets 7 -> 3 full batches
    names = _iterate_names(ds, 0, 2, seed=0, drop_last=True)
    assert len(names) == 6


def test_rank_nonzero_skips_eval_and_checkpoints(tmp_path, monkeypatch):
    """run_rpn train_loop on a mocked process_index != 0 trains (the step
    itself is SPMD) but must NOT evaluate or write checkpoints — the
    reference's rank-0 gating (run_rpn.py:359-370; ours cli/run_rpn.py)."""
    import os

    from nerf_rpn_tpu.cli import run_rpn

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    scenes = []
    for i in range(4):
        name = f"scene{i}"
        vol = np.zeros((32, 32, 32, 4), np.float32)
        lo = rng.integers(2, 16, 3)
        hi = lo + rng.integers(6, 12, 3)
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1.0
        np.savez(data_dir / f"{name}.npz", rgbsigma=vol)
        np.save(data_dir / f"{name}.npy",
                np.asarray([[*lo, *hi]], np.float32))
        scenes.append(name)
    np.savez(data_dir / "split.npz",
             train_scenes=np.array(scenes[:2]),
             val_scenes=np.array(scenes[2:3]),
             test_scenes=np.array(scenes[3:]))

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    save = tmp_path / "out"
    args = run_rpn.parse_args([
        "--mode", "train",
        "--dataset_name", "hypersim",
        "--features_path", str(data_dir),
        "--boxes_path", str(data_dir),
        "--dataset_split", str(data_dir / "split.npz"),
        "--save_path", str(save),
        "--backbone_type", "resnet_tiny",
        "--resolution", "32",
        "--num_epochs", "1",
        # global batch must divide by the (mocked) process count; this
        # rank's local batch is 1
        "--batch_size", "2",
        "--rpn_head_conv_depth", "1",
        "--rpn_pre_nms_top_n_test", "64",
        "--rpn_post_nms_top_n_test", "32",
        "--flip_prob", "0", "--rotate_prob", "0", "--rot_scale_prob", "0",
        "--pad_multiple", "32",
    ])
    trainer = run_rpn.Trainer(args)

    calls = []
    monkeypatch.setattr(
        trainer, "eval",
        lambda *a, **k: calls.append(1) or ([], []))
    trainer.train_loop()
    assert not calls, "rank!=0 must not run eval"
    leftover = [p for p in os.listdir(save)
                if p.startswith(("model_best", "epoch_"))] \
        if save.is_dir() else []
    assert not leftover, leftover
