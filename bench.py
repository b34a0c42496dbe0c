"""Benchmarks: full-inference throughput on one TPU chip, plus MFU.

Mirrors the reference latency benchmarks (``run_rpn.py:594-617``: 10 warmups
+ 300 timed eval-mode forwards — including proposal decode + NMS — on a
dummy ``(4, 200, 200, 130)`` grid; ``run_fcos.py:537-560``: same on
``(4, 160^3)``; single CUDA GPU).  Here the same logical workloads run
TPU-style: grids bucket-padded to multiples of 16, compute in bfloat16,
backbone + head + proposal generation (per-level top-k, decode, clip,
bitmask NMS) all on one chip.

Weights are RANDOM (host-generated from the param shapes), not zeros: with
all-zero weights every objectness logit ties and the top-k/NMS stages see a
degenerate score distribution, under-representing the data-dependent NMS
cost.

Timing: iterations are CHAINED (each step's input depends on the previous
step's output) and only the final scalar is fetched — block_until_ready is
unreliable through this image's axon tunnel, and each host fetch costs a
~26 ms TCP round-trip that would otherwise pollute per-step numbers.  A
throwaway timed loop runs first (the first timed loop in a fresh process
through the tunnel is unreliable).

Prints one JSON line per metric; the HEADLINE metric (Swin-S anchor RPN
full-inference throughput, with ``vs_baseline``) is the LAST line.
``vs_baseline``: the reference repo publishes no numbers (BASELINE.md); we
use an assumed A100 reference of 10 scenes/sec (~100 ms/scene) for the
Swin-S anchor RPN at this resolution, so vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

WARMUP = 3
SHAPE_RPN = (208, 208, 144)   # (200, 200, 130) bucket-padded
SHAPE_FCOS = (160, 160, 160)
ASSUMED_A100_SCENES_PER_SEC = 10.0

# peak dense bf16 FLOP/s per chip, for MFU
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def random_state(model, sample, seed=0, with_opt=False, total_steps=1000):
    """TrainState with host-generated random params (no device-side init
    compile; batch_stats left at ones — benchmarks don't need real stats).
    ``with_opt``: also init the optimizer state (train-step benches);
    ``total_steps`` keeps the onecycle schedule in-range over the bench."""
    from flax.core import FrozenDict

    from nerf_rpn_tpu.train.state import TrainState, make_optimizer

    rng = np.random.default_rng(seed)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), sample))
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype),
        shapes["params"])
    bs = shapes.get("batch_stats", FrozenDict())
    bs = jax.tree.map(lambda s: jnp.ones(s.shape, s.dtype), bs)
    tx, _ = make_optimizer(1e-3, total_steps)
    opt_state = jax.jit(tx.init)(params) if with_opt else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=bs, opt_state=opt_state, tx=tx)


def timed_chain(step, reps):
    """Chained-step mean seconds (throwaway first loop, trust the second)."""
    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = step(carry)
    float(carry)
    for _ in range(max(reps // 3, 2)):
        carry = step(carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = step(carry)
    float(carry)
    return (time.perf_counter() - t0) / reps


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      **extra}), flush=True)


def bench_rpn(backbone, shape, metric, reps, mfu=False, batch=1,
              **emit_extra):
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_eval_step

    model = NeRFRPN(backbone_type=backbone, resolution=max(shape),
                    rotated=False, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=False)
    # grids arrive in the model dtype — drivers cast in the host collate
    # (identical values to casting at the first conv; half the bytes)
    grids = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (batch, *shape, 4)).astype(np.float32)).astype(jnp.bfloat16)
    state = random_state(model, grids[:1, :32, :32, :32])
    eval_step = make_rpn_eval_step(model, cfg, shape)

    perturb = jax.jit(lambda g, c: g + (c * 1e-20).astype(g.dtype))
    summarize = jax.jit(
        lambda out: jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9)
    ori = jnp.tile(jnp.asarray(
        [[min(s, o) for s, o in zip(shape, (200, 200, 130))]], jnp.int32),
        (batch, 1))

    def step(carry):
        b = {"grids": perturb(grids, carry), "ori_sizes": ori}
        return summarize(eval_step(state, b))

    mean_s = timed_chain(step, reps)
    emit(metric, round(batch / mean_s, 4), "scenes/sec/chip", **emit_extra)

    if mfu:
        # forward-only time + XLA cost-analysis FLOPs -> model FLOP/s / peak
        sum_fwd = jax.jit(lambda out: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)))

        def fwd_step(carry):
            return sum_fwd(eval_step.forward(state, perturb(grids, carry)))

        fwd_s = timed_chain(fwd_step, reps)
        try:
            # the forward may be several chained compile units (the Swin
            # path splits embed | stages | neck+head); sum their FLOPs
            flops = 0.0
            args = (state, grids)
            for unit in getattr(eval_step, "forward_units",
                                (eval_step.forward,)):
                ca = unit.lower(*args).compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops += float(ca.get("flops", 0.0))
                args = (state, jax.eval_shape(unit, *args))
        except Exception:
            flops = 0.0
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
        if flops and peak:
            emit(f"{metric}_forward_mfu",
                 round(flops / fwd_s / peak * 100, 2), "%",
                 forward_ms=round(fwd_s * 1e3, 3),
                 forward_tflops=round(flops / 1e12, 3),
                 device_kind=jax.devices()[0].device_kind)


def _train_batch(shape, batch, box_dim=7, n_gt=16, seed=0):
    """Synthetic train batch at the train.sh shapes (OBB gt when
    box_dim=7)."""
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(20, 140, (batch, n_gt, 3))
    size = rng.uniform(8, 40, (batch, n_gt, 3))
    parts = [ctr, size]
    if box_dim == 7:
        parts.append(rng.uniform(-np.pi / 2, np.pi / 2, (batch, n_gt, 1)))
    else:
        parts = [ctr - size / 2, ctr + size / 2]
    return {
        "grids": jnp.asarray(
            rng.uniform(0, 1, (batch, *shape, 4)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "ori_sizes": jnp.full((batch, 3), max(shape), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.concatenate(parts, -1).astype(np.float32)),
        "gt_mask": jnp.ones((batch, n_gt), bool),
    }


def bench_rpn_train(reps=32, batch=2):
    """Training-step throughput, the reference's dominant workload
    (``train.sh:8-27``: 200 epochs, Swin backbone, --rotated_bbox, batch
    8 over 4 GPUs = 2/device).  Full step: forward + OBB target assignment
    + losses + backward + AdamW update.  Steps chain through the returned
    TrainState (each step consumes the previous step's params), so the
    timing needs no block_until_ready.

    reps=32: the loop's ONE scalar fetch costs a fixed ~26 ms tunnel RTT,
    so wall/step converges to the device number only as reps grows — the
    r5 gap study (benchmarks/README.md "Wall vs trace") measured 115.6
    ms/step at reps=8 vs 110.5 at reps=32 against a traced device span of
    108.8 ms back-to-back; at 32 the residual is the real ~1 ms/step host
    dispatch.  In production training there is no per-step fetch at all."""
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    shape = SHAPE_FCOS  # train.sh resolution 160
    model = NeRFRPN(backbone_type="swin_s", resolution=max(shape),
                    rotated=True, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=True)
    rng = np.random.default_rng(0)
    n_gt = 16
    ctr = rng.uniform(20, 140, (batch, n_gt, 3))
    size = rng.uniform(8, 40, (batch, n_gt, 3))
    theta = rng.uniform(-np.pi / 2, np.pi / 2, (batch, n_gt, 1))
    batch_d = {
        "grids": jnp.asarray(
            rng.uniform(0, 1, (batch, *shape, 4)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "ori_sizes": jnp.full((batch, 3), 160, jnp.int32),
        "gt_boxes": jnp.asarray(
            np.concatenate([ctr, size, theta], -1).astype(np.float32)),
        "gt_mask": jnp.ones((batch, n_gt), bool),
    }
    state = random_state(model, batch_d["grids"][:1, :32, :32, :32],
                         with_opt=True)
    train_step, _ = make_rpn_train_step(model, cfg, shape)
    key = jax.random.PRNGKey(0)

    def run(state, reps):
        loss = None
        for i in range(reps):
            state, metrics = train_step(state, batch_d,
                                        jax.random.fold_in(key, i))
            loss = metrics["loss"]
        float(loss)  # one fetch; state-chaining orders the steps
        return state

    state = run(state, WARMUP)       # compile + warm
    state = run(state, 4)            # throwaway timed loop (tunnel)
    t0 = time.perf_counter()
    state = run(state, reps)
    step_s = (time.perf_counter() - t0) / reps

    extra = {"step_ms": round(step_s * 1e3, 2), "batch": batch}
    try:
        ca = train_step.lower(state, batch_d, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
        if flops and peak:
            extra["train_mfu_pct"] = round(flops / step_s / peak * 100, 2)
            extra["step_tflops"] = round(flops / 1e12, 3)
    except Exception:
        pass
    emit("swin_s_obb_rpn_train_step_throughput",
         round(batch / step_s, 4), "scenes/sec/chip", **extra)


def _emit_train_metric(name, train_step, state, batch_d, step_s, batch):
    extra = {"step_ms": round(step_s * 1e3, 2), "batch": batch}
    try:
        ca = train_step.lower(state, batch_d, jax.random.PRNGKey(0)).compile(
        ).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
        if flops and peak:
            extra["train_mfu_pct"] = round(flops / step_s / peak * 100, 2)
            extra["step_tflops"] = round(flops / 1e12, 3)
    except Exception:
        pass
    emit(name, round(batch / step_s, 4), "scenes/sec/chip", **extra)


def bench_fcos_train(reps=24, batch=2):
    """FCOS training-step throughput (``train_fcos.sh:8-31``: swin_s,
    --rotated_bbox, 160^3, batch 8 over 4 GPUs = 2/chip).  Same chained
    protocol as bench_rpn_train."""
    from nerf_rpn_tpu.models.fcos import FCOSConfig
    from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
    from nerf_rpn_tpu.train.steps import make_fcos_train_step

    shape = SHAPE_FCOS
    batch_d = _train_batch(shape, batch, box_dim=7)
    model = FCOSOverNeRF(backbone_type="swin_s", resolution=max(shape),
                         rotated=True, dtype=jnp.bfloat16)
    cfg = FCOSConfig(rotated=True)
    state = random_state(model, batch_d["grids"][:1, :32, :32, :32],
                         with_opt=True)
    train_step, _ = make_fcos_train_step(model, cfg, shape)
    key = jax.random.PRNGKey(0)

    def run(state, reps):
        loss = None
        for i in range(reps):
            state, metrics = train_step(state, batch_d,
                                        jax.random.fold_in(key, i))
            loss = metrics["loss"]
        float(loss)
        return state

    state = run(state, WARMUP)
    state = run(state, 4)
    t0 = time.perf_counter()
    state = run(state, reps)
    step_s = (time.perf_counter() - t0) / reps
    _emit_train_metric("swin_s_obb_fcos_train_step_throughput",
                       train_step, state, batch_d, step_s, batch)


def rcnn_train_setup(batch=2, rois=1024):
    """Build (train_step, state, batch_d, key) for the RCNN fine-tune train
    bench/trace (shared by bench_rcnn_train and
    benchmarks/trace_rcnn_train.py)."""
    from nerf_rpn_tpu.models.detector import RCNNConfig, RCNNHead
    from nerf_rpn_tpu.models.nerf_rpn import build_backbone
    from nerf_rpn_tpu.train.steps import make_rcnn_train_step
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from flax.core import FrozenDict

    shape = SHAPE_FCOS
    rng = np.random.default_rng(1)
    batch_d = _train_batch(shape, batch, box_dim=7)
    ctr = rng.uniform(20, 140, (batch, rois, 3))
    size = rng.uniform(6, 40, (batch, rois, 3))
    theta = rng.uniform(-np.pi / 2, np.pi / 2, (batch, rois, 1))
    batch_d["rois"] = jnp.asarray(
        np.concatenate([ctr, size, theta], -1).astype(np.float32))
    batch_d["roi_levels"] = jnp.asarray(
        rng.integers(0, 4, (batch, rois)).astype(np.int32))
    batch_d["roi_valid"] = jnp.ones((batch, rois), bool)

    cfg = RCNNConfig(rotated=True, batch_size=256, fg_threshold=0.25,
                     bg_threshold=0.25, output_size=(3, 3, 3))
    head = RCNNHead(in_channels=256, n_classes=2, rotated=True,
                    add_conv_layers=True, flatten=True, dtype=jnp.bfloat16)
    backbone = build_backbone("swin_s", max(shape), dtype=jnp.bfloat16)

    # params: backbone + head under the driver's {"backbone", "head"} split
    shapes_bb = jax.eval_shape(
        lambda: backbone.init(jax.random.PRNGKey(0),
                              batch_d["grids"][:1, :32, :32, :32]))
    pooled = jnp.zeros((1, 3, 3, 3, 256), jnp.bfloat16)
    shapes_h = jax.eval_shape(
        lambda: head.init(jax.random.PRNGKey(0), pooled))
    rng2 = np.random.default_rng(0)
    mk = lambda tree: jax.tree.map(
        lambda s: jnp.asarray(rng2.normal(0, 0.02, s.shape), s.dtype), tree)
    params = {"backbone": mk(shapes_bb)["params"],
              "head": mk(shapes_h)["params"]}
    tx, _ = make_optimizer(1e-4, 1000)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=FrozenDict(),
                       opt_state=jax.jit(tx.init)(params), tx=tx)
    train_step = make_rcnn_train_step(
        head, cfg, (4, 8, 16, 32), rois_per_image=128, backbone=backbone,
        reg_loss_weight=5.0)
    key = jax.random.PRNGKey(0)
    return train_step, state, batch_d, key


def bench_rcnn_train(reps=24, batch=2, rois=1024):
    """RCNN second-stage fine-tune training step (``train_rcnn.sh:7-38``:
    swin backbone fine-tune, --rotated_bbox, cls_batch_size 256, batch 2,
    output_size 3^3, is_flatten; bench shape 160^3 to share the size class
    of the other train benches)."""
    train_step, state, batch_d, key = rcnn_train_setup(batch, rois)

    def run(state, reps):
        loss = None
        for i in range(reps):
            state, metrics = train_step(state, batch_d,
                                        jax.random.fold_in(key, i))
            loss = metrics["loss"]
        float(loss)
        return state

    state = run(state, WARMUP)
    state = run(state, 4)
    t0 = time.perf_counter()
    state = run(state, reps)
    step_s = (time.perf_counter() - t0) / reps
    _emit_train_metric("swin_s_obb_rcnn_finetune_train_step_throughput",
                       train_step, state, batch_d, step_s, batch)


def bench_fcos_rotated(reps):
    from nerf_rpn_tpu.models.fcos import FCOSConfig
    from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
    from nerf_rpn_tpu.train.steps import make_fcos_eval_step

    model = FCOSOverNeRF(backbone_type="swin_s", resolution=max(SHAPE_FCOS),
                         rotated=True, dtype=jnp.bfloat16)
    cfg = FCOSConfig(rotated=True)
    grids = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, *SHAPE_FCOS, 4)).astype(np.float32)).astype(jnp.bfloat16)
    state = random_state(model, grids[:, :32, :32, :32])
    eval_step = make_fcos_eval_step(model, cfg, SHAPE_FCOS)
    perturb = jax.jit(lambda g, c: g + (c * 1e-20).astype(g.dtype))
    summarize = jax.jit(
        lambda out: jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9)
    ori = jnp.asarray([list(SHAPE_FCOS)], jnp.int32)

    def step(carry):
        batch = {"grids": perturb(grids, carry), "ori_sizes": ori}
        return summarize(eval_step(state, batch))

    mean_s = timed_chain(step, reps)
    emit("swin_s_fcos_rotated_full_inference_throughput",
         round(1.0 / mean_s, 4), "scenes/sec/chip")


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    bench_rpn("resnet", SHAPE_RPN,
              "resnet50_anchor_rpn_full_inference_throughput", reps=15)
    # BASELINE config #1: VGG + anchor RPN (AF = the reference's blessed
    # cfg; EF = the VGG19-depth variant)
    bench_rpn("vgg_AF", SHAPE_RPN,
              "vgg_AF_anchor_rpn_full_inference_throughput", reps=15)
    bench_rpn("vgg_EF", SHAPE_RPN,
              "vgg19_EF_anchor_rpn_full_inference_throughput", reps=10)
    bench_rpn_train(reps=8)
    bench_fcos_train(reps=6)
    bench_rcnn_train(reps=6)
    bench_fcos_rotated(reps=10)
    # serving throughput: 4 scenes per dispatch amortises the latency-bound
    # segments (the reference model also takes a list of scenes)
    bench_rpn("swin_s", SHAPE_RPN,
              "swin_s_anchor_rpn_batch4_throughput", reps=10, batch=4)

    # headline: measure, then emit its MFU line first so the throughput
    # line (with vs_baseline) is LAST on stdout
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_rpn("swin_s", SHAPE_RPN,
                  "swin_s_anchor_rpn_full_inference_throughput",
                  reps=30, mfu=True)
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]
    headline = next(l for l in lines
                    if l["metric"].endswith("inference_throughput"))
    for l in lines:
        if l is not headline:
            print(json.dumps(l), flush=True)
    headline["vs_baseline"] = round(
        headline["value"] / ASSUMED_A100_SCENES_PER_SEC, 4)
    # the reference publishes no perf numbers (BASELINE.md): vs_baseline is
    # relative to an ASSUMED 10 scenes/sec A100 figure, not a measured run
    headline["baseline_assumed"] = True
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
