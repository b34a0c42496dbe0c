"""FCOS rotated-box full-inference latency on one TPU chip.

Companion to the headline ``bench.py`` (anchor RPN): Swin-S backbone + FCOS
head + rotated proposal generation (per-level top-k, midpoint-offset OBB
decode, exact rotated-IoU NMS over ~10k candidates) at 160^3, bfloat16.
Mirrors the reference's FCOS benchmark mode (``run_fcos.py``, ``--mode
benchmark``) on its OBB configuration.

Timing methodology matches bench.py: iterations are chained through a
scalar so the device serializes them, and only the final scalar is fetched
(``block_until_ready`` does not block through this image's axon tunnel).

Run from the repo root: ``python benchmarks/bench_fcos_rotated.py``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

WARMUP = 2
REPS = 10
SHAPE = (160, 160, 160)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from flax.core import FrozenDict

    from nerf_rpn_tpu.models.fcos import FCOSConfig
    from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from nerf_rpn_tpu.train.steps import make_fcos_eval_step

    model = FCOSOverNeRF(backbone_type="swin_s", resolution=max(SHAPE),
                         rotated=True, dtype=jnp.bfloat16)
    cfg = FCOSConfig(rotated=True)
    grids = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, *SHAPE, 4)).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grids[:, :32, :32, :32]))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    tx, _ = make_optimizer(1e-3, 10)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=None, tx=tx)
    eval_step = make_fcos_eval_step(model, cfg, SHAPE)
    perturb = jax.jit(lambda g, c: g + c * 1e-20)
    summarize = jax.jit(
        lambda out: jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9)

    def step(carry):
        batch = {"grids": perturb(grids, carry),
                 "ori_sizes": jnp.asarray([list(SHAPE)], jnp.int32)}
        return summarize(eval_step(state, batch))

    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = step(carry)
    float(carry)  # compile + warmup barrier

    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = step(carry)
    float(carry)
    mean_s = (time.perf_counter() - t0) / REPS
    print(json.dumps({
        "metric": "swin_s_fcos_rotated_full_inference_latency",
        "value": round(mean_s, 4),
        "unit": "s/scene",
    }))


if __name__ == "__main__":
    main()
