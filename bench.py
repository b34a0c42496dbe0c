"""Benchmark: anchor-RPN full-inference throughput on one TPU chip.

Mirrors the reference latency benchmark (``run_rpn.py:594-617``: 10 warmups
+ 300 timed eval-mode forwards — including proposal decode + NMS — of the
anchor RPN on a dummy ``(4, 200, 200, 130)`` grid, single CUDA GPU).  Here
the same logical workload runs TPU-style: the grid is bucket-padded to
(208, 208, 144), compute in bfloat16, Swin-S backbone + RPN head + proposal
generation (per-level top-k, decode, clip, bitmask NMS) all on one chip.

Timing: iterations are CHAINED (each step's input depends on the previous
step's output) and only the final scalar is fetched — block_until_ready is
unreliable through this image's axon tunnel, and each host fetch costs a
~26 ms TCP round-trip that would otherwise pollute per-step numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
REPS = 30
SHAPE = (208, 208, 144)  # (200, 200, 130) bucket-padded to multiples of 16
ASSUMED_A100_SCENES_PER_SEC = 10.0


def main():
    # persistent compile cache: repeat bench runs skip the (minutes-long)
    # tunnel-side compilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from flax.core import FrozenDict

    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from nerf_rpn_tpu.train.steps import make_rpn_eval_step

    model = NeRFRPN(
        backbone_type="swin_s",
        resolution=max(SHAPE),
        rotated=False,
        conv_depth=4,
        dtype=jnp.bfloat16,
    )
    cfg = RPNConfig(rotated=False)  # default pre/post NMS top-n 2500
    grids = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *SHAPE, 4)).astype(np.float32)
    )
    # throughput doesn't depend on param values: build zeros from shapes
    # instead of paying a second large compile for init
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grids[:, :32, :32, :32])
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    tx, _ = make_optimizer(1e-3, 10)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=None,
        tx=tx,
    )
    eval_step = make_rpn_eval_step(model, cfg, SHAPE)

    # keep the forward / proposal-gen compile units separate (eval_step is
    # already two jits; wrapping it in an outer jit would re-inline them
    # into one monolith the tunnel compiler chews on for >30 min)
    perturb = jax.jit(lambda g, c: g + c * 1e-20)
    summarize = jax.jit(
        lambda out: jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9
    )

    def step(state, grids, ori_sizes, carry):
        batch = {"grids": perturb(grids, carry), "ori_sizes": ori_sizes}
        return summarize(eval_step(state, batch))

    ori = jnp.asarray([[200, 200, 130]], jnp.int32)
    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = step(state, grids, ori, carry)
    float(carry)  # compile + warmup barrier

    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = step(state, grids, ori, carry)
    float(carry)  # host fetch waits for the whole chain
    total = time.perf_counter() - t0

    mean_s = total / REPS
    scenes_per_sec = 1.0 / mean_s
    print(
        json.dumps(
            {
                "metric": "swin_s_anchor_rpn_full_inference_throughput",
                "value": round(scenes_per_sec, 4),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(
                    scenes_per_sec / ASSUMED_A100_SCENES_PER_SEC, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
