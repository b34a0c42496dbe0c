"""Benchmark: anchor-RPN scene inference throughput on one TPU chip.

Mirrors the reference latency benchmark (``run_rpn.py:594-617``: 10 warmups
+ 300 timed forwards of the anchor RPN on a dummy ``(4, 200, 200, 130)``
grid, single CUDA GPU).  Here the same logical workload runs TPU-style: the
grid is bucket-padded to (208, 208, 144) (multiple-of-16 bucket), compute in
bfloat16, full forward + head on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline``: the reference repo publishes no numbers (BASELINE.md); we
use an assumed A100 reference of 10 scenes/sec (~100 ms/scene) for the
Swin-S anchor RPN forward at this resolution, so vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

WARMUP = 5
REPS = 30
SHAPE = (208, 208, 144)  # (200, 200, 130) bucket-padded to multiples of 16
ASSUMED_A100_SCENES_PER_SEC = 10.0


def main():
    # persistent compile cache: repeat bench runs skip the (minutes-long)
    # tunnel-side compilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN

    model = NeRFRPN(
        backbone_type="swin_s",
        resolution=max(SHAPE),
        rotated=True,
        conv_depth=4,
        dtype=jnp.bfloat16,
    )
    grids = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, *SHAPE, 4)).astype(np.float32)
    )
    # throughput doesn't depend on param values: build zeros from shapes
    # instead of paying a second large compile for init
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grids[:, :32, :32, :32])
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def forward(variables, grids, carry):
        # carry chains iterations: each call data-depends on the previous
        # one, so timing the final host fetch measures true device time
        # (block_until_ready is unreliable through the axon tunnel).
        g = grids + carry * 1e-20
        feats, logits, deltas = model.apply(variables, g, train=False)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in logits)
        s = s + sum(jnp.sum(d.astype(jnp.float32)) for d in deltas)
        return s

    carry = jnp.zeros((), jnp.float32)
    carry = forward(variables, grids, carry)
    float(carry)  # warmup + compile barrier
    for _ in range(WARMUP - 1):
        carry = forward(variables, grids, carry)
    float(carry)

    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = forward(variables, grids, carry)
    float(carry)  # host fetch: waits for the whole chain
    total = time.perf_counter() - t0

    mean_s = total / REPS
    scenes_per_sec = 1.0 / mean_s
    print(
        json.dumps(
            {
                "metric": "swin_s_anchor_rpn_inference_throughput",
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
