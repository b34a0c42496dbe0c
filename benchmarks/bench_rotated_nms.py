"""Rotated-NMS microbenchmark: 10k clustered OBBs on one TPU chip.

Measures ``nms_mask`` (exact sequential-greedy semantics) across
``pair_budget`` settings to quantify the upper-bound-gated, gather-compacted
clipping path against clipping every pair (``pair_budget=None``).  Keep
counts must be identical across budgets — the budget only changes speed.

Run from the repo root: ``python benchmarks/bench_rotated_nms.py``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = 10000
THRESH = 0.25
REPS = 3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from nerf_rpn_tpu.ops.nms import nms_mask

    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 200, (40, 3))
    boxes = np.zeros((N, 7), np.float32)
    boxes[:, :3] = centers[rng.integers(0, 40, N)] + rng.normal(0, 4, (N, 3))
    boxes[:, 3:6] = rng.uniform(2, 12, (N, 3))
    boxes[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, N)
    scores = rng.uniform(0, 1, N).astype(np.float32)
    jb = jnp.asarray(boxes)
    js = jnp.asarray(scores)
    jv = jnp.asarray(np.ones(N, bool))

    results = {}
    for budget in (None, 64, 8):
        k = nms_mask(jb, js, jv, THRESH, pair_budget=budget)
        kept = float(jnp.sum(k))  # compile + barrier
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        for _ in range(REPS):
            k = nms_mask(jb, js + 0.0 * c, jv, THRESH, pair_budget=budget)
            c = jnp.sum(k).astype(jnp.float32) * 0.0
        kept = float(jnp.sum(k))
        dt = (time.perf_counter() - t0) / REPS
        results[str(budget)] = {"ms": round(dt * 1000, 1), "kept": int(kept)}

    kept_counts = {r["kept"] for r in results.values()}
    assert len(kept_counts) == 1, f"keep-sets diverged: {results}"
    print(json.dumps({
        "metric": "rotated_nms_10k_latency",
        "unit": "ms",
        "value": results["8"]["ms"],
        "by_pair_budget": results,
    }))


if __name__ == "__main__":
    main()
