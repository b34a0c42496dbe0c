"""safe_top_k variants at the propose shapes: per-level vs stacked."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.microbench_ops import slope_time
from nerf_rpn_tpu.ops.topk import safe_top_k

COUNTS = [1265472, 158184, 19773, 624]
K = 2500


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    n_max = max(COUNTS)
    per_level = [jnp.asarray(rng.normal(0, 1, (1, c)), jnp.float32)
                 for c in COUNTS]
    stacked = jnp.asarray(
        np.stack([np.pad(np.asarray(x[0]), (0, n_max - x.shape[1]),
                         constant_values=-1e10) for x in per_level])[None],
        jnp.float32)

    def make_per_level(n):
        @jax.jit
        def fn(x, carry):
            s = jnp.zeros((), jnp.float32)
            cur = [p + carry * 1e-12 for p in per_level]
            for _ in range(n):
                r = jnp.zeros((), jnp.float32)
                for p in cur:
                    k = min(K, p.shape[1])
                    vs, ix = safe_top_k(p, k)
                    r = r + jnp.sum(vs) + jnp.sum(ix) * 1e-9
                s = s + r
                cur = [p + r * 1e-20 for p in per_level]
            return s
        return fn
    slope_time("topk_per_level", make_per_level, per_level[0])

    def make_stacked(n):
        @jax.jit
        def fn(x, carry):
            s = jnp.zeros((), jnp.float32)
            cur = x + carry * 1e-12
            for _ in range(n):
                vs, ix = safe_top_k(cur, K)
                r = jnp.sum(vs) + jnp.sum(ix) * 1e-9
                s = s + r
                cur = x + r * 1e-20
            return s
        return fn
    slope_time("topk_stacked_4row", make_stacked, stacked)

    big = per_level[0]

    def make_single(n):
        @jax.jit
        def fn(x, carry):
            s = jnp.zeros((), jnp.float32)
            cur = x + carry * 1e-12
            for _ in range(n):
                vs, ix = safe_top_k(cur, K)
                r = jnp.sum(vs) + jnp.sum(ix) * 1e-9
                s = s + r
                cur = x + r * 1e-20
            return s
        return fn
    slope_time("topk_level0_only", make_single, big)


if __name__ == "__main__":
    main()
