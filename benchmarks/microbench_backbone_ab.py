"""A/B the full SwinFPN backbone: fused Pallas attention on/off."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.microbench_ops import slope_time, init_params
from nerf_rpn_tpu.models.swin import make_swin_fpn

SHAPE = (208, 208, 144)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, *SHAPE, 4)), jnp.float32)

    for fused, tag in ((1000, "fused_stage0_only"), (246, "fused_stage01")):
        bb = make_swin_fpn("swin_s", dtype=jnp.bfloat16,
                           fused_min_windows=fused)
        params = init_params(bb, x)

        def make(n, bb=bb, params=params):
            @jax.jit
            def fn(x, carry):
                s = jnp.zeros((), jnp.float32)
                cur = x + carry.astype(x.dtype) * 1e-12
                for _ in range(n):
                    feats = bb.apply(params, cur)
                    r = sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
                    s = s + r
                    cur = x + (r * 1e-20).astype(x.dtype)
                return s
            return fn
        slope_time(f"backbone_{tag}", make, x)


if __name__ == "__main__":
    main()
