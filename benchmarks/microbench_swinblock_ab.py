"""A/B: full SwinBlock with fused Pallas attention vs jnp path, stage0/1."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.microbench_ops import slope_time, module_chain, init_params
from nerf_rpn_tpu.models.swin import SwinBlock

STAGES = [((52, 52, 36, 96), 3), ((26, 26, 18, 192), 6)]


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    for i, (shape, h) in enumerate(STAGES):
        x = jnp.asarray(rng.normal(0, 1, (1, *shape)), jnp.bfloat16)
        for shift in ((0, 0, 0), (2, 2, 2)):
            for fused, tag in ((1, "fused"), (10 ** 9, "jnp")):
                blk = SwinBlock(shape[-1], h, (4, 4, 4), shift,
                                dtype=jnp.bfloat16, fused_min_windows=fused)
                name = f"stage{i}_shift{shift[0]}_{tag}"
                slope_time(name, module_chain(blk, init_params(blk, x)), x)


if __name__ == "__main__":
    main()
