"""Context bisect round 2: grow the graph around the fused stage-0 blocks
until the ~9 ms/call penalty appears.

  e) two chained SwinBlocks (fused, noshift+shift)     [block pair]
  f) e + PatchMerging                                  [+merge]
  g) PatchEmbed3D+LN on the raw grid + e               [+embed]
  h) g + f                                             [embed+pair+merge]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from benchmarks.microbench_ops import slope_time, init_params
from nerf_rpn_tpu.models.swin import PatchEmbed3D, PatchMerging3D, SwinBlock


class Pair(nn.Module):
    embed: bool = False
    merge: bool = False

    @nn.compact
    def __call__(self, x):
        if self.embed:
            x = PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16,
                             name="patch_embed")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(x)
        x = SwinBlock(96, 3, (4, 4, 4), (0, 0, 0), dtype=jnp.bfloat16,
                      fused_min_windows=1, name="b0")(x)
        x = SwinBlock(96, 3, (4, 4, 4), (2, 2, 2), dtype=jnp.bfloat16,
                      fused_min_windows=1, name="b1")(x)
        if self.merge:
            x = PatchMerging3D(96, dtype=jnp.bfloat16, name="m")(x)
        return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x_tok = jnp.asarray(rng.normal(0, 1, (1, 52, 52, 36, 96)), jnp.bfloat16)
    x_grid = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)

    cases = [
        ("e_pair", Pair(), x_tok),
        ("f_pair_merge", Pair(merge=True), x_tok),
        ("g_embed_pair", Pair(embed=True), x_grid),
        ("h_embed_pair_merge", Pair(embed=True, merge=True), x_grid),
    ]
    for name, mod, x in cases:
        params = init_params(mod, x)

        def make(n, mod=mod, params=params, x=x):
            @jax.jit
            def fn(x, carry):
                s = jnp.zeros((), jnp.float32)
                cur = x + carry.astype(x.dtype) * 1e-12
                for _ in range(n):
                    y = mod.apply(params, cur)
                    r = jnp.sum(y.astype(jnp.float32))
                    s = s + r
                    cur = x + (r * 1e-20).astype(x.dtype)
                return s
            return fn
        slope_time(name, make, x)


if __name__ == "__main__":
    main()
