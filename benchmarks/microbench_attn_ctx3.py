"""Context bisect round 3: fix candidates for the embed-conv x pallas-kernel
layout interaction.

  g3) embed + pair, jnp attention            (control; expect ~8 ms)
  g1) embed + barrier + pair (fused)         (optimization_barrier fix?)
  g2) plain-SAME-conv embed + pair (fused)   (is the regroup conv the trigger?)
  g4) embed in f32 input cast bf16 before    (dtype of the conv input?)
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
from nerf_rpn_tpu.models.swin import PatchEmbed3D, SwinBlock


class Var(nn.Module):
    fused: int = 1
    barrier: bool = False
    plain_conv: bool = False

    @nn.compact
    def __call__(self, x):
        if self.plain_conv:
            x = nn.Conv(96, (4, 4, 4), strides=(4, 4, 4),
                        dtype=jnp.bfloat16, name="patch_embed")(x)
        else:
            x = PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16,
                             name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(x)
        if self.barrier:
            x = jax.lax.optimization_barrier(x)
        x = SwinBlock(96, 3, (4, 4, 4), (0, 0, 0), dtype=jnp.bfloat16,
                      fused_min_windows=self.fused, name="b0")(x)
        x = SwinBlock(96, 3, (4, 4, 4), (2, 2, 2), dtype=jnp.bfloat16,
                      fused_min_windows=self.fused, name="b1")(x)
        return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x_grid = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)
    x_bf = x_grid.astype(jnp.bfloat16)

    cases = [
        ("g3_jnp_control", Var(fused=10 ** 9), x_grid),
        ("g1_barrier_fused", Var(barrier=True), x_grid),
        ("g2_plainconv_fused", Var(plain_conv=True), x_grid),
        ("g4_bf16in_fused", Var(), x_bf),
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
