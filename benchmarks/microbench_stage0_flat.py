"""Stage-0 LN/layout fix candidates.

Trace finding (trace_forward.py): the stage-0 LayerNorm/stat fusions run at
9-50 GB/s (30-90x under roofline) because XLA fuses the LN reduces with the
window-partition transposes / embed conv on a 5-D (1,52,52,36,96) view with
pathological T(2,128) layouts.  Candidates:

  f0) control: committed SwinBlock x2 after embed+LN          (jnp attn)
  f1) flat: all LN/MLP/residual on a (B, T, C) token view     (jnp attn)
  f2) f1 + optimization_barrier fencing the partition transposes
  f3) f2 with the fused Pallas attention kernel
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
from nerf_rpn_tpu.models.swin import (
    PatchEmbed3D,
    ShiftedWindowAttention3D,
    SwinBlock,
)


class FlatBlock(nn.Module):
    """SwinBlock with LN/MLP/residual on the flat token view."""

    dim: int
    num_heads: int
    window: tuple[int, int, int]
    shift: tuple[int, int, int]
    fence: bool = False
    fused: int = 10 ** 9

    @nn.compact
    def __call__(self, x):  # x: (B, T, C) + static 5-D shape via self
        b, sx, sy, sz, c = self.grid_shape
        t = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16, name="norm1")(t)
        h5 = h.reshape(b, sx, sy, sz, c)
        if self.fence:
            h5 = jax.lax.optimization_barrier(h5)
        a5 = ShiftedWindowAttention3D(
            self.dim, self.window, self.shift, self.num_heads,
            dtype=jnp.bfloat16, fused_min_windows=self.fused, name="attn",
        )(h5)
        if self.fence:
            a5 = jax.lax.optimization_barrier(a5)
        t = t + a5.reshape(b, -1, c)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16, name="norm2")(t)
        h = nn.Dense(self.dim * 4, dtype=jnp.bfloat16, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=jnp.bfloat16, name="mlp_fc2")(h)
        return t + h

    grid_shape: tuple[int, int, int, int, int] = (1, 52, 52, 36, 96)


class VarFlat(nn.Module):
    fence: bool = False
    fused: int = 10 ** 9

    @nn.compact
    def __call__(self, x):
        x = PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16,
                         name="patch_embed")(x)
        b, sx, sy, sz, c = x.shape
        t = x.reshape(b, -1, c)
        t = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                         name="patch_norm")(t)
        gs = (b, sx, sy, sz, c)
        t = FlatBlock(96, 3, (4, 4, 4), (0, 0, 0), fence=self.fence,
                      fused=self.fused, grid_shape=gs, name="b0")(t)
        t = FlatBlock(96, 3, (4, 4, 4), (2, 2, 2), fence=self.fence,
                      fused=self.fused, grid_shape=gs, name="b1")(t)
        return t


class VarCtl(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16,
                         name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                         name="patch_norm")(x)
        x = SwinBlock(96, 3, (4, 4, 4), (0, 0, 0), dtype=jnp.bfloat16,
                      fused_min_windows=10 ** 9, name="b0")(x)
        x = SwinBlock(96, 3, (4, 4, 4), (2, 2, 2), dtype=jnp.bfloat16,
                      fused_min_windows=10 ** 9, name="b1")(x)
        return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)

    cases = [
        ("f0_control_jnp", VarCtl()),
        ("f1_flat_jnp", VarFlat()),
        ("f2_flat_fenced_jnp", VarFlat(fence=True)),
        ("f3_flat_fenced_pallas", VarFlat(fence=True, fused=128)),
    ]
    for name, mod in cases:
        params = init_params(mod, x)

        def make(n, mod=mod, params=params):
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
