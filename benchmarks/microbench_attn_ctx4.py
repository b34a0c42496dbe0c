"""Context bisect round 4: is the XLA *conv op itself* the layout trigger?

Round-3 result: no in-graph fix (barrier / plain conv / f32 input) removes
the embed-conv x pallas penalty.  Here the conv is removed entirely — patch
embed as space-to-depth reshape + Dense — and a downstream 3^3 conv (FPN
stand-in) is added back, to decide between "conv-free embed" and "separate
compile units":

  d1) dense-embed + fused pair                 (no conv anywhere)
  d2) dense-embed + jnp pair                   (control)
  d3) dense-embed + fused pair + 3^3 conv out  (downstream conv poisons?)
  d4) conv-embed  + fused pair [ctx3 ref ~16]  (re-measure for run parity)
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


class DenseEmbed(nn.Module):
    """Patch embed with zero convolutions: space-to-depth + Dense."""

    features: int = 96
    patch: tuple[int, int, int] = (4, 4, 4)

    @nn.compact
    def __call__(self, x):
        px, py, pz = self.patch
        b, sx, sy, sz, c = x.shape
        x = x.reshape(b, sx // px, px, sy // py, py, sz // pz, pz, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, sx // px, sy // py, sz // pz, px * py * pz * c)
        return nn.Dense(self.features, dtype=jnp.bfloat16)(x.astype(jnp.bfloat16))


class Var(nn.Module):
    fused: int = 1
    conv_embed: bool = False
    tail_conv: bool = False

    @nn.compact
    def __call__(self, x):
        if self.conv_embed:
            x = PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16,
                             name="patch_embed")(x)
        else:
            x = DenseEmbed(name="dense_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(x)
        x = SwinBlock(96, 3, (4, 4, 4), (0, 0, 0), dtype=jnp.bfloat16,
                      fused_min_windows=self.fused, name="b0")(x)
        x = SwinBlock(96, 3, (4, 4, 4), (2, 2, 2), dtype=jnp.bfloat16,
                      fused_min_windows=self.fused, name="b1")(x)
        if self.tail_conv:
            x = nn.Conv(96, (3, 3, 3), dtype=jnp.bfloat16, name="tail")(x)
        return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)

    cases = [
        ("d1_dense_fused", Var()),
        ("d2_dense_jnp", Var(fused=10 ** 9)),
        ("d3_dense_fused_tailconv", Var(tail_conv=True)),
        ("d4_convembed_fused", Var(conv_embed=True)),
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
