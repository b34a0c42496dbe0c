"""Patch-embed round 3: grouped-conv formulation.

Trace: the embed region costs ~2.7 ms (copy.1231 0.77 + conv 0.72 @ 12% MFU
+ LN 0.68 + regroup broadcast 0.37) for a ~5 GFLOP / ~150 MB-traffic op
(~0.4 ms at roofline).  The C_in=16 regrouped conv wastes 7/8 of the lanes.

Candidate here: merge ALL of (z, c) into lanes — (B,208,208,144,4) ->
(B,208,208,576) is a contiguous (free) view — and run ONE 2-D 4x4/stride-4
conv with feature_group_count=36 (each 16-lane z-group convolves against
the same (4,4,16,96) kernel, tiled 36x at trace time), producing
(B,52,52,3456) -> free view (B,52,52,36,96).  Full 576-lane input / 3456-
lane output utilisation.

  p0) committed PatchEmbed3D + LN            (control, ~2.7 in full fwd)
  p1) grouped 2-D conv + LN
  p2) grouped 2-D conv + LN, bf16 input pre-packed (pipeline does the cast)
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
from nerf_rpn_tpu.models.swin import PatchEmbed3D


class GroupedEmbed(nn.Module):
    features: int = 96
    patch: tuple[int, int, int] = (4, 4, 4)

    @nn.compact
    def __call__(self, x):
        px, py, pz = self.patch
        b, sx, sy, sz, c = x.shape
        g = sz // pz
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (px, py, pz, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x2 = x.reshape(b, sx, sy, sz * c).astype(jnp.bfloat16)
        # (px,py,pz,c,F) -> (px,py,pz*c,F) -> tile per group -> (px,py,16,g*F)
        k2 = kernel.reshape(px, py, pz * c, self.features)
        kg = jnp.tile(k2.astype(jnp.bfloat16), (1, 1, 1, g))
        y = jax.lax.conv_general_dilated(
            x2, kg, window_strides=(px, py), padding="VALID",
            dimension_numbers=("NXYC", "XYIO", "NXYC"),
            feature_group_count=g)
        y = y.reshape(b, sx // px, sy // py, g, self.features)
        return y + bias.astype(y.dtype)


class WithLN(nn.Module):
    embed: nn.Module

    @nn.compact
    def __call__(self, x):
        y = self.embed(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                            name="patch_norm")(y)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)
    xb = xf.astype(jnp.bfloat16)

    cases = [
        ("p0_committed", WithLN(PatchEmbed3D(96, (4, 4, 4),
                                             dtype=jnp.bfloat16)), xf),
        ("p1_grouped2d", WithLN(GroupedEmbed()), xf),
        ("p2_grouped2d_bf16in", WithLN(GroupedEmbed()), xb),
    ]
    # numerical sanity: grouped == committed
    pc = init_params(cases[0][1], xf)
    pg = {"params": {"embed": {"kernel": pc["params"]["embed"]["kernel"],
                               "bias": pc["params"]["embed"]["bias"]},
                     "patch_norm": pc["params"]["patch_norm"]}}
    yc = cases[0][1].apply(pc, xf[:, :16, :16, :16])
    yg = cases[1][1].apply(pg, xf[:, :16, :16, :16])
    err = float(jnp.max(jnp.abs(yc.astype(jnp.float32) - yg.astype(jnp.float32))))
    print({"grouped_vs_committed_max_err": err})

    for name, mod, x in cases:
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
