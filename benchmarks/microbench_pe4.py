"""Patch-embed round 4: staged space-to-depth merges + plain MXU matmul.

Trace context (benchmarks/README.md): the committed regroup conv's embed
unit costs ~2.0 ms, of which 0.77 ms is one XLA input-relayout copy at
145 GB/s.  The one-shot space-to-depth transpose (microbench_ops.
S2DPatchEmbed) moves tiny (pz, c)=128-byte contiguous chunks; the staged
variant here merges one axis at a time so every copy moves >= 1 KB
contiguous runs:

  z-merge: (B,X,Y,Z,C)     -> (B,X,Y,Z/4,4C)        FREE contiguous view
  y-merge: (B,X,Y/4,Z/4,16C) via transpose moving (Z/4, 4C) = 1.1 KB runs
  x-merge: (B,X/4,Y/4,Z/4,64C) via transpose moving (Z/4, 16C) = 4.6 KB runs
  embed:   (..., 256) @ (256, 96) one clean MXU matmul + LN

Minor-axis channel order after the staged merges is (px, py, pz, c) —
exactly the row-major flatten of the conv kernel, so parameters keep the
reference Conv layout (weight converter unchanged).

Cases:
  p0) committed PatchEmbed3D (z-regroup + (4,4,1) conv) + LN   [control]
  p1) staged merges + matmul + LN
  p2) one-shot 6D space-to-depth transpose + matmul + LN  [known-bad ref]
  p3) p1 with bf16 input (pipeline pre-casts for bf16 models)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from benchmarks.microbench_ops import (
    slope_time,
    module_chain,
    init_params,
    S2DPatchEmbed,
)
from nerf_rpn_tpu.models.swin import PatchEmbed3D


class StagedS2DEmbed(nn.Module):
    features: int = 96
    patch: tuple[int, int, int] = (4, 4, 4)

    @nn.compact
    def __call__(self, x):
        px, py, pz = self.patch
        b, sx, sy, sz, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (px, py, pz, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(jnp.bfloat16)
        # z-merge: contiguous reinterpretation, no data movement
        x = x.reshape(b, sx, sy, sz // pz, pz * c)
        # y-merge: copy with (Z/pz, pz*c) contiguous runs
        x = x.reshape(b, sx, sy // py, py, sz // pz, pz * c)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        x = x.reshape(b, sx, sy // py, sz // pz, py * pz * c)
        # x-merge: copy with (Z/pz, py*pz*c) contiguous runs
        x = x.reshape(b, sx // px, px, sy // py, sz // pz, py * pz * c)
        x = x.transpose(0, 1, 3, 4, 2, 5)
        x = x.reshape(b, sx // px, sy // py, sz // pz, px * py * pz * c)
        w = kernel.reshape(-1, self.features).astype(jnp.bfloat16)
        return jnp.dot(x, w) + bias.astype(jnp.bfloat16)


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

    p0 = WithLN(PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16))
    p1 = WithLN(StagedS2DEmbed())
    p2 = S2DPatchEmbed()   # has its own LN inside
    pc = init_params(p0, xf)
    p2_params = init_params(p2, xf)

    # numerical sanity: staged channel order == conv kernel flatten
    small = xf[:, :16, :16, :16]
    y0 = p0.apply(pc, small)
    y1 = p1.apply(pc, small)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print({"staged_vs_committed_max_err": err})
    assert err < 0.05, err

    cases = [("p0_committed_regroup_conv", p0, pc, xf),
             ("p1_staged_s2d_matmul", p1, pc, xf),
             ("p2_oneshot_s2d_matmul", p2, p2_params, xf),
             ("p3_staged_s2d_matmul_bf16in", p1, pc, xb),
             ("p4_committed_regroup_conv_bf16in", p0, pc, xb)]
    for name, mod, params, x in cases:
        slope_time(name, module_chain(mod, params), x)


if __name__ == "__main__":
    main()
