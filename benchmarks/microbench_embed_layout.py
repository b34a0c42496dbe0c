"""Embed-unit layout experiments.

The jit_fwd_embed trace (benchmarks/README.md, r3) shows 0.77 ms of its
2.0 ms is ONE relayout copy: the conv wants the regrouped input as
bf16[208,208,8,5,16]{4,2,3,1,0:T(8,128)(2,1)} but the jit parameter
arrives in default layout.  In the real serving path the grids come from
``device_put`` (which can marshal into ANY layout for the same cost), and
in the bench chain they come from the ``perturb`` jit (whose output
layout is free to choose).  So: compile the embed unit with
``Layout.AUTO`` on the grids input, read back the chosen layout, and make
the producer emit it directly.

Variants (same process, chained-step timing, one final fetch):
  s0) control: perturb (default layout) -> embed            [bench path]
  s1) auto:    perturb with out_shardings=chosen -> embed(in=AUTO)
  s2) unfold:  perturb -> explicit transpose+reshape+matmul embed
  s3) bf16-in: perturb emits bf16 grids in the chosen layout -> embed
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from jax.experimental.layout import Format, Layout

from nerf_rpn_tpu.models.swin import PatchEmbed3D

WARMUP = 3
REPS = 60


class Embed(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = PatchEmbed3D(96, (4, 4, 4), dtype=self.dtype,
                         name="patch_embed")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="patch_norm")(x)


class EmbedUnfold(nn.Module):
    """stride==kernel patch embed as explicit transpose + one matmul."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, sx, sy, sz, c = x.shape
        p = 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, p, c, 96))
        bias = self.param("bias", nn.initializers.zeros, (96,))
        x = x.astype(self.dtype)
        x = x.reshape(b, sx // p, p, sy // p, p, sz // p, p * c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)
        x = x.reshape(b, sx // p, sy // p, sz // p, p * p * p * c)
        w = kernel.astype(self.dtype).reshape(p * p * p * c, 96)
        y = x @ w + bias.astype(self.dtype)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="patch_norm")(y)


def timed(step, reps=REPS):
    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = step(carry)
    float(carry)
    for _ in range(max(reps // 3, 2)):
        carry = step(carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = step(carry)
    float(carry)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    shape = (1, 208, 208, 144, 4)
    grids = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))

    embed = Embed()
    shapes = jax.eval_shape(lambda: embed.init(jax.random.PRNGKey(0), grids))
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes)

    summarize = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    perturb = jax.jit(lambda g, c: g + c * 1e-20)

    # s0: control
    f0 = jax.jit(lambda p, x: embed.apply(p, x))

    def s0(carry):
        return summarize(f0(params, perturb(grids, carry)))

    print(json.dumps({"op": "s0_control", "ms": round(timed(s0), 4)}),
          flush=True)

    # s1: AUTO input layout; producer emits the chosen layout
    f1 = jax.jit(lambda p, x: embed.apply(p, x),
                 in_shardings=(None, Format(Layout.AUTO)))
    c1 = f1.lower(params, grids).compile()
    in_fmts = c1.input_formats
    chosen = jax.tree.leaves(in_fmts)[-1]  # grids is the last leaf
    print(json.dumps({"op": "s1_chosen_layout", "layout": str(chosen)}),
          flush=True)
    perturb1 = jax.jit(lambda g, c: g + c * 1e-20, out_shardings=chosen)

    def s1(carry):
        return summarize(c1(params, perturb1(grids, carry)))

    print(json.dumps({"op": "s1_auto_layout", "ms": round(timed(s1), 4)}),
          flush=True)

    # s2: unfold+matmul formulation, default layouts
    unf = EmbedUnfold()
    shapes2 = jax.eval_shape(lambda: unf.init(jax.random.PRNGKey(0), grids))
    params2 = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes2)
    f2 = jax.jit(lambda p, x: unf.apply(p, x))

    def s2(carry):
        return summarize(f2(params2, perturb(grids, carry)))

    print(json.dumps({"op": "s2_unfold_matmul", "ms": round(timed(s2), 4)}),
          flush=True)

    # s3: bf16 grids, AUTO layout (producer also does the f32->bf16 cast)
    gridsb = grids.astype(jnp.bfloat16)
    f3 = jax.jit(lambda p, x: embed.apply(p, x),
                 in_shardings=(None, Format(Layout.AUTO)))
    c3 = f3.lower(params, gridsb).compile()
    chosen3 = jax.tree.leaves(c3.input_formats)[-1]
    perturb3 = jax.jit(
        lambda g, c: (g + c * 1e-20).astype(jnp.bfloat16),
        out_shardings=chosen3)

    def s3(carry):
        return summarize(c3(params, perturb3(grids, carry)))

    print(json.dumps({"op": "s3_bf16_auto", "ms": round(timed(s3), 4)}),
          flush=True)


if __name__ == "__main__":
    main()
