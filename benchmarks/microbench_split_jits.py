"""Split-compile-unit test: do the stage-0 blocks speed up when the patch
embed (conv) lives in a SEPARATE jit?

Hypothesis from the trace + ctx bisects: XLA layout assignment propagates
conv-flavoured layouts into the token pipeline (LN stats at 9-27 GB/s,
T(2,128) tilings) and poisons the Pallas custom call's neighbourhood.
Layout assignment is per-program, so a jit boundary between the conv and
the blocks should give the blocks clean default layouts — at the price of
materialising the (1,52,52,36,96) bf16 stage input (~19 MB, ~0.05 ms).

  s0) one jit:  embed+LN+2 jnp blocks      (control, ~8.3 ms)
  s1) two jits: [embed+LN] | [2 jnp blocks]
  s2) two jits: [embed+LN] | [2 Pallas-attention blocks]
  s3) embed jit alone                       (to apportion s1/s2)
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


class Embed(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = PatchEmbed3D(96, (4, 4, 4), dtype=jnp.bfloat16,
                         name="patch_embed")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                            name="patch_norm")(x)


class Blocks(nn.Module):
    fused: int = 10 ** 9

    @nn.compact
    def __call__(self, x):
        x = SwinBlock(96, 3, (4, 4, 4), (0, 0, 0), dtype=jnp.bfloat16,
                      fused_min_windows=self.fused, name="b0")(x)
        x = SwinBlock(96, 3, (4, 4, 4), (2, 2, 2), dtype=jnp.bfloat16,
                      fused_min_windows=self.fused, name="b1")(x)
        return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)

    embed = Embed()
    pe = init_params(embed, x)
    y0 = jax.eval_shape(lambda: embed.apply(pe, x))
    blocks_jnp = Blocks()
    blocks_fused = Blocks(fused=128)
    dummy = jnp.zeros(y0.shape, y0.dtype)
    pb = init_params(blocks_jnp, dummy)

    # s0: single jit
    class Both(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Blocks(name="blk")(Embed(name="emb")(x))

    both = Both()
    p_both = {"params": {"emb": pe["params"], "blk": pb["params"]}}

    def make_s0(n):
        @jax.jit
        def fn(x, carry):
            s = jnp.zeros((), jnp.float32)
            cur = x + carry.astype(x.dtype) * 1e-12
            for _ in range(n):
                y = both.apply(p_both, cur)
                r = jnp.sum(y.astype(jnp.float32))
                s = s + r
                cur = x + (r * 1e-20).astype(x.dtype)
            return s
        return fn
    slope_time("s0_single_jit_jnp", make_s0, x)

    # split variants: separate jits per call (chained via host-side python,
    # no fetch between them)
    emb_j = jax.jit(lambda p, v: embed.apply(p, v))
    blk_jnp_j = jax.jit(lambda p, v: blocks_jnp.apply(p, v))
    blk_fused_j = jax.jit(lambda p, v: blocks_fused.apply(p, v))
    sum_j = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    pert_j = jax.jit(lambda x, r: x + (r * 1e-20).astype(x.dtype))

    def make_split(blk):
        def make(n):
            def fn(xv, carry):
                r = carry
                cur = pert_j(xv, r)
                s = None
                for _ in range(n):
                    y = emb_j(pe, cur)
                    y = blk(pb, y)
                    r = sum_j(y)
                    s = r if s is None else s + r * 0
                    cur = pert_j(xv, r)
                return r
            return fn
        return make
    slope_time("s1_split_jnp", make_split(blk_jnp_j), x)
    slope_time("s2_split_fused", make_split(blk_fused_j), x)

    def make_embed_only(n):
        def fn(xv, carry):
            r = carry
            cur = pert_j(xv, r)
            for _ in range(n):
                y = emb_j(pe, cur)
                r = sum_j(y)
                cur = pert_j(xv, r)
            return r
        return fn
    slope_time("s3_embed_only", make_embed_only, x)


if __name__ == "__main__":
    main()
