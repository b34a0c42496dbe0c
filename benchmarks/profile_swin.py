"""Fine-grained Swin-S timing at the bench shape: per-stage blocks,
PatchMerging, FPN, and intra-block attention/MLP splits."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

WARMUP = 3
REPS = 20


def timed(name, step, carry, extra=None):
    for _ in range(WARMUP):
        carry = step(carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = step(carry)
    float(carry)
    _ = (time.perf_counter() - t0) / REPS
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = step(carry)
    float(carry)
    mean_s = (time.perf_counter() - t0) / REPS
    rec = {"component": name, "ms": round(mean_s * 1e3, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return carry


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from nerf_rpn_tpu.models.swin import (
        PatchMerging3D,
        ShiftedWindowAttention3D,
        SwinBlock,
    )
    from nerf_rpn_tpu.models.fpn import FPN

    rng = np.random.default_rng(0)
    carry = jnp.zeros((), jnp.float32)
    # stage shapes for input (208, 208, 144) -> embed (52, 52, 36)
    stage_shapes = [(52, 52, 36, 96), (26, 26, 18, 192),
                    (13, 13, 9, 384), (7, 7, 5, 768)]
    depths = [2, 2, 18, 2]
    heads = [3, 6, 12, 24]

    def bench_module(name, mod, x, n=1, extra=None):
        params = jax.tree.map(
            lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype),
            jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), x)))

        @jax.jit
        def fwd(p, x):
            y = x
            for _ in range(n):
                y = mod.apply(p, y)
            return jnp.sum(y.astype(jnp.float32))

        def step(c):
            return fwd(params, x + c.astype(x.dtype) * 1e-8)
        return timed(name, step, jnp.zeros((), jnp.float32), extra)

    for i, (shape, h) in enumerate(zip(stage_shapes, heads)):
        x = jnp.asarray(rng.normal(0, 1, (1, *shape)), jnp.bfloat16)
        # one regular + one shifted block, repeated depth/2 times
        blkA = SwinBlock(shape[-1], h, (4, 4, 4), (0, 0, 0),
                         dtype=jnp.bfloat16, name=None)
        bench_module(f"stage{i}_block_noshift", blkA, x, n=1,
                     extra={"n_blocks_in_stage": depths[i]})
        blkB = SwinBlock(shape[-1], h, (4, 4, 4), (2, 2, 2),
                         dtype=jnp.bfloat16)
        bench_module(f"stage{i}_block_shift", blkB, x, n=1)
        attn = ShiftedWindowAttention3D(shape[-1], (4, 4, 4), (0, 0, 0), h,
                                        dtype=jnp.bfloat16)
        bench_module(f"stage{i}_attn_only", attn, x)

    # patch merges
    for i in range(1, 4):
        s_prev = stage_shapes[i - 1]
        x = jnp.asarray(rng.normal(0, 1, (1, *s_prev)), jnp.bfloat16)
        bench_module(f"merge_{i}", PatchMerging3D(s_prev[-1], dtype=jnp.bfloat16), x)

    # FPN on the four stage outputs
    feats = tuple(
        jnp.asarray(rng.normal(0, 1, (1, *s)), jnp.bfloat16)
        for s in stage_shapes
    )
    fpn = FPN(in_channels=(96, 192, 384, 768), out_channels=256, num_outs=4,
              dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype),
        jax.eval_shape(lambda: fpn.init(jax.random.PRNGKey(0), feats)))

    @jax.jit
    def fpn_fwd(p, feats, c):
        feats = tuple(f + c.astype(f.dtype) * 1e-8 for f in feats)
        ys = fpn.apply(p, feats)
        return sum(jnp.sum(y.astype(jnp.float32)) for y in ys)

    timed("fpn", lambda c: fpn_fwd(params, feats, c), carry)

    # single 3^3 conv 256->256 at level-0 shape (the head tower unit)
    import flax.linen as nn

    class OneConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.relu(nn.Conv(256, (3, 3, 3), padding=1,
                                   dtype=jnp.bfloat16)(x))

    x0 = jnp.asarray(rng.normal(0, 1, (1, 52, 52, 36, 256)), jnp.bfloat16)
    bench_module("head_conv3_L0", OneConv(), x0)


if __name__ == "__main__":
    main()
