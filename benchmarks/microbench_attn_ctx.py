"""Minimal repro hunt: why is the fused window-attention kernel ~9 ms/call
inside the backbone graph but ~0.6 ms standalone?

Variants at the stage-0 shape (W=1521, N=64, C=96, H=3):
  a) kernel on a direct input qkv                       (fast standalone)
  b) kernel on qkv produced by a Dense inside the jit
  c) b + proj Dense after
  d) full attention sub-chain: partition -> Dense -> kernel -> proj ->
     reverse (the exact SwinBlock wiring)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.microbench_ops import slope_time
from nerf_rpn_tpu.models.swin import (
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
)
from nerf_rpn_tpu.ops.window_attention import fused_qkv_window_attention

W, N, C, H = 1521, 64, 96, 3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    qkv0 = jnp.asarray(rng.normal(0, 1, (W, N, 3 * C)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)
    wq = jnp.asarray(rng.normal(0, 0.1, (C, 3 * C)), jnp.bfloat16)
    wp_ = jnp.asarray(rng.normal(0, 0.1, (C, C)), jnp.bfloat16)
    x_tok = jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.bfloat16)
    x_grid = jnp.asarray(rng.normal(0, 1, (1, 52, 52, 36, C)), jnp.bfloat16)

    def bench(name, fn, x):
        def make(n):
            @jax.jit
            def step(x, carry):
                s = jnp.zeros((), jnp.float32)
                cur = x + carry.astype(x.dtype) * 1e-12
                for _ in range(n):
                    out = fn(cur)
                    r = jnp.sum(out.astype(jnp.float32))
                    s = s + r
                    cur = x + (r * 1e-20).astype(x.dtype)
                return s
            return step
        slope_time(name, make, x)

    bench("a_direct", lambda q: fused_qkv_window_attention(
        q, bias, None, H), qkv0)
    bench("b_dense_then_kernel", lambda t: fused_qkv_window_attention(
        jnp.dot(t, wq), bias, None, H), x_tok)
    bench("c_dense_kernel_proj", lambda t: jnp.dot(fused_qkv_window_attention(
        jnp.dot(t, wq), bias, None, H), wp_), x_tok)

    def full_chain(g):
        t = _window_partition(g, (4, 4, 4))
        y = fused_qkv_window_attention(jnp.dot(t, wq), bias, None, H)
        y = jnp.dot(y, wp_)
        return _window_reverse(y, (4, 4, 4), 1, (52, 52, 36))
    bench("d_partition_chain", full_chain, x_grid)


if __name__ == "__main__":
    main()
