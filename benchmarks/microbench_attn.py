"""Fused window attention (v2 Pallas) vs the XLA einsum path, per stage."""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.microbench_ops import slope_time
from nerf_rpn_tpu.ops.window_attention import (
    fused_qkv_window_attention,
    fused_qkv_window_attention_reference,
)

# (windows, heads, C) per Swin-S stage at the 208x208x144 bench shape
STAGES = [
    ("stage0", 1521, 3, 96),
    ("stage1", 245, 6, 192),
    ("stage2", 48, 12, 384),
    ("stage3", 8, 24, 768),
]
N = 64


def chain(fn):
    def make(n):
        @jax.jit
        def step(qkv, carry):
            s = jnp.zeros((), jnp.float32)
            cur = qkv + carry.astype(qkv.dtype) * 1e-12
            for _ in range(n):
                out = fn(cur)
                r = jnp.sum(out.astype(jnp.float32))
                s = s + r
                cur = qkv + (r * 1e-20).astype(qkv.dtype)
            return s
        return step
    return make


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)

    for name, w, h, c in STAGES:
        qkv = jnp.asarray(rng.normal(0, 1, (w, N, 3 * c)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(0, 0.5, (h, N, N)), jnp.float32)
        m = np.zeros((w, N, N), np.float32)
        m[rng.random((w, N, N)) < 0.2] = -100.0
        mask = jnp.asarray(m, jnp.bfloat16)

        slope_time(f"{name}_xla_nomask",
                   chain(lambda x, h=h: fused_qkv_window_attention_reference(
                       x, bias, None, h)), qkv)
        for g in (8, 16, 32):
            if w < g:
                continue
            slope_time(f"{name}_pallas_g{g}_nomask",
                       chain(functools.partial(
                           fused_qkv_window_attention, bias=bias, mask=None,
                           num_heads=h, group=g)), qkv)
        slope_time(f"{name}_xla_mask",
                   chain(lambda x, h=h: fused_qkv_window_attention_reference(
                       x, bias, mask, h)), qkv)
        g = 16 if w >= 16 else 8
        slope_time(f"{name}_pallas_g{g}_mask",
                   chain(functools.partial(
                       fused_qkv_window_attention, bias=bias, mask=mask,
                       num_heads=h, group=g)), qkv)


if __name__ == "__main__":
    main()
