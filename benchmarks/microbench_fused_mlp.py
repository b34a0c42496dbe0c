"""A/B the fused Swin-MLP Pallas kernel vs the XLA chain (conv-free).

Stage-0 bench shape: 208x208x144 grid -> 52x52x36 tokens (97,344), C=96,
H=384 — the r3 trace shows the XLA LN+fc1+gelu+fc2+residual megafusion at
~131 GB/s / 12% MFU (~0.7 ms per block).  The kernel keeps the (T, 384)
hidden tile in VMEM.

Usage: python benchmarks/microbench_fused_mlp.py [--tile 2048] [--reps 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--t", type=int, default=52 * 52 * 36)
    ap.add_argument("--c", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from nerf_rpn_tpu.ops.fused_mlp import (
        fused_mlp_block,
        fused_mlp_block_reference,
    )

    t, c = args.t, args.c
    h = 4 * c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (t, c)).astype(np.float32)).astype(
        jnp.bfloat16)
    params = (
        jnp.asarray(rng.normal(1, 0.05, (c,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (c,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (c, h)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (h,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (h, c)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.05, (c,)).astype(np.float32)),
    )

    xla = jax.jit(lambda v: fused_mlp_block_reference(v, *params))
    ker = jax.jit(lambda v: fused_mlp_block(v, *params, tile=args.tile))

    # parity on TPU compiled
    a = np.asarray(xla(x), np.float32)
    b = np.asarray(ker(x), np.float32)
    bad = np.abs(a - b) > 0.02 + 0.02 * np.abs(b)
    print(f"compiled parity: mismatch fraction {bad.mean():.2e} "
          f"max|d| {np.abs(a - b).max():.4f}", flush=True)

    def timed(label, fn, reps):
        v = x
        for _ in range(3):
            v = fn(v)
        float(jnp.sum(v.astype(jnp.float32)))
        for _ in range(max(reps // 3, 2)):
            v = fn(v)
        float(jnp.sum(v.astype(jnp.float32)))
        v = x
        t0 = time.perf_counter()
        for _ in range(reps):
            v = fn(v)
        float(jnp.sum(v.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label}: {dt * 1e3:.3f} ms  "
              f"(~{2 * t * c * 2 / dt / 1e9:.0f} GB/s x-in+out)", flush=True)

    timed("XLA chain   ", xla, args.reps)
    timed(f"Pallas tile={args.tile}", ker, args.reps)


if __name__ == "__main__":
    main()
