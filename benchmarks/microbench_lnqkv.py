"""A/B the fused LN+partition+qkv Pallas kernel vs the XLA chain.

VERDICT r3 #9: the stages-unit roofline names the LN -> window-partition
-> qkv region (~1.3 ms of partition shuffles at ~50 GB/s) as the last
untried forward idea.  This measures, at the bench stage shapes
(208x208x144 input, Swin-S):

  - xla:    LayerNorm -> _window_partition -> Dense(3C)  (the model path)
  - kernel: ops/fused_ln_qkv.ln_partition_qkv (windowed BlockSpec DMAs)

plus exactness vs the jnp reference.  Chained-steps timing per
utils/profiling (axon tunnel: no block_until_ready).

Usage:  python benchmarks/microbench_lnqkv.py [--interpret]
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.fused_ln_qkv import (
    ln_partition_qkv, ln_partition_qkv_reference)
from nerf_rpn_tpu.utils.profiling import benchmark_fn

WINDOW = (4, 4, 4)

# (B, X, Y, Z, C): swin-s stage shapes at the bench input 208x208x144,
# window-padded as the model pads them (26->28, 18->20 for stage 1)
SHAPES = [
    ("stage0", (1, 52, 52, 36, 96)),
    ("stage1", (1, 28, 28, 20, 192)),
]


def xla_chain(x, s, t, w, b, window, dtype=jnp.bfloat16):
    # the model path: flax LN (f32 stats) -> partition -> dense
    from nerf_rpn_tpu.models.swin import _window_partition
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * s + t).astype(dtype)
    h = _window_partition(h, window)
    y = jnp.dot(h, w.astype(dtype), preferred_element_type=jnp.float32)
    return (y + b).astype(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--layout", default="flat", choices=["flat", "w8"])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)
    for name, shape in SHAPES:
        c = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        s = jnp.asarray(rng.standard_normal(c), jnp.float32)
        t = jnp.asarray(rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, 3 * c)) * c ** -0.5,
                        jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(3 * c), jnp.float32)

        ref = ln_partition_qkv_reference(x, s, t, w, b, WINDOW)
        got = ln_partition_qkv(x, s, t, w, b, WINDOW,
                               out_layout=args.layout,
                               interpret=args.interpret)
        if args.layout == "w8":
            got = got.reshape(ref.shape)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"[{name}] max_err kernel vs reference: {err:.2e}")
        assert err < 0.1, err

        if args.interpret:
            continue

        def chain(f):
            @jax.jit
            def step(x, carry):
                y = f(x + carry.astype(x.dtype) * 0)
                return carry + jnp.sum(y[0, 0]).astype(jnp.float32) * 0 + 1
            return step
        f_xla = chain(lambda x: xla_chain(x, s, t, w, b, WINDOW))
        f_ker = chain(lambda x: ln_partition_qkv(
            x, s, t, w, b, WINDOW, out_layout=args.layout))
        ms_x = benchmark_fn(f_xla, x) * 1e3
        ms_k = benchmark_fn(f_ker, x) * 1e3
        # re-time the control to bound session drift
        ms_x2 = benchmark_fn(f_xla, x) * 1e3
        print(f"[{name}] xla {ms_x:.3f}/{ms_x2:.3f} ms  "
              f"kernel({args.layout}) {ms_k:.3f} ms")


if __name__ == "__main__":
    main()
