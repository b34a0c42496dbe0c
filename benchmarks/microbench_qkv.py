"""A/B the qkv projection + head-split layout in the TRAIN attention path.

The r4 train trace shows the jnp attention path paying two standalone
0.49 ms data-formatting copies per step for the
(2000, 64, 288) -> (2000, 64, 3, 3, 32) qkv head split (a MINOR-axis split
is a relayout copy — CLAUDE.md), plus mirrored copies in the backward.

Variants (stage-0 train shapes: 2000 windows x 64 tokens x 96 ch, bf16,
fwd + bwd through a scalar loss):

- split (current): Dense (C, 3C) -> reshape (W, N, 3, H, D) -> transpose
  to (W, H, N, D) per q/k/v -> attn -> out transpose back.
- einsum5d: one einsum "wnc,cthd->twhnd" straight to the attention layout
  (t major; no minor split, no transposes) -> attn.

Both compute identical math (the contraction order over c is unchanged).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--windows", type=int, default=2000)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--heads", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    W, N, C, H = args.windows, args.tokens, args.dim, args.heads
    D = C // H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (W, N, C)), jnp.bfloat16)
    wq = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)

    def attn_core(q, k, v):
        # (W, H, N, D) each, f32 logits, bf16 out — mirrors swin.py
        a = jnp.einsum("bhnd,bhmd->bhnm", q * D ** -0.5, k,
                       preferred_element_type=jnp.float32)
        a = a + bias[None]
        a = jax.nn.softmax(a, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhnm,bhmd->bhnd", a, v,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def f_split(x, wq):
        qkv = (x @ wq).reshape(W, N, 3, H, D)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        y = attn_core(q, k, v)
        return y.transpose(0, 2, 1, 3).reshape(W, N, C)

    def f_einsum5d(x, wq):
        w4 = wq.reshape(C, 3, H, D)
        qkv = jnp.einsum("wnc,cthd->twhnd", x, w4,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
        y = attn_core(qkv[0], qkv[1], qkv[2])
        return y.transpose(0, 2, 1, 3).reshape(W, N, C)

    # correctness (fwd + grads)
    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2) * 1e-6

    ga = jax.jit(jax.value_and_grad(loss(f_split), argnums=(0, 1)))
    gb = jax.jit(jax.value_and_grad(loss(f_einsum5d), argnums=(0, 1)))
    (la, (gxa, gwa)), (lb, (gxb, gwb)) = ga(x, wq), gb(x, wq)
    print("loss diff", abs(float(la) - float(lb)),
          "gx maxdiff", float(jnp.max(jnp.abs(gxa.astype(jnp.float32)
                                              - gxb.astype(jnp.float32)))),
          "gw maxdiff", float(jnp.max(jnp.abs(gwa.astype(jnp.float32)
                                              - gwb.astype(jnp.float32)))))

    def time_fn(name, g):
        def loop(reps):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(reps):
                l, (gx, gw) = g(x + (carry * 1e-20).astype(x.dtype), wq)
                carry = l.astype(jnp.float32) * 1e-30
            return float(carry)

        loop(5)
        loop(5)
        t0 = time.perf_counter()
        loop(args.reps)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"[{name}] {ms:.3f} ms fwd+bwd")
        return ms

    a = time_fn("split", ga)
    b = time_fn("einsum5d", gb)
    a2 = time_fn("split", ga)
    print(f"split {a:.3f}/{a2:.3f} vs einsum5d {b:.3f} ms")


if __name__ == "__main__":
    main()
