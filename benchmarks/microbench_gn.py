"""FCOS tower GroupNorm lowering: flax nn.GroupNorm vs matmul-combine.

Trace finding: each GN's group-combine lowers to a tiny f32[32,8]->f32[32]
reduce into SMEM costing ~74 us, x25 per forward = 1.85 ms
(``trace_forward.py --fcos``, reduce.185).  Candidate: compute per-channel
sums (XLA fuses those into the producing conv) and combine them to group
stats with a (256, 32) one-hot MATMUL instead of the reduce.

  g0) flax GroupNorm tower     (control)
  g1) manual GN, matmul combine
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

C, G = 256, 32


class MatmulGroupNorm(nn.Module):
    """GroupNorm(32) with the group-combine as a one-hot matmul.

    Parameter tree identical to flax nn.GroupNorm (scale/bias of (C,))."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        spatial = tuple(range(1, x.ndim - 1))
        n_per_group = (x.shape[1] * x.shape[2] * x.shape[3]) * (c // G)
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=spatial)            # (B, C) — fuses into conv
        s2 = jnp.sum(xf * xf, axis=spatial)       # (B, C)
        onehot = np.zeros((c, G), np.float32)
        onehot[np.arange(c), np.arange(c) // (c // G)] = 1.0
        oh = jnp.asarray(onehot)
        gs1 = s1 @ oh                             # (B, G)
        gs2 = s2 @ oh
        mean = gs1 / n_per_group
        var = gs2 / n_per_group - mean * mean
        inv = jax.lax.rsqrt(var + self.epsilon)
        mean_c = jnp.repeat(mean, c // G, axis=-1)    # (B, C)
        inv_c = jnp.repeat(inv, c // G, axis=-1)
        sh = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        y = (xf - mean_c.reshape(sh)) * inv_c.reshape(sh)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class Tower(nn.Module):
    manual: bool = False

    @nn.compact
    def __call__(self, x):
        for d in range(4):
            x = nn.Conv(C, (3, 3, 3), padding=1, dtype=jnp.bfloat16,
                        name=f"conv{d}")(x)
            if self.manual:
                x = MatmulGroupNorm(name=f"gn{d}")(x)
            else:
                x = nn.GroupNorm(num_groups=G, epsilon=1e-5,
                                 dtype=jnp.bfloat16, name=f"gn{d}")(x)
            x = nn.relu(x)
        return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 40, 40, 40, C)), jnp.bfloat16)

    ctl, man = Tower(), Tower(manual=True)
    pc = init_params(ctl, x)
    ym = man.apply(pc, x[:, :8, :8, :8])
    yc = ctl.apply(pc, x[:, :8, :8, :8])
    err = float(jnp.max(jnp.abs(ym.astype(jnp.float32) - yc.astype(jnp.float32))))
    print({"manual_vs_flax_max_err": err})

    for name, mod in [("g0_flax_gn_tower", ctl), ("g1_matmul_gn_tower", man)]:
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
