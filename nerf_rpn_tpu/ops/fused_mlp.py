"""Fused Swin MLP block (Pallas TPU kernel): x + fc2(gelu(fc1(LN(x)))).

Why: in the conv-free Swin "stages" compile unit, XLA megafuses each
block's LN + fc1 + gelu + fc2 + residual into one fusion that runs at
~131 GB/s / 12% MFU (r3 trace, stage-0 blocks) — the (T, 4C) hidden
activation makes a full HBM round trip (94 MB per stage-0 block at the
bench shape).  Splitting the fusion measured NEUTRAL
(`benchmarks/microbench_stages_mlp.py`): the round trip is the cost, not
the fusion decision.  This kernel keeps the hidden tile in VMEM: HBM
traffic drops to x-in + out + weights.

Semantics parity (tested against the flax module chain in
``tests/test_fused_mlp.py``):
- LayerNorm: f32 stats (fast-variance form: E[x^2] - E[x]^2, eps inside
  the rsqrt), scale/bias applied in f32, result cast to the compute dtype
  — exactly ``nn.LayerNorm(epsilon=eps, dtype=...)``.
- Dense: bf16 operands, MXU f32 accumulation, bf16 result + bf16 bias —
  exactly ``nn.Dense(dtype=...)``.
- GELU: erf form evaluated in f32 (XLA also lowers the bf16 erf chain
  through f32), cast back.

MEASURED OUTCOME (v5e, stage-0 bench shape, same-session): the kernel ties
XLA (1.23 vs 1.19 ms) — the region is VPU-TRANSCENDENTAL-bound, not
HBM-bound (relu variant: 0.90 ms; erf-gelu: 1.63 ms), so VMEM residency
buys nothing.  The useful discovery was the erf itself: this kernel's A&S
polynomial erf matches XLA's erf chain output bit-for-bit in bf16 at a
fraction of the VPU cost — landed as ``ops/activations.erf_gelu`` in the
PLAIN jnp path (no custom call, so it also helps training and keeps
conv-containing programs poison-free).  The kernel stays as a harness.

Like the fused window attention, this kernel must only run in conv-free
programs (custom calls poison XLA layout assignment around convolutions —
CLAUDE.md); the Swin eval split-units path qualifies, training does not
(no custom VJP either).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(x):
    """f32 erf for Mosaic (no erf primitive in the Pallas TPU lowering).

    Abramowitz & Stegun 7.1.26: |error| <= 1.5e-7 absolute — below f32
    test tolerance and ~25x below one bf16 ULP at |gelu| ~ 1, so the bf16
    output rounds identically to the true-erf XLA chain (parity-tested).
    """
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, eps):
    x = x_ref[:]                                   # (tile, C)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)
    h = jax.lax.dot(y, w1_ref[:],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1_ref[:].astype(x.dtype)
    hf = h.astype(jnp.float32)
    h = (hf * 0.5 * (1.0 + _erf_f32(hf / jnp.sqrt(2.0)))).astype(x.dtype)
    o = jax.lax.dot(h, w2_ref[:],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    o = o + b2_ref[:].astype(x.dtype)
    out_ref[:] = x + o


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_mlp_block(
    x: jax.Array,        # (T, C) tokens
    ln_scale: jax.Array,  # (C,) f32
    ln_bias: jax.Array,   # (C,) f32
    w1: jax.Array,        # (C, H)
    b1: jax.Array,        # (H,)
    w2: jax.Array,        # (H, C)
    b2: jax.Array,        # (C,)
    eps: float = 1e-5,
    tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """x + fc2(gelu(fc1(LayerNorm(x)))) with the hidden tile VMEM-resident.

    Token count is padded to a multiple of ``tile`` internally.  Weights are
    cast to the compute dtype outside the kernel (as flax Dense does) and
    stay resident across grid steps.
    """
    t, c = x.shape
    h = w1.shape[1]
    pad = (-t) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    tp = t + pad
    dtype = x.dtype
    w1 = w1.astype(dtype)
    b1 = b1.astype(dtype)
    w2 = w2.astype(dtype)
    b2 = b2.astype(dtype)
    ln_scale = ln_scale.astype(jnp.float32)
    ln_bias = ln_bias.astype(jnp.float32)

    whole = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            whole(c), whole(c),
            whole(c, h), whole(h),
            whole(h, c), whole(c),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, c), dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out[:t]


def fused_mlp_block_reference(x, ln_scale, ln_bias, w1, b1, w2, b2,
                              eps: float = 1e-5):
    """jnp semantics twin (the flax LN+Dense+gelu+Dense+residual chain)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = y.astype(dtype)
    h = (y @ w1.astype(dtype) + b1.astype(dtype)).astype(dtype)
    hf = h.astype(jnp.float32)
    h = (hf * 0.5 * (1.0 + jax.lax.erf(hf / jnp.sqrt(2.0)))).astype(dtype)
    o = (h @ w2.astype(dtype) + b2.astype(dtype)).astype(dtype)
    return x + o
