"""Fused 3D shifted-window attention (Pallas TPU kernel).

The Swin backbone's hot op: per (window, head), softmax(q k^T * scale +
relative-position bias + shift mask) v over N = window volume (64 tokens for
the 4^3 windows).  The unfused jnp path materialises the (num_windows,
heads, N, N) attention tensor in HBM (~100 MB per early Swin block at
160-208^3 inputs, written + read back); this kernel keeps the attention
tile in VMEM and writes only the (N, D) outputs.

Design:
- grid over window tiles; each step processes ``tile`` windows x all heads.
- the relative-position bias (H, N, N) and the small table of distinct
  shift-mask patterns (P, N, N) sit whole in VMEM (<= ~0.5 MB).
- each window's mask-pattern id arrives via scalar prefetch, so the kernel
  gathers the right (N, N) mask with a dynamic index — no per-window mask
  tensor ever exists (the jnp path broadcasts one).
- matmuls run on the MXU via jnp.einsum with f32 accumulation; softmax on
  the VPU.

The pure-jnp fallback (``window_attention_reference``) defines the
semantics; the kernel is tested for exact agreement (interpret mode on CPU,
compiled on TPU).

Measured result (v5e, Swin-S stage-1 shapes W=2197 H=3 N=64 D=32): the
kernel runs correct but ~1.8x SLOWER than XLA's fused batched-einsum path —
at 64-token windows XLA's fusion already keeps the attention tile on-chip
and pipelines better than this hand-written grid.  The models therefore
default to the jnp path; the kernel stays as the optimisation harness for
larger windows / future fused-QKV variants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_reference(
    q: jax.Array,   # (W, H, N, D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,        # (H, N, N)
    mask_table: jax.Array,  # (P, N, N) additive
    pattern_ids: jax.Array, # (W,) int32 into mask_table
) -> jax.Array:
    scale = q.shape[-1] ** -0.5
    attn = jnp.einsum("whnd,whmd->whnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    attn = attn + mask_table[pattern_ids][:, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _kernel(pat_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    t = pl.program_id(0)
    tile, h, n, d = q_ref.shape
    scale = d ** -0.5
    # Mosaic matmul supports a single batch dim: fold (tile, H) together
    q = q_ref[:].astype(jnp.float32).reshape(tile * h, n, d) * scale
    k = k_ref[:].astype(jnp.float32).reshape(tile * h, n, d)
    v = v_ref[:].astype(jnp.float32).reshape(tile * h, n, d)
    attn = jnp.einsum("bnd,bmd->bnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(tile, h, n, n) + bias_ref[:][None].astype(jnp.float32)

    # per-window shift mask: Mosaic has no dynamic gather, so select each
    # window's pattern with a statically-unrolled scalar-weighted sum over
    # the small pattern table (P <= 27); scalars come from SMEM prefetch
    n_pat = mask_ref.shape[0]
    mask_list = []
    for w in range(tile):
        pid = pat_ref[t * tile + w]
        m_w = jnp.zeros((n, n), jnp.float32)
        for p in range(n_pat):
            coef = jnp.where(pid == p, 1.0, 0.0)
            m_w = m_w + coef * mask_ref[p].astype(jnp.float32)
        mask_list.append(m_w[None, None])
    attn = attn + jnp.concatenate(mask_list, axis=0)
    attn = jax.nn.softmax(attn, axis=-1).reshape(tile * h, n, n)
    out = jnp.einsum("bnm,bmd->bnd", attn, v,
                     preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(tile, h, n, d).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_window_attention(
    q: jax.Array,           # (W, H, N, D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,        # (H, N, N)
    mask_table: jax.Array,  # (P, N, N)
    pattern_ids: jax.Array, # (W,) int32
    tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    w, h, n, d = q.shape
    pad = (-w) % tile
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0), (0, 0)))
        pattern_ids = jnp.pad(pattern_ids, (0, pad))
    wp = w + pad

    # index maps receive (grid idx, scalar-prefetch ref)
    qkv_spec = pl.BlockSpec(
        (tile, h, n, d), lambda t, pat: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(wp // tile,),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(bias.shape, lambda t, pat: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mask_table.shape, lambda t, pat: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((wp, h, n, d), q.dtype),
        interpret=interpret,
    )(pattern_ids.astype(jnp.int32), q, k, v, bias, mask_table)
    return out[:w]
