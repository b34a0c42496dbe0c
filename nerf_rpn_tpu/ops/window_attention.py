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


# ---------------------------------------------------------------------------
# v2: fused-qkv flash window attention
# ---------------------------------------------------------------------------
#
# Lessons from the v1 kernel above (measured 1.8x slower than XLA):
#   - it cast everything to f32 (no MXU bf16), paid per-window unrolled
#     mask selects, and required (W, H, N, D) transposes outside.
# v2 eliminates all three:
#   - consumes the qkv Dense output (W, N, 3C) DIRECTLY — the per-head
#     q/k/v tiles are lane-offset BlockSpec views, so the (B*nW, N, 3,
#     H, D) transpose chain never exists;
#   - one batched bf16 MXU matmul per (head, window-group) with f32
#     accumulation; the (G, N, N) logits live only in VMEM;
#   - the shift mask streams as a per-window additive (W, N, N) bf16
#     tensor (zeros skipped entirely via the unmasked variant), and the
#     relative-position bias broadcasts from a (1, N, N) VMEM block.
# HBM traffic per block drops from ~5x the (W, H, N, N) logits tensor
# (224 MB at Swin-S stage 0, 208^3 inputs) to qkv + out + mask.


def _kernel_v2(qkv_ref, bias_ref, out_ref, *, scale, num_heads,
               mask_ref=None):
    # qkv_ref: (G, N, 3C) — all heads; Mosaic lane blocks must be 128-
    # divisible or full-width, so the per-head q/k/v are static lane slices
    # here rather than BlockSpec views.  Heads unroll statically.
    g, n, c3 = qkv_ref.shape
    c = c3 // 3
    d = c // num_heads
    mask = None
    if mask_ref is not None:
        mask = mask_ref[:].astype(jnp.float32)      # (G, N, N)
    outs = []
    for h in range(num_heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d]
        k = qkv_ref[:, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q * q.dtype.type(scale), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                           # (G, N, N)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype))
    out_ref[:] = jnp.concatenate(outs, axis=-1)


def _pick_group(w: int, group: int) -> int:
    """Largest group in [8, 32] that divides ``w`` exactly, else ``group``.

    XLA lowers the pre-kernel pad to a full copy of the (W, N, 3C) tensor
    (~0.9 ms x 4 pads in the batch-4 eval stages unit, r4 trace: W=6084
    padded to 6096 at group=16 copies 224 MB per block).  The group is a
    major (untiled) dim, so any size works — divisible beats padded."""
    if w % group == 0 or w < 8:
        return group
    for g in range(min(32, w), 7, -1):
        if w % g == 0:
            return g
    return group


@partial(jax.jit,
         static_argnames=("num_heads", "group", "interpret"))
def fused_qkv_window_attention(
    qkv: jax.Array,          # (W, N, 3C) — the qkv Dense output
    bias: jax.Array,         # (H, N, N) relative-position bias
    mask: jax.Array | None,  # (W, N, N) additive shift mask, or None
    num_heads: int,
    group: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T / sqrt(D) + bias [+ mask]) v per window, fused.

    Returns (W, N, C) with heads concatenated in lane order — ready for the
    output projection.  Window count is padded to a multiple of ``group``
    internally (a divisible group is auto-picked first — see
    :func:`_pick_group`).
    """
    w, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = d ** -0.5
    group = _pick_group(w, group)
    pad = (-w) % group
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0)))
    wp = w + pad
    grid = (wp // group,)

    in_specs = [
        pl.BlockSpec((group, n, 3 * c), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, bias]
    kernel = partial(_kernel_v2, scale=scale, num_heads=num_heads)
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((group, n, n), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask)

        def kernel(qkv_ref, bias_ref, mask_ref, out_ref):  # noqa: F811
            _kernel_v2(qkv_ref, bias_ref, out_ref, scale=scale,
                       num_heads=num_heads, mask_ref=mask_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, n, c), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wp, n, c), qkv.dtype),
        interpret=interpret,
    )(*args)
    return out[:w]


def fused_qkv_window_attention_reference(qkv, bias, mask, num_heads):
    """jnp semantics twin of :func:`fused_qkv_window_attention`."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    qkv = qkv.reshape(w, n, 3, num_heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = jnp.einsum("whnd,whmd->whnm", q * (d ** -0.5), k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn + mask[:, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(w, n, c)


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


# ---------------------------------------------------------------------------
# v3: trainable flash window attention (custom VJP)
# ---------------------------------------------------------------------------
#
# The r4 train-step trace (benchmarks/README.md) shows the stage-0
# attention fwd+bwd region — qkv head-split copies, (W, H, N, N) logit
# materialisations, tiny-MXU batched matmuls and their backward mirrors —
# costing ~8 ms of the 115 ms step against a ~2 ms bandwidth floor
# (W=2000, N=64, H=3, D=32 at the train.sh 160^3 / batch-2 shapes).  XLA
# cannot avoid materialising the logits through the fwd/bwd seam; a
# custom-VJP kernel pair can: the forward reuses the v2 flash layout
# (logits live only in VMEM), and the backward RECOMPUTES the softmax
# probabilities from qkv in VMEM (N=64 makes recompute ~free) instead of
# reading stored probabilities from HBM.
#
# dbias (the relative-position-bias gradient, flowing back to the bias
# table) is accumulated across grid steps into a revisited (H, N, N) f32
# output block.  The shift mask is additive and constant (built from
# window geometry, not parameters), so its cotangent is zeros.
#
# Reference semantics for parity: the torch reference computes this as
# separate ops (model/feature_extractor.py WindowAttention3D: qkv Linear
# -> per-head softmax(qk^T*scale + bias [+ mask]) v); this kernel is a
# TPU execution detail with identical numerics fwd AND bwd (tests grad-
# check against the jnp path).


def _flash_bwd_kernel(qkv_ref, dout_ref, bias_ref, dqkv_ref, dbias_ref,
                      *, scale, num_heads, mask_ref=None):
    g, n, c3 = qkv_ref.shape
    c = c3 // 3
    d = c // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    mask = None
    if mask_ref is not None:
        mask = mask_ref[:].astype(jnp.float32)          # (G, N, N)

    dparts_q, dparts_k, dparts_v = [], [], []
    dbias_new = []
    for h in range(num_heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d]
        k = qkv_ref[:, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
        dout = dout_ref[:, :, h * d:(h + 1) * d]
        qs = q * q.dtype.type(scale)
        s = jax.lax.dot_general(
            qs, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (G, N, N)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)       # f32 (G, N, N)
        pb = p.astype(v.dtype)
        # dv[m] = sum_n p[n, m] dout[n]
        dparts_v.append(jax.lax.dot_general(
            pb, dout, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype))
        # dp[n, m] = dout[n] . v[m]
        dp = jax.lax.dot_general(
            dout, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (G, N, N)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(v.dtype)
        # dq[n] = scale * sum_m ds[n, m] k[m]
        dq = jax.lax.dot_general(
            dsb, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dparts_q.append(dq.astype(dqkv_ref.dtype))
        # dk[m] = sum_n ds[n, m] (scale * q[n]) = ds^T @ qs
        dparts_k.append(jax.lax.dot_general(
            dsb, qs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dqkv_ref.dtype))
        dbias_new.append(jnp.sum(ds, axis=0)[None])      # (1, N, N) f32
    dqkv_ref[:] = jnp.concatenate(dparts_q + dparts_k + dparts_v, axis=-1)
    dbias_ref[:] += jnp.concatenate(dbias_new, axis=0).astype(
        dbias_ref.dtype)


def _flash_fwd_call(qkv, bias, mask, num_heads, group, interpret):
    return fused_qkv_window_attention(
        qkv, bias, mask, num_heads, group=group, interpret=interpret)


def _pick_bwd_group(w: int, group: int, num_heads: int) -> int:
    """Like :func:`_pick_group` but capped so the backward kernel's scoped
    VMEM stack fits the compiler's 16 MiB budget.

    The unrolled per-head loop keeps ~5-6 live f32 ``(G, N, N)`` arrays
    per head plus the double-buffered in/out blocks on the Mosaic stack —
    empirically ~18.5 MiB at G=25, H=6 (the batch-4 stage-1 AOT compile
    failed with "scoped allocation 18.55M > 16.00M limit"), i.e. scoped
    bytes scale ~G*H.  Cap G*H <= 100 (~12.4 MiB est., comfortable
    margin); prefer a divisor of ``w`` under the cap (pads lower to full
    copies of the (W, N, 3C) tensor — cheap at train W<=2000 but pointless
    when a divisor exists)."""
    cap = max(100 // num_heads, 8)
    g = _pick_group(w, group)
    if g <= cap:
        return g
    for cand in range(min(cap, w), 7, -1):
        if w % cand == 0:
            return cand
    return min(cap, 16)


def _flash_bwd_call(qkv, dout, bias, mask, num_heads, group, interpret):
    w, n, c3 = qkv.shape
    c = c3 // 3
    scale = (c // num_heads) ** -0.5
    group = _pick_bwd_group(w, group, num_heads)
    pad = (-w) % group
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        dout = jnp.pad(dout, ((0, pad), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0)))
    wp = w + pad
    grid = (wp // group,)

    in_specs = [
        pl.BlockSpec((group, n, c3), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, n, c), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, dout, bias]
    kernel = partial(_flash_bwd_kernel, scale=scale, num_heads=num_heads)
    if mask is not None:
        in_specs.append(pl.BlockSpec((group, n, n), lambda t: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)

        def kernel(qkv_ref, dout_ref, bias_ref, mask_ref, dqkv_ref,  # noqa
                   dbias_ref):
            _flash_bwd_kernel(qkv_ref, dout_ref, bias_ref, dqkv_ref,
                              dbias_ref, scale=scale, num_heads=num_heads,
                              mask_ref=mask_ref)

    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((group, n, c3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, n, n), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((wp, n, c3), qkv.dtype),
            jax.ShapeDtypeStruct((num_heads, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dqkv[:w], dbias


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_window_attention(qkv, bias, mask, num_heads, group=16,
                           interpret=False):
    """Differentiable fused window attention: softmax(q k^T / sqrt(D)
    + bias [+ mask]) v from the packed qkv Dense output.

    qkv (W, N, 3C), bias (H, N, N) f32, mask (W, N, N) additive or None.
    Returns (W, N, C).  The backward recomputes the softmax in VMEM
    (flash style) and accumulates dbias across window groups; the mask is
    treated as constant (zero cotangent).
    """
    return _flash_fwd_call(qkv, bias, mask, num_heads, group, interpret)


def _flash_vjp_fwd(qkv, bias, mask, num_heads, group, interpret):
    out = _flash_fwd_call(qkv, bias, mask, num_heads, group, interpret)
    return out, (qkv, bias, mask)


def _flash_vjp_bwd(num_heads, group, interpret, res, dout):
    qkv, bias, mask = res
    dqkv, dbias = _flash_bwd_call(qkv, dout, bias, mask, num_heads, group,
                                  interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dbias.astype(bias.dtype), dmask


flash_window_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_window_attention_reference(qkv, bias, mask, num_heads):
    """jnp semantics twin (same math as the model's train path)."""
    return fused_qkv_window_attention_reference(qkv, bias, mask, num_heads)
