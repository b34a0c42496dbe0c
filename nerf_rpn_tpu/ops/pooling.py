"""3D max pools as free regroups + elementwise maxes.

``lax.reduce_window`` runs far under HBM roofline on this stack (the vgg
stem's 3^3/2 pool measured 0.95 ms at 118 GB/s for a ~100 MB input —
r4 trace, ``benchmarks/trace_forward.py --backbone vgg_EF``).  Both pools
the backbones need decompose into per-axis maxes over pair-regrouped views:

- z-axis pairs are FREE channel regroups ((..., Z, C) -> (..., Z/2, 2C) is
  a minor-adjacent merge, i.e. a view);
- x/y-axis pairs are FREE major-axis splits ((..., X, ...) ->
  (..., X/2, 2, ...));
- the leftover +1 tap of an overlapping 3-window is a unit-shifted slice.

Everything downstream is elementwise, so XLA fuses the whole pool into one
loop fusion at bandwidth.  Parity targets: ``nn.max_pool(2, 2)`` with torch
ceil_mode padding (reference ``feature_extractor.py:300`` MaxPool3d(2, 2,
ceil_mode=True)) and ``nn.max_pool(3, 2, padding=1)`` (reference resnet/vgg
stems, ``feature_extractor.py:64,340``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -jnp.inf


def _pad_axis(x: jax.Array, axis: int, lo: int, hi: int) -> jax.Array:
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads, constant_values=NEG)


def max_pool_2x2x2(x: jax.Array, ceil_mode: bool = True) -> jax.Array:
    """2^3 stride-2 max pool over (B, X, Y, Z, C); odd extents padded with
    -inf on the high side iff ``ceil_mode`` (torch ceil semantics)."""
    b = x.shape[0]
    for ax in (1, 2, 3):
        if x.shape[ax] % 2:
            if not ceil_mode:
                x = jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1, axis=ax)
            else:
                x = _pad_axis(x, ax, 0, 1)
    _, sx, sy, sz, c = x.shape
    # z-pairs: free channel regroup
    xq = x.reshape(b, sx, sy, sz // 2, 2 * c)
    m = jnp.maximum(xq[..., :c], xq[..., c:])
    # y-pairs then x-pairs: free major-axis splits
    m = m.reshape(b, sx, sy // 2, 2, sz // 2, c)
    m = jnp.maximum(m[:, :, :, 0], m[:, :, :, 1])
    m = m.reshape(b, sx // 2, 2, sy // 2, sz // 2, c)
    return jnp.maximum(m[:, :, 0], m[:, :, 1])


def _max3_pairs_channel(x: jax.Array, c: int) -> jax.Array:
    """Stride-2 3-window max along z via the pair-regroup channel trick.

    x: (..., L, C) with L even; returns (..., L/2 - 1, C) where
    out[i] = max(x[2i], x[2i+1], x[2i+2])."""
    lead = x.shape[:-2]
    L = x.shape[-2]
    xq = x.reshape(*lead, L // 2, 2 * c)
    e, o = xq[..., :c], xq[..., c:]           # x[2i], x[2i+1]
    m = jnp.maximum(e, o)
    e_next = jax.lax.slice_in_dim(e, 1, L // 2, axis=-2)
    return jnp.maximum(m[..., : L // 2 - 1, :], e_next)


def _max3_pairs_major(x: jax.Array, axis: int) -> jax.Array:
    """Same 3-window stride-2 max along a MAJOR axis (free pair split).

    x has even extent L along ``axis``; returns extent L/2 - 1."""
    L = x.shape[axis]
    shape = list(x.shape)
    shape[axis : axis + 1] = [L // 2, 2]
    xs = x.reshape(shape)
    e = jax.lax.index_in_dim(xs, 0, axis=axis + 1, keepdims=False)
    o = jax.lax.index_in_dim(xs, 1, axis=axis + 1, keepdims=False)
    m = jnp.maximum(e, o)
    e_next = jax.lax.slice_in_dim(e, 1, L // 2, axis=axis)
    return jnp.maximum(
        jax.lax.slice_in_dim(m, 0, L // 2 - 1, axis=axis), e_next)


def max_pool_3x3x3_s2_p1(x: jax.Array) -> jax.Array:
    """3^3 stride-2 padding-1 max pool over (B, X, Y, Z, C) — the
    resnet/vgg stem pool.  Output extent = floor((L + 2 - 3) / 2) + 1.

    Implementation pads each axis to (1, 1 + extra) with -inf so the
    padded extent is even and covers the last window, then applies the
    per-axis pair-regrouped 3-window max."""
    b, sx, sy, sz, c = x.shape

    def hi_pad(L):
        # padded length 2 * (out - 1) + 3 with out = (L - 1) // 2 + 1,
        # rounded up to even for the pair regroup
        out = (L - 1) // 2 + 1
        need = 2 * (out - 1) + 3
        even = need + (need % 2)
        return even - L - 1, out

    hz, _ = hi_pad(sz)
    x = _pad_axis(x, 3, 1, hz)
    x = _max3_pairs_channel(x, c)
    hy, _ = hi_pad(sy)
    x = _pad_axis(x, 2, 1, hy)
    x = _max3_pairs_major(x, 2)
    hx, _ = hi_pad(sx)
    x = _pad_axis(x, 1, 1, hx)
    x = _max3_pairs_major(x, 1)
    return x


def stem_pool(x: jax.Array) -> jax.Array:
    """The backbones' 3^3 stride-2 padding-1 stem pool, with the
    reduce_window form behind NERF_RPN_TPU_POOL_RW=1 as the A/B baseline."""
    import os

    if os.environ.get("NERF_RPN_TPU_POOL_RW", "0") != "0":
        import flax.linen as nn

        return nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                           padding=((1, 1), (1, 1), (1, 1)))
    return max_pool_3x3x3_s2_p1(x)
