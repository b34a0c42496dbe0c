"""Hierarchical top-k that stays inside the TPU compiler's comfort zone.

``lax.top_k`` with k in the thousands over million-element axes aborts this
image's TPU AOT compiler (empirically: n >= ~500k with k = 2500).  The
two-stage form — per-chunk top-k then top-k over the surviving candidates —
is mathematically identical (every global top-k element is in its chunk's
top-k) and each stage sorts at most ``chunk`` lanes.  It is also less work:
O(n log chunk + ck log ck) instead of one giant sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 131072
_NEG = -jnp.inf


def safe_top_k(x: jax.Array, k: int, chunk: int = _CHUNK):
    """top_k over the last axis; identical results to ``lax.top_k``.

    x: (..., N) -> (values (..., k), indices (..., k)).
    """
    n = x.shape[-1]
    if n <= chunk or n <= k:
        return jax.lax.top_k(x, min(k, n))
    c = -(-n // chunk)
    pad = c * chunk - n
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=_NEG)
    batch = x.shape[:-1]
    xr = x.reshape(*batch, c, chunk)
    kk = min(k, chunk)
    vals, idx = jax.lax.top_k(xr, kk)            # (..., c, kk)
    offsets = (jnp.arange(c) * chunk)[:, None]
    idx = (idx + offsets).reshape(*batch, c * kk)
    vals = vals.reshape(*batch, c * kk)
    top_vals, cand = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, cand, axis=-1)
    return top_vals, top_idx
