"""Large-N top-k that stays inside the TPU compiler's comfort zone.

``lax.top_k`` with k in the thousands over million-element axes aborts this
image's TPU AOT compiler (empirically: n >= ~500k with k = 2500), and the
hierarchical per-chunk-sort fallback costs ~1.5 ns/element (the bench
trace's two sorts = 2.8 ms of the 6.7 ms proposal stage).

The large-N path here is an exact radix select instead — identical results
to ``lax.top_k`` including its lowest-index-first tie order:

1. Map values to order-preserving uint32 keys (sign-flip trick); bf16
   inputs map to 16-bit keys directly (the f32 cast is exact, so order
   and ties are unchanged).
2. Descend 8 nibbles (4 for bf16): per round, a fused compare+reduce
   histogram (one ~4 B/element sweep) pins the next 4 bits of the exact
   k-th largest key.  The rounds are sequential full-array sweeps — the
   latency-bound part — so the bf16 path halves them.
   No data-dependent control flow — vmap/jit safe, static shapes.
3. The k-th key value t splits the top-k into all keys > t (fewer than k by
   construction) plus the FIRST (by index) remaining keys == t — both sets
   are compacted with the gather-based rank-select from ``ops/nms`` (no
   scatters, no full-length cumsums), then a tiny (2k,) ``lax.top_k``
   restores the exact value-descending / index-ascending output order.

Total: ~10 streaming sweeps of the score vector (O(n) bytes), versus a
full sort's O(n log n) compare-exchange passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 131072


def _monotone_keys(x: jax.Array) -> jax.Array:
    """f32-representable values -> uint32 keys with the same total order."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (bits >> 31).astype(bool)
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _monotone_keys_bf16(x: jax.Array) -> jax.Array:
    """bf16 values -> 16-bit keys (in uint32) with the same total order.

    bf16 is truncated IEEE f32, so the sign-flip trick works on its 16 raw
    bits directly; the descent then needs only 4 nibble rounds instead of 8
    — the rounds are SEQUENTIAL full-array sweeps, so this halves the
    latency-bound part of the radix select.  Order (including ±0 and ties)
    is identical to casting to f32 first: the cast is exact.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint16)
    neg = (bits >> 15).astype(bool)
    k16 = jnp.where(neg, ~bits, bits | jnp.uint16(0x8000))
    return k16.astype(jnp.uint32)


def _kth_key(keys: jax.Array, k: int,
             rounds: int = 8) -> tuple[jax.Array, jax.Array]:
    """Exact k-th largest key of a 1-D uint32 array, by nibble descent.

    ``rounds``: number of 4-bit rounds (8 for full uint32 keys, 4 for
    16-bit keys stored in uint32).  Returns (t, n_gt): the k-th largest
    key value and the count of keys strictly greater than it (always < k).
    """
    nib_ids = jnp.arange(16, dtype=jnp.uint32)
    prefix = jnp.uint32(0)
    k_rem = jnp.int32(k)
    n_gt = jnp.int32(0)
    for r in range(rounds - 1, -1, -1):
        if r == rounds - 1:
            match = jnp.ones(keys.shape, bool)
        else:
            hi = jnp.uint32(4 * (r + 1))
            match = (keys >> hi) == (prefix >> hi)
        nib = (keys >> jnp.uint32(4 * r)) & jnp.uint32(15)
        onehot = (nib[:, None] == nib_ids[None, :]) & match[:, None]
        counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)          # (16,)
        suffix = jnp.cumsum(counts[::-1])[::-1]                    # >= v
        # largest v with count(matching nibble >= v) >= k_rem
        viable = suffix >= k_rem
        v = jnp.max(jnp.where(viable, jnp.arange(16), -1)).astype(jnp.uint32)
        above = jnp.where(v < 15, suffix[jnp.minimum(v + 1, 15)], 0)
        k_rem = k_rem - above
        n_gt = n_gt + above
        prefix = prefix | (v << jnp.uint32(4 * r))
    return prefix, n_gt


def _radix_top_k_1d(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    from nerf_rpn_tpu.ops.nms import _compact_indices

    n = x.shape[0]
    if x.dtype == jnp.bfloat16:
        keys = _monotone_keys_bf16(x)
        t, n_gt = _kth_key(keys, k, rounds=4)
    else:
        keys = _monotone_keys(x)
        t, n_gt = _kth_key(keys, k)
    pad = (-n) % 32
    gt = keys > t
    eq = keys == t
    if pad:
        gt = jnp.pad(gt, (0, pad))
        eq = jnp.pad(eq, (0, pad))
    total = n + pad
    gt_idx = _compact_indices(gt, k)                 # sentinel = total
    eq_idx = _compact_indices(eq, k)
    eq_take = jnp.arange(k, dtype=jnp.int32) < (k - n_gt)
    cand_idx = jnp.concatenate([gt_idx, eq_idx])
    cand_ok = jnp.concatenate([gt_idx < total, eq_take & (eq_idx < total)])
    safe = jnp.minimum(cand_idx, n - 1)
    # rank by the monotone KEYS (invalid slots -> uint32 0 = below every
    # valid key, -inf included), biased into int32 for lax.top_k; exactly k
    # candidates are valid by construction, so all selections are real
    cand_keys = jnp.where(cand_ok, keys[safe], jnp.uint32(0))
    ranks = jax.lax.bitcast_convert_type(
        cand_keys ^ jnp.uint32(0x80000000), jnp.int32)
    _, pos = jax.lax.top_k(ranks, k)
    idx = cand_idx[pos]
    return x[jnp.minimum(idx, n - 1)], idx.astype(jnp.int32)


def safe_top_k(x: jax.Array, k: int, chunk: int = _CHUNK):
    """top_k over the last axis; identical results to ``lax.top_k``
    (including lowest-index-first tie order).

    x: (..., N) -> (values (..., k), indices (..., k)).  N <= ``chunk``
    dispatches to ``lax.top_k`` directly; larger N takes the exact radix
    select above.
    """
    n = x.shape[-1]
    if n <= chunk or n <= k:
        return jax.lax.top_k(x, min(k, n))
    batch = x.shape[:-1]
    flat = x.reshape(-1, n)
    if flat.shape[0] == 1:
        vals, idx = _radix_top_k_1d(flat[0], k)
        vals, idx = vals[None], idx[None]
    else:
        vals, idx = jax.vmap(lambda row: _radix_top_k_1d(row, k))(flat)
    return vals.reshape(*batch, k), idx.reshape(*batch, k)
