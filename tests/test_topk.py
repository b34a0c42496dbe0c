"""safe_top_k must equal lax.top_k exactly — values AND tie order.

Small N dispatches to lax.top_k directly; N > chunk takes the radix-select
path (``ops/topk._radix_top_k_1d``), whose exactness (including the
lowest-index-first tie order) these tests pin down.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.topk import safe_top_k


def _assert_same(x, k, chunk):
    v1, i1 = jax.lax.top_k(x, min(k, x.shape[-1]))
    v2, i2 = safe_top_k(x, k, chunk=chunk)
    np.testing.assert_array_equal(
        np.asarray(v1, np.float32), np.asarray(v2, np.float32))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_small_passthrough():
    x = jnp.asarray([[3.0, 1.0, 2.0, 5.0]])
    vals, idx = safe_top_k(x, 2)
    assert np.asarray(vals).tolist() == [[5.0, 3.0]]
    assert np.asarray(idx).tolist() == [[3, 0]]


def test_radix_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 5000)).astype(np.float32))
    for k in (1, 7, 100):
        _assert_same(x, k, chunk=512)


def test_k_exceeds_chunk(rng):
    x = jnp.asarray(rng.normal(size=(1, 3000)).astype(np.float32))
    _assert_same(x, 700, chunk=512)


def test_neg_inf_padding(rng):
    x = np.full((1, 4000), -np.inf, np.float32)
    x[0, [5, 77, 3999]] = [3.0, 2.0, 1.0]
    vals, idx = safe_top_k(jnp.asarray(x), 5, chunk=512)
    np.testing.assert_array_equal(np.asarray(vals)[0, :3], [3.0, 2.0, 1.0])
    assert np.asarray(idx)[0, :3].tolist() == [5, 77, 3999]
    # ties at -inf resolve lowest-index-first, like lax.top_k
    assert np.asarray(idx)[0, 3:].tolist() == [0, 1]


def test_radix_heavy_ties(rng):
    x = rng.normal(size=(1, 20000)).astype(np.float32)
    x = np.round(x * 10) / 10  # few distinct values -> many exact ties
    _assert_same(jnp.asarray(x), 300, chunk=1024)


def test_radix_all_equal():
    x = jnp.zeros((1, 8192), jnp.float32)
    _assert_same(x, 100, chunk=1024)


def test_radix_all_negative(rng):
    x = jnp.asarray(-np.abs(rng.normal(size=(1, 9000))).astype(np.float32))
    _assert_same(x, 50, chunk=1024)


def test_radix_bf16_batched(rng):
    x = jnp.asarray(rng.normal(size=(3, 7000)), jnp.bfloat16)
    _assert_same(x, 64, chunk=1024)


def test_radix_bench_shape(rng):
    # level-0 of the bench workload: ~1.27M anchors, k = 2500
    x = jnp.asarray(rng.normal(size=(1, 200_000)).astype(np.float32))
    _assert_same(x, 2500, chunk=131072)


def test_radix_bf16_fast_path(rng):
    """bf16 inputs take the 4-round 16-bit key descent; results must still
    equal lax.top_k on the same bf16 values — values AND tie order (bf16
    quantisation makes exact ties common, exercising the eq-compaction)."""
    x = jnp.asarray(rng.normal(size=(2, 6000)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    for k in (1, 7, 150):
        _assert_same(x, k, chunk=512)


def test_radix_bf16_neg_inf_and_ties(rng):
    x = np.full((1, 5000), -np.inf, np.float32)
    x[0, [11, 222, 4999]] = [3.0, 2.0, 1.0]
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    vals, idx = safe_top_k(xb, 5, chunk=512)
    np.testing.assert_array_equal(
        np.asarray(vals, np.float32)[0, :3], [3.0, 2.0, 1.0])
    assert np.asarray(idx)[0, :3].tolist() == [11, 222, 4999]
    assert np.asarray(idx)[0, 3:].tolist() == [0, 1]
