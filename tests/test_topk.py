"""safe_top_k: hierarchical two-stage top-k must equal lax.top_k."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_rpn_tpu.ops.topk import safe_top_k


def test_small_passthrough():
    x = jnp.asarray([[3.0, 1.0, 2.0, 5.0]])
    vals, idx = safe_top_k(x, 2)
    assert np.asarray(vals).tolist() == [[5.0, 3.0]]
    assert np.asarray(idx).tolist() == [[3, 0]]


def test_hierarchical_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 5000)).astype(np.float32))
    for k in (1, 7, 100):
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = safe_top_k(x, k, chunk=512)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        # indices may differ only among exact value ties (none here)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_k_exceeds_chunk(rng):
    x = jnp.asarray(rng.normal(size=(1, 3000)).astype(np.float32))
    v1, _ = jax.lax.top_k(x, 700)
    v2, i2 = safe_top_k(x, 700, chunk=512)
    # values must match as multisets even when k > chunk; since every global
    # top-700 element is in its chunk's top-512... that is NOT guaranteed
    # when k > chunk, so safe_top_k must still be correct by construction:
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_neg_inf_padding(rng):
    x = np.full((1, 4000), -np.inf, np.float32)
    x[0, [5, 77, 3999]] = [3.0, 2.0, 1.0]
    vals, idx = safe_top_k(jnp.asarray(x), 5, chunk=512)
    np.testing.assert_array_equal(np.asarray(vals)[0, :3], [3.0, 2.0, 1.0])
    assert np.asarray(idx)[0, :3].tolist() == [5, 77, 3999]
