"""Pallas fused window attention vs the jnp reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_rpn_tpu.ops.window_attention import (
    fused_window_attention,
    window_attention_reference,
)


@pytest.mark.parametrize("w,h,n,d,p,tile", [
    (13, 3, 64, 32, 4, 4),
    (8, 2, 64, 16, 1, 8),   # single (zero) mask pattern
    (10, 4, 64, 32, 8, 4),  # W not a multiple of tile -> padding path
])
def test_fused_matches_reference(w, h, n, d, p, tile):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(w, h, n, d)).astype(np.float32))
        for _ in range(3)
    )
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32) * 0.1)
    masks = jnp.asarray(
        np.where(rng.random((p, n, n)) < 0.2, -100.0, 0.0).astype(np.float32)
    )
    pids = jnp.asarray(rng.integers(0, p, w).astype(np.int32))
    ref = window_attention_reference(q, k, v, bias, masks, pids)
    out = fused_window_attention(q, k, v, bias, masks, pids, tile=tile,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_reference_softmax_normalised():
    rng = np.random.default_rng(1)
    q = k = v = jnp.asarray(rng.normal(size=(2, 2, 64, 16)).astype(np.float32))
    bias = jnp.zeros((2, 64, 64))
    masks = jnp.zeros((1, 64, 64))
    out = window_attention_reference(q, k, v, bias, masks, jnp.zeros(2, jnp.int32))
    # attention of identical q=k=v stays in the convex hull of v rows
    assert float(jnp.abs(out).max()) <= float(jnp.abs(v).max()) + 1e-4
