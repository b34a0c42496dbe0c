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


# ---------------------------------------------------------------------------
# v2: fused-qkv kernel (the one the Swin backbone uses on TPU)
# ---------------------------------------------------------------------------

from nerf_rpn_tpu.ops.window_attention import (  # noqa: E402
    fused_qkv_window_attention,
    fused_qkv_window_attention_reference,
)


@pytest.mark.parametrize("w,h,n,c,group,with_mask", [
    (37, 3, 64, 96, 16, False),   # stage-0 shape, padding path
    (24, 6, 64, 192, 8, True),    # stage-1 shape, shifted
    (48, 12, 64, 384, 16, True),  # stage-2 shape
])
def test_fused_qkv_matches_reference(w, h, n, c, group, with_mask):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (w, n, 3 * c)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.5, (h, n, n)), jnp.float32)
    mask = None
    if with_mask:
        m = np.where(rng.random((w, n, n)) < 0.2, -100.0, 0.0)
        mask = jnp.asarray(m, jnp.bfloat16)
    ref = fused_qkv_window_attention_reference(qkv, bias, mask, h)
    out = fused_qkv_window_attention(qkv, bias, mask, h, group=group,
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2)


def test_swin_attention_uses_jnp_path_off_tpu():
    """On CPU the module must not route through the Pallas kernel."""
    from nerf_rpn_tpu.models.swin import ShiftedWindowAttention3D

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8, 32)), jnp.float32)
    mod = ShiftedWindowAttention3D(32, (4, 4, 4), (2, 2, 2), num_heads=2,
                                   fused_min_windows=1)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)  # would crash if the TPU kernel were taken
    assert y.shape == x.shape and jax.default_backend() == "cpu"
