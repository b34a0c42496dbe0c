"""Custom-VJP flash window attention vs the jnp train path (interpret).

Checks forward parity AND gradients (dqkv, dbias) against jax.grad of the
reference — the backward kernel recomputes the softmax in VMEM, so both
seams (recompute exactness, dbias accumulation across grid steps) are
covered.  Mask cotangent is defined as zeros (the shift mask is built
from window geometry, not parameters).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_rpn_tpu.ops.window_attention import (
    flash_window_attention,
    flash_window_attention_reference,
)


def _setup(w=10, n=16, heads=2, d=8, with_mask=True, seed=0,
           dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    c = heads * d
    qkv = jnp.asarray(rng.standard_normal((w, n, 3 * c)), dtype)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1,
                       jnp.float32)
    mask = None
    if with_mask:
        m = np.zeros((w, n, n), np.float32)
        m[:, :, n // 2:] = np.where(
            rng.standard_normal((w, n, n // 2)) > 0.5, -100.0, 0.0)
        mask = jnp.asarray(m, dtype)
    return qkv, bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
def test_flash_forward_matches_reference(with_mask):
    qkv, bias, mask = _setup(with_mask=with_mask)
    ref = flash_window_attention_reference(qkv, bias, mask, 2)
    got = flash_window_attention(qkv, bias, mask, 2, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_flash_grads_match_reference(with_mask):
    qkv, bias, mask = _setup(with_mask=with_mask)
    cot = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (qkv.shape[0], qkv.shape[1], qkv.shape[2] // 3)), jnp.float32)

    def loss_ref(qkv, bias):
        return jnp.sum(
            flash_window_attention_reference(qkv, bias, mask, 2) * cot)

    def loss_ker(qkv, bias):
        return jnp.sum(
            flash_window_attention(qkv, bias, mask, 2, 4, True) * cot)

    gq_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    gq_ker, gb_ker = jax.grad(loss_ker, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_ker), np.asarray(gq_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb_ker), np.asarray(gb_ref),
                               rtol=2e-4, atol=2e-4)


def test_pick_group_prefers_divisible():
    from nerf_rpn_tpu.ops.window_attention import _pick_group

    assert _pick_group(1521, 16) == 13   # batch-1 eval stages, 208^3
    assert _pick_group(6084, 16) == 26   # batch-4 eval stages
    assert _pick_group(2000, 16) == 16   # already divisible: keep
    assert _pick_group(250, 16) == 25    # train stage-1
    assert _pick_group(7, 4) == 4        # < 8 windows: fall back to pad


def test_pick_bwd_group_caps_scoped_vmem():
    from nerf_rpn_tpu.ops.window_attention import _pick_bwd_group

    # the batch-4 stage-1 AOT OOM case: G=25, H=6 -> 18.55 MiB scoped;
    # the cap (G*H <= 100) must pick the largest divisor under it
    assert _pick_bwd_group(500, 16, 6) == 10
    assert _pick_bwd_group(250, 16, 6) == 10   # train batch-2 stage-1
    # H=3 (stage 0) keeps the uncapped divisor choice
    assert _pick_bwd_group(2000, 16, 3) == 16
    assert _pick_bwd_group(1000, 16, 3) == 25
    # no divisor under the cap: fall back to a padded group <= cap
    assert _pick_bwd_group(509, 16, 6) == 16   # 509 prime
    assert _pick_bwd_group(509, 16, 12) == 8


def test_flash_grads_padded_window_count():
    # W=7 with group=4 pads to 8 (no divisor in [8, 32]): padded windows
    # must not leak into dbias (their dout is zero) and dqkv must slice
    # back to W
    qkv, bias, mask = _setup(w=7, with_mask=False)

    def loss(qkv, bias):
        return jnp.sum(flash_window_attention(qkv, bias, None, 2, 4, True))

    gq, gb = jax.grad(loss, argnums=(0, 1))(qkv, bias)

    def loss_ref(qkv, bias):
        return jnp.sum(
            flash_window_attention_reference(qkv, bias, None, 2))

    gq_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                               rtol=2e-4, atol=2e-4)


def test_flash_bf16_grad_close():
    # bf16 inputs (the train dtype): looser tolerance, checks dtype plumbing
    qkv, bias, mask = _setup(dtype=jnp.bfloat16)

    def loss(qkv, bias):
        return jnp.sum(
            flash_window_attention(qkv, bias, mask, 2, 4, True)
            .astype(jnp.float32))

    def loss_ref(qkv, bias):
        return jnp.sum(
            flash_window_attention_reference(qkv, bias, mask, 2)
            .astype(jnp.float32))

    gq, gb = jax.grad(loss, argnums=(0, 1))(qkv, bias)
    gq_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    assert gq.dtype == jnp.bfloat16 and gb.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gq, np.float32),
                               np.asarray(gq_r, np.float32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                               rtol=0.05, atol=0.05)
