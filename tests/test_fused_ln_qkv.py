"""Fused LN+partition+qkv Pallas kernel vs the jnp reference (interpret).

The reference itself is asserted against the exact model path
(flax LayerNorm -> models.swin._window_partition -> Dense) so the kernel
contract is anchored to what SwinBlock actually computes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_rpn_tpu.ops.fused_ln_qkv import (
    ln_partition_qkv,
    ln_partition_qkv_reference,
)

WINDOW = (4, 4, 4)


def _rand(shape, rng, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(dtype))


def test_reference_matches_model_chain():
    import flax.linen as nn
    from nerf_rpn_tpu.models.swin import _window_partition

    rng = np.random.default_rng(0)
    c = 32
    x = _rand((2, 8, 8, 4, c), rng).astype(jnp.bfloat16)
    s, t = _rand(c, rng), _rand(c, rng)
    w, b = _rand((c, 3 * c), rng) * c ** -0.5, _rand(3 * c, rng)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    h = ln.apply({"params": {"scale": s, "bias": t}}, x)
    h = _window_partition(h, WINDOW)
    dense = nn.Dense(3 * c, dtype=jnp.bfloat16)
    model = dense.apply(
        {"params": {"kernel": w, "bias": b}}, h).astype(np.float32)

    ref = ln_partition_qkv_reference(
        x, s, t, w.astype(jnp.bfloat16), b, WINDOW).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(model),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("shape,layout", [
    ((1, 8, 8, 8, 32), "flat"),
    ((2, 8, 4, 12, 32), "flat"),
    ((1, 8, 8, 8, 32), "w8"),
])
def test_kernel_matches_reference_interpret(shape, layout):
    rng = np.random.default_rng(1)
    c = shape[-1]
    x = _rand(shape, rng).astype(jnp.bfloat16)
    s, t = _rand(c, rng), _rand(c, rng)
    w = (_rand((c, 3 * c), rng) * c ** -0.5).astype(jnp.bfloat16)
    b = _rand(3 * c, rng)

    ref = ln_partition_qkv_reference(x, s, t, w, b, WINDOW)
    got = ln_partition_qkv(x, s, t, w, b, WINDOW, out_layout=layout,
                           interpret=True)
    if layout == "w8":
        got = got.reshape(ref.shape)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)
