"""Fused Swin-MLP Pallas kernel: parity vs the flax module chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.ops.fused_mlp import (
    fused_mlp_block,
    fused_mlp_block_reference,
)


class _FlaxMLP(nn.Module):
    """The exact SwinBlock MLP half (models/swin.py)."""

    dim: int
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


def _setup(t, c, hidden, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (t, c)).astype(np.float32)).astype(dtype)
    mod = _FlaxMLP(c, hidden, dtype)
    params = mod.init(jax.random.PRNGKey(seed), x)["params"]
    # non-trivial LN affine + biases
    params = jax.tree.map(
        lambda p: p + jnp.asarray(
            np.random.default_rng(seed + 1).normal(0, 0.05, p.shape),
            p.dtype),
        params)
    args = (x, params["norm2"]["scale"], params["norm2"]["bias"],
            params["mlp_fc1"]["kernel"], params["mlp_fc1"]["bias"],
            params["mlp_fc2"]["kernel"], params["mlp_fc2"]["bias"])
    return mod, params, x, args


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("t,c,hidden", [(512, 96, 384), (300, 192, 768)])
def test_reference_matches_flax_chain(t, c, hidden, dtype):
    mod, params, x, args = _setup(t, c, hidden, dtype)
    want = mod.apply({"params": params}, x)
    got = fused_mlp_block_reference(*args)
    # bf16 rounding-boundary jitter flips the odd element by 1 ULP
    tol = 2e-6 if dtype == jnp.float32 else None
    a, b = np.asarray(got, np.float32), np.asarray(want, np.float32)
    if tol is not None:
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol)
    else:
        bad = np.abs(a - b) > 0.02 + 0.02 * np.abs(b)
        assert bad.mean() < 1e-3, bad.mean()
        np.testing.assert_allclose(a, b, rtol=0.15, atol=0.08)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("t,c,hidden,tile", [
    (512, 96, 384, 256),
    (700, 96, 384, 256),     # T % tile != 0: padding path
    (512, 192, 768, 512),    # T == tile
])
def test_kernel_matches_reference_interpret(t, c, hidden, tile, dtype):
    _, _, _, args = _setup(t, c, hidden, dtype, seed=2)
    want = fused_mlp_block_reference(*args)
    got = fused_mlp_block(*args, tile=tile, interpret=True)
    assert got.dtype == want.dtype and got.shape == want.shape
    # same math, different dot accumulation order -> float noise only
    # (bf16: the odd element flips by 1 ULP at a rounding boundary)
    a, b = np.asarray(got, np.float32), np.asarray(want, np.float32)
    if dtype == jnp.float32:
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    else:
        bad = np.abs(a - b) > 0.02 + 0.02 * np.abs(b)
        assert bad.mean() < 1e-3, bad.mean()
        np.testing.assert_allclose(a, b, rtol=0.15, atol=0.08)


def test_kernel_padding_rows_do_not_leak():
    """Padded token rows must not affect real rows (LN is per-token)."""
    _, _, _, args = _setup(130, 96, 384, jnp.float32, seed=3)
    full = fused_mlp_block(*args, tile=128, interpret=True)
    head = fused_mlp_block(args[0][:128], *args[1:], tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(full[:128]), np.asarray(head))
