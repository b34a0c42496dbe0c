"""Parity of the regrouped max pools (ops/pooling.py) vs reduce_window.

Oracles: ``nn.max_pool`` (lax.reduce_window), i.e. the exact forms the
backbones used before — torch MaxPool3d(2, 2, ceil_mode=True) semantics for
the ceil pool (reference ``feature_extractor.py:300``) and
MaxPool3d(3, 2, padding=1) for the stem pool (``feature_extractor.py:64``).
"""

import numpy as np
import pytest

import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.ops.pooling import (
    max_pool_2x2x2,
    max_pool_3x3x3_s2_p1,
    stem_pool,
)


def _rw_ceil_pool(x):
    pads = [(0, s % 2) for s in x.shape[1:4]]
    if any(p[1] for p in pads):
        x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)],
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


def _rw_stem_pool(x):
    return nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                       padding=((1, 1), (1, 1), (1, 1)))


SHAPES = [(1, 8, 8, 8, 4), (2, 7, 9, 6, 3), (1, 13, 10, 11, 5),
          (1, 16, 16, 12, 64)]


@pytest.mark.parametrize("shape", SHAPES)
def test_ceil_pool_parity(rng, shape):
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2x2(x, ceil_mode=True)),
        np.asarray(_rw_ceil_pool(x)))


@pytest.mark.parametrize("shape", SHAPES)
def test_floor_pool_parity(rng, shape):
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    ref = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2x2(x, ceil_mode=False)), np.asarray(ref))


@pytest.mark.parametrize("shape", SHAPES)
def test_stem_pool_parity(shape, rng):
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    got = np.asarray(max_pool_3x3x3_s2_p1(x))
    ref = np.asarray(_rw_stem_pool(x))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_array_equal(got, ref)
    assert np.isfinite(got).all()   # no -inf leaks from the pad


def test_stem_pool_knob(rng, monkeypatch):
    x = jnp.asarray(rng.normal(0, 1, (1, 10, 12, 8, 4)).astype(np.float32))
    monkeypatch.setenv("NERF_RPN_TPU_POOL_RW", "1")
    a = np.asarray(stem_pool(x))
    monkeypatch.setenv("NERF_RPN_TPU_POOL_RW", "0")
    b = np.asarray(stem_pool(x))
    np.testing.assert_array_equal(a, b)
