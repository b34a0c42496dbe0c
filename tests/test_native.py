"""Native C++ input-pipeline kernels: parity vs the numpy implementations."""

import time

import numpy as np
import pytest

from nerf_rpn_tpu import native
from nerf_rpn_tpu.data.augment import _trilinear_sample
from nerf_rpn_tpu.data.datasets import density_to_alpha_ngp, density_to_alpha_relu

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain not available"
)


def _numpy_rotate_scale(volume, angle, scale):
    res = volume.shape[:3]
    xform = np.array(
        [[np.cos(angle), -np.sin(angle), 0],
         [np.sin(angle), np.cos(angle), 0],
         [0, 0, 1]], np.float32) * scale
    axes = [np.linspace(-1, 1, r, dtype=np.float32) * r / 2 for r in res]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1) @ xform.T
    src = np.empty_like(grid)
    for a in range(3):
        src[..., a] = (grid[..., a] / (res[a] / 2) + 1) / 2 * (res[a] - 1)
    return _trilinear_sample(volume, src)


@pytest.mark.parametrize("angle,scale", [(0.0, 1.0), (0.15, 0.95), (-0.1, 1.08)])
def test_rotate_scale_parity(angle, scale):
    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (12, 10, 8, 4)).astype(np.float32)
    ref = _numpy_rotate_scale(vol, angle, scale)
    out = native.rotate_scale_resample(vol, angle, scale)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_density_alpha_parity():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(6, 6, 6, 4)).astype(np.float32)
    ref = vol.copy()
    ref[..., -1] = density_to_alpha_ngp(ref[..., -1])
    got = np.ascontiguousarray(vol.copy())
    assert native.density_to_alpha_inplace(got)
    np.testing.assert_allclose(got, ref, atol=1e-6)

    ref2 = vol.copy()
    ref2[..., -1] = density_to_alpha_relu(ref2[..., -1])
    got2 = np.ascontiguousarray(vol.copy())
    assert native.density_to_alpha_inplace(got2, relu=True)
    np.testing.assert_allclose(got2, ref2, atol=1e-6)


def test_native_faster_than_numpy():
    rng = np.random.default_rng(2)
    vol = rng.uniform(0, 1, (64, 64, 64, 4)).astype(np.float32)
    t0 = time.perf_counter()
    _numpy_rotate_scale(vol, 0.1, 1.05)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    native.rotate_scale_resample(vol, 0.1, 1.05)
    t_cpp = time.perf_counter() - t0
    # informational floor: native should not be slower (usually 3-10x faster)
    assert t_cpp < t_np * 1.5, (t_cpp, t_np)
