"""Coder round-trip and known-value tests."""

import numpy as np
import jax.numpy as jnp

from nerf_rpn_tpu.ops.coders import (
    encode_aabb,
    decode_aabb,
    encode_midpoint_offset,
    decode_midpoint_offset,
    encode_rotated,
    decode_rotated,
)
from nerf_rpn_tpu.ops.obb import obb2hbb_3d


def random_aabbs(rng, n):
    lo = rng.uniform(0, 50, (n, 3))
    sz = rng.uniform(2, 30, (n, 3))
    return np.concatenate([lo, lo + sz], -1).astype(np.float32)


def test_aabb_roundtrip(rng):
    gt = random_aabbs(rng, 64)
    anchors = random_aabbs(rng, 64)
    deltas = encode_aabb(jnp.asarray(gt), jnp.asarray(anchors))
    rec = np.asarray(decode_aabb(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, gt, rtol=1e-4, atol=1e-3)


def test_aabb_zero_deltas_identity(rng):
    anchors = random_aabbs(rng, 8)
    rec = np.asarray(decode_aabb(jnp.zeros((8, 6)), jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, anchors, rtol=1e-5)


def test_aabb_exp_clamp():
    anchors = jnp.asarray([[0, 0, 0, 1, 1, 1]], jnp.float32)
    deltas = jnp.asarray([[0, 0, 0, 50, 50, 50]], jnp.float32)
    rec = np.asarray(decode_aabb(deltas, anchors))
    size = rec[0, 3:] - rec[0, :3]
    np.testing.assert_allclose(size, 2000.0, rtol=1e-3)


def random_obbs(rng, n, canonical=True):
    obbs = np.zeros((n, 7), np.float32)
    obbs[:, :3] = rng.uniform(10, 40, (n, 3))
    w = rng.uniform(6, 12, n)
    h = rng.uniform(2, 5, n)  # strictly < w so the obb is canonical
    obbs[:, 3] = np.maximum(w, h) if canonical else w
    obbs[:, 4] = np.minimum(w, h) if canonical else h
    obbs[:, 5] = rng.uniform(2, 10, n)
    # |theta| in [0.1, pi/2 - 0.1]: outside this band the midpoint-offset
    # representation is inherently ambiguous (two corners fall within the
    # coder's 0.1 corner-on-edge tolerance — same lossy regime as the
    # reference coder)
    mag = rng.uniform(0.1, np.pi / 2 - 0.1, n)
    obbs[:, 6] = mag * rng.choice([-1.0, 1.0], n)
    return obbs


def test_midpoint_offset_roundtrip(rng):
    """encode(gt, anchor) -> decode must reproduce the gt OBB (mod theta+-pi/2
    symmetry handled by canonical gt)."""
    gt = random_obbs(rng, 64)
    # anchors: enclosing AABBs jittered a bit
    anchors = np.array(obb2hbb_3d(jnp.asarray(gt)))
    anchors[:, :3] -= rng.uniform(0.5, 1.5, (64, 3))
    anchors[:, 3:] += rng.uniform(0.5, 1.5, (64, 3))
    deltas = encode_midpoint_offset(jnp.asarray(gt), jnp.asarray(anchors))
    rec = np.asarray(decode_midpoint_offset(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec[:, :3], gt[:, :3], atol=0.02)
    np.testing.assert_allclose(rec[:, 3:6], gt[:, 3:6], rtol=0.02, atol=0.05)
    dt = np.abs((rec[:, 6] - gt[:, 6] + np.pi / 2) % np.pi - np.pi / 2)
    assert np.all(dt < 0.02), dt.max()


def test_midpoint_offset_axis_aligned_box():
    """theta=0 gt: deltas vs its own enclosing anchor are ctr/size exact."""
    gt = jnp.asarray([[10, 10, 10, 4, 2, 6, 0.0]], jnp.float32)
    anchor = jnp.asarray([[8, 9, 7, 12, 11, 13]], jnp.float32)
    deltas = np.asarray(encode_midpoint_offset(gt, anchor))
    np.testing.assert_allclose(deltas[0, :3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(deltas[0, 3:6], 0.0, atol=1e-6)
    rec = np.asarray(decode_midpoint_offset(jnp.asarray(deltas), anchor))
    np.testing.assert_allclose(rec[0, :6], np.asarray(gt)[0, :6], atol=1e-3)


def test_rotated_roundtrip(rng):
    gt = random_obbs(rng, 32)
    rois = gt.copy()
    rois[:, :3] += rng.uniform(-1, 1, (32, 3))
    rois[:, 3:6] *= rng.uniform(0.8, 1.2, (32, 3))
    rois[:, 6] += rng.uniform(-0.2, 0.2, 32)
    deltas = encode_rotated(jnp.asarray(gt), jnp.asarray(rois))
    rec = np.asarray(decode_rotated(deltas, jnp.asarray(rois)))
    np.testing.assert_allclose(rec[:, :6], gt[:, :6], rtol=1e-4, atol=1e-3)
    dt = np.abs((rec[:, 6] - gt[:, 6]) % np.pi)
    dt = np.minimum(dt, np.pi - dt)
    assert np.all(dt < 1e-4)


def test_rotated_zero_deltas_identity(rng):
    rois = random_obbs(rng, 8)
    rec = np.asarray(decode_rotated(jnp.zeros((8, 7)), jnp.asarray(rois)))
    np.testing.assert_allclose(rec[:, :6], rois[:, :6], rtol=1e-5)


def test_midpoint_coder_matches_reference_torch():
    """Cross-implementation diff vs the reference coder (r5 OBB root-cause
    evidence): encode must be bit-identical to ``rbbox2delta_sp`` and
    decode identical to ``delta_sp2bbox`` up to the geometrically-null
    theta +- pi representative (``midpoint_offset_coder.py:50-223``),
    including near-degenerate thetas (0, +-pi/4, pi/2)."""
    import sys
    import types

    import pytest

    torch = pytest.importorskip("torch")
    fake_ext = types.ModuleType("sort_vertices")
    fake_ext.sort_vertices_forward = lambda *a, **k: None
    sys.modules["sort_vertices"] = fake_ext
    sys.path.insert(0, "/root/reference/nerf_rpn")
    try:
        from model.coder.midpoint_offset_coder import (
            delta_sp2bbox,
            rbbox2delta_sp,
        )

        rng = np.random.default_rng(0)
        n = 256
        ctr = rng.uniform(8, 24, (n, 3))
        size = rng.uniform(4, 16, (n, 3))
        anchors = np.concatenate(
            [ctr - size / 2, ctr + size / 2], -1).astype(np.float32)
        theta = np.concatenate([
            rng.uniform(-np.pi / 2, np.pi / 2, n - 64),
            rng.uniform(-1e-3, 1e-3, 16),
            np.full(16, np.pi / 4) + rng.uniform(-1e-3, 1e-3, 16),
            np.full(16, -np.pi / 4) + rng.uniform(-1e-3, 1e-3, 16),
            np.full(16, np.pi / 2 - 1e-4),
        ])
        gctr = ctr + rng.uniform(-2, 2, (n, 3))
        gsz = rng.uniform(4, 16, (n, 3))
        gt = np.concatenate([gctr, gsz, theta[:, None]], -1).astype(np.float32)

        d_ours = np.asarray(
            encode_midpoint_offset(jnp.asarray(gt), jnp.asarray(anchors)))
        d_ref = rbbox2delta_sp(torch.tensor(anchors), torch.tensor(gt)).numpy()
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-4, atol=1e-5)

        b_ref = delta_sp2bbox(
            torch.tensor(anchors), torch.tensor(d_ref)).numpy().reshape(n, 7)
        b_ours = np.asarray(
            decode_midpoint_offset(jnp.asarray(d_ref), jnp.asarray(anchors)))
        diff = np.abs(b_ours - b_ref)
        # theta may differ by exactly pi (same rectangle)
        diff[:, 6] = np.minimum(diff[:, 6], np.abs(diff[:, 6] - np.pi))
        assert diff.max() < 2e-4, diff.max(0)
    finally:
        sys.modules.pop("sort_vertices", None)
        sys.path.remove("/root/reference/nerf_rpn")
        for name in [m for m in sys.modules
                     if m == "model" or m.startswith("model.")]:
            del sys.modules[name]
