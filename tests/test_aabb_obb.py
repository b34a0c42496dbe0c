"""AABB box algebra + OBB conversion tests."""

import numpy as np
import jax.numpy as jnp

from nerf_rpn_tpu.ops.aabb import (
    box_volume,
    box_iou_aabb,
    pairwise_iou_aabb,
    pairwise_iou_aabb_chunked,
    clip_boxes_to_grid,
    small_box_mask,
    obb_center_valid_mask,
)
from nerf_rpn_tpu.ops.obb import (
    regular_obb,
    rectpoly2obb,
    obb2poly,
    obb2poly_3d,
    obb2hbb_3d,
    obb2points_3d,
)


def brute_iou(b1, b2):
    lo = np.maximum(b1[:3], b2[:3])
    hi = np.minimum(b1[3:], b2[3:])
    inter = np.prod(np.clip(hi - lo, 0, None))
    v1 = np.prod(b1[3:] - b1[:3])
    v2 = np.prod(b2[3:] - b2[:3])
    return inter / (v1 + v2 - inter)


def random_boxes(rng, n):
    lo = rng.uniform(0, 50, (n, 3))
    sz = rng.uniform(1, 30, (n, 3))
    return np.concatenate([lo, lo + sz], -1).astype(np.float32)


def test_volume():
    b = jnp.asarray([[0, 0, 0, 2, 3, 4]], jnp.float32)
    np.testing.assert_allclose(np.asarray(box_volume(b)), [24.0])


def test_pairwise_iou_vs_brute(rng):
    b1 = random_boxes(rng, 16)
    b2 = random_boxes(rng, 8)
    mat = np.asarray(pairwise_iou_aabb(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(16):
        for j in range(8):
            np.testing.assert_allclose(mat[i, j], brute_iou(b1[i], b2[j]), rtol=1e-5)


def test_chunked_matches_full(rng):
    b1 = random_boxes(rng, 32)
    b2 = random_boxes(rng, 8)
    full = np.asarray(pairwise_iou_aabb(jnp.asarray(b1), jnp.asarray(b2)))
    chunked = np.asarray(pairwise_iou_aabb_chunked(jnp.asarray(b1), jnp.asarray(b2), chunk=8))
    np.testing.assert_allclose(full, chunked, rtol=1e-6)


def test_elementwise_iou():
    b1 = jnp.asarray([[0, 0, 0, 2, 2, 2]], jnp.float32)
    b2 = jnp.asarray([[1, 0, 0, 3, 2, 2]], jnp.float32)
    np.testing.assert_allclose(np.asarray(box_iou_aabb(b1, b2)), [4 / 12], rtol=1e-6)


def test_clip_and_masks():
    boxes = jnp.asarray([[-1, -1, -1, 5, 5, 5], [1, 1, 1, 2, 2, 2]], jnp.float32)
    grid = jnp.asarray([4.0, 4.0, 4.0])
    clipped = np.asarray(clip_boxes_to_grid(boxes, grid))
    np.testing.assert_allclose(clipped[0], [0, 0, 0, 4, 4, 4])
    np.testing.assert_allclose(clipped[1], [1, 1, 1, 2, 2, 2])

    keep = np.asarray(small_box_mask(boxes, 2.0))
    assert keep.tolist() == [True, False]

    obbs = jnp.asarray([[2, 2, 2, 1, 1, 1, 0.0], [9, 2, 2, 1, 1, 1, 0.0]], jnp.float32)
    valid = np.asarray(obb_center_valid_mask(obbs, grid))
    assert valid.tolist() == [True, False]


def test_obb_poly_roundtrip(rng):
    """obb -> poly -> obb must be the identity for canonical obbs."""
    n = 32
    obbs = np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-5, 5, n),
            rng.uniform(2, 4, n),   # w
            rng.uniform(0.5, 2, n), # h < w so already canonical
            rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, n),
        ],
        -1,
    ).astype(np.float32)
    polys = obb2poly(jnp.asarray(obbs))
    rec = np.asarray(rectpoly2obb(polys))
    np.testing.assert_allclose(rec[:, :4], obbs[:, :4], atol=1e-3)
    # theta may differ by pi (same rectangle); compare mod pi
    dt = np.abs((rec[:, 4] - obbs[:, 4] + np.pi / 2) % np.pi - np.pi / 2)
    assert np.all(dt < 1e-3)


def test_regular_obb():
    obb = jnp.asarray([[0, 0, 1.0, 2.0, 0.0]])  # h > w: swap + rotate 90deg
    reg = np.asarray(regular_obb(obb))
    np.testing.assert_allclose(reg[0, 2:4], [2.0, 1.0])
    np.testing.assert_allclose(abs(reg[0, 4]), np.pi / 2, atol=1e-6)


def test_obb2hbb_3d():
    # 2x1x1 box rotated 90deg: enclosing AABB swaps x/y extent
    obb = jnp.asarray([[0, 0, 0, 2, 1, 1, np.pi / 2]], jnp.float32)
    hbb = np.asarray(obb2hbb_3d(obb))[0]
    np.testing.assert_allclose(hbb, [-0.5, -1, -0.5, 0.5, 1, 0.5], atol=1e-6)


def test_obb2poly_3d_shape_and_extent():
    obb = jnp.asarray([[1, 2, 3, 2, 2, 4, 0.0]], jnp.float32)
    poly = np.asarray(obb2poly_3d(obb)).reshape(8, 3)
    assert poly[:4, 2].min() == poly[:4, 2].max() == 1.0  # lower z = 3 - 2
    assert poly[4:, 2].min() == poly[4:, 2].max() == 5.0
    np.testing.assert_allclose(sorted(poly[:4, 0]), [0, 0, 2, 2])


def test_obb2points_3d():
    obb = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    pts = np.asarray(obb2points_3d(obb))[0]
    # vec = [w/2*cos - l/2*sin, w/2*sin + l/2*cos, h/2] = [1, 1, 1]
    np.testing.assert_allclose(pts[0], [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(pts[1], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(pts.mean(0), [0, 0, 0], atol=1e-6)
