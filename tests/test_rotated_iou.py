"""Rotated IoU correctness: brute-force Monte-Carlo oracles + analytic cases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_rpn_tpu.ops.rotated_iou import (
    box2corners,
    oriented_box_intersection_area,
    iou_rotated_2d,
    iou_rotated_3d,
    giou_rotated_3d,
    diou_rotated_3d,
    pairwise_iou_rotated_3d,
    enclosing_box,
)


def mc_iou_2d(box1, box2, n=200_000, seed=0):
    """Monte-Carlo 2D rotated IoU oracle."""
    rng = np.random.default_rng(seed)

    def inside(pts, box):
        x, y, w, h, t = box
        c, s = np.cos(t), np.sin(t)
        dx = pts[:, 0] - x
        dy = pts[:, 1] - y
        lx = dx * c + dy * s
        ly = -dx * s + dy * c
        return (np.abs(lx) <= w / 2) & (np.abs(ly) <= h / 2)

    all_boxes = np.stack([box1, box2])
    r = max(np.hypot(b[2], b[3]) / 2 for b in all_boxes)
    lo = all_boxes[:, :2].min(0) - r
    hi = all_boxes[:, :2].max(0) + r
    pts = rng.uniform(lo, hi, size=(n, 2))
    in1 = inside(pts, box1)
    in2 = inside(pts, box2)
    area = np.prod(hi - lo)
    inter = (in1 & in2).mean() * area
    union = box1[2] * box1[3] + box2[2] * box2[3] - inter
    return inter / union


@pytest.mark.parametrize(
    "box1,box2",
    [
        ([0, 0, 2, 2, 0.0], [0, 0, 2, 2, 0.0]),          # identical
        ([0, 0, 2, 2, 0.0], [0, 0, 2, 2, np.pi / 4]),    # 45-deg star
        ([0, 0, 2, 3, 0.3], [1, 1, 2, 2, -0.7]),         # generic overlap
        ([0, 0, 2, 2, 0.0], [5, 5, 2, 2, 0.3]),          # disjoint
        ([0, 0, 4, 4, 0.0], [0.2, 0.1, 1, 1, 0.5]),      # full containment
        ([0, 0, 2, 1, 1.2], [0.5, -0.2, 1.5, 2.5, 2.0]), # big angles
    ],
)
def test_iou2d_vs_monte_carlo(box1, box2):
    b1 = jnp.asarray(box1, jnp.float32)
    b2 = jnp.asarray(box2, jnp.float32)
    iou, _, _, _ = iou_rotated_2d(b1, b2)
    expected = mc_iou_2d(np.array(box1, float), np.array(box2, float))
    assert abs(float(iou) - expected) < 0.01, (float(iou), expected)


def test_identical_boxes_exact():
    b = jnp.asarray([1.0, 2.0, 3.0, 4.0, 0.7])
    iou, _, _, _ = iou_rotated_2d(b, b)
    np.testing.assert_allclose(float(iou), 1.0, atol=1e-5)


def test_axis_aligned_matches_aabb():
    """theta=0 boxes reduce to AABB IoU."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        c1 = rng.uniform(-2, 2, 2)
        c2 = rng.uniform(-2, 2, 2)
        s1 = rng.uniform(0.5, 3, 2)
        s2 = rng.uniform(0.5, 3, 2)
        box1 = np.concatenate([c1, s1, [0.0]])
        box2 = np.concatenate([c2, s2, [0.0]])
        lo = np.maximum(c1 - s1 / 2, c2 - s2 / 2)
        hi = np.minimum(c1 + s1 / 2, c2 + s2 / 2)
        inter = np.prod(np.clip(hi - lo, 0, None))
        union = np.prod(s1) + np.prod(s2) - inter
        iou, _, _, _ = iou_rotated_2d(
            jnp.asarray(box1, jnp.float32), jnp.asarray(box2, jnp.float32)
        )
        np.testing.assert_allclose(float(iou), inter / union, atol=2e-5)


def test_iou3d_known_value():
    """AABB-aligned 3D case with exact answer."""
    b1 = jnp.asarray([0, 0, 0, 2, 2, 2, 0.0], jnp.float32)
    b2 = jnp.asarray([1, 0, 0, 2, 2, 2, 0.0], jnp.float32)
    # overlap: 1*2*2 = 4, union = 8 + 8 - 4 = 12
    np.testing.assert_allclose(float(iou_rotated_3d(b1, b2)), 4 / 12, atol=1e-5)


def test_iou3d_identical_gives_one():
    b = jnp.asarray([0, 0, 0, 3, 3, 3, 0.4], jnp.float32)
    np.testing.assert_allclose(float(iou_rotated_3d(b, b)), 1.0, atol=1e-5)


def test_giou3d_identical_is_zero_loss():
    """Reference __main__ smoke check: giou(box, box) -> loss 0, iou 1."""
    b = jnp.asarray([[0, 0, 0, 3, 3, 3, 0.0]], jnp.float32)
    loss, giou, iou = giou_rotated_3d(b, b)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-5)


def test_batched_matches_scalar():
    rng = np.random.default_rng(2)
    boxes1 = rng.uniform(-1, 1, (8, 7)).astype(np.float32)
    boxes2 = rng.uniform(-1, 1, (8, 7)).astype(np.float32)
    boxes1[:, 3:6] = rng.uniform(0.5, 2, (8, 3))
    boxes2[:, 3:6] = rng.uniform(0.5, 2, (8, 3))
    batched = np.asarray(iou_rotated_3d(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    for i in range(8):
        single = float(iou_rotated_3d(jnp.asarray(boxes1[i]), jnp.asarray(boxes2[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_pairwise_matches_elementwise():
    rng = np.random.default_rng(3)
    b1 = rng.uniform(-1, 1, (5, 7)).astype(np.float32)
    b2 = rng.uniform(-1, 1, (4, 7)).astype(np.float32)
    b1[:, 3:6] = rng.uniform(0.5, 2, (5, 3))
    b2[:, 3:6] = rng.uniform(0.5, 2, (4, 3))
    mat = np.asarray(pairwise_iou_rotated_3d(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(5):
        for j in range(4):
            single = float(iou_rotated_3d(jnp.asarray(b1[i]), jnp.asarray(b2[j])))
            np.testing.assert_allclose(mat[i, j], single, atol=1e-6)


def test_enclosing_smallest_vs_aligned():
    """For two collinear axis-aligned boxes the hull is a rectangle, so the
    smallest enclosing box == the axis-aligned one (5 x 2)."""
    c1 = box2corners(jnp.asarray([0.0, 0, 2, 2, 0]))
    c2 = box2corners(jnp.asarray([3.0, 0, 2, 2, 0]))
    wa, ha = enclosing_box(c1, c2, "aligned")
    ws, hs = enclosing_box(c1, c2, "smallest")
    np.testing.assert_allclose(float(wa) * float(ha), 10.0, rtol=1e-5)
    np.testing.assert_allclose(float(ws) * float(hs), 10.0, rtol=1e-4)


def test_enclosing_smallest_rotated_tighter():
    """Two identically-rotated boxes: smallest box is the rotated hull, which
    is smaller than the axis-aligned one."""
    t = 0.6
    c1 = box2corners(jnp.asarray([0.0, 0, 2, 1, t]))
    c2 = box2corners(jnp.asarray([1.0 * np.cos(t), 1.0 * np.sin(t), 2, 1, t]))
    wa, ha = enclosing_box(c1, c2, "aligned")
    ws, hs = enclosing_box(c1, c2, "smallest")
    assert float(ws) * float(hs) < float(wa) * float(ha) - 1e-3
    # exact: the hull is a 3x1 rotated rectangle
    np.testing.assert_allclose(float(ws) * float(hs), 3.0, rtol=1e-4)


def test_gradients_finite_and_nonzero():
    def loss_fn(b1):
        l, _ = diou_rotated_3d(b1, jnp.asarray([0.3, 0.2, 0.1, 2, 2, 2, 0.4]))
        return l

    g = jax.grad(loss_fn)(jnp.asarray([0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.abs(np.asarray(g)) > 1e-6)

    def giou_fn(b1):
        l, _, _ = giou_rotated_3d(b1[None], jnp.asarray([[0.3, 0.2, 0.1, 2, 2, 2, 0.4]]))
        return l.sum()

    g2 = jax.grad(giou_fn)(jnp.asarray([0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_grad_matches_finite_difference():
    """Gradient of 2D intersection area vs central differences."""
    base = np.array([0.15, -0.1, 2.0, 1.5, 0.35], np.float32)
    other = jnp.asarray([0.4, 0.3, 1.8, 2.2, -0.5], jnp.float32)

    def area_fn(b):
        return oriented_box_intersection_area(box2corners(b), box2corners(other))

    g = np.asarray(jax.grad(area_fn)(jnp.asarray(base)))
    eps = 1e-3
    for i in range(5):
        bp, bm = base.copy(), base.copy()
        bp[i] += eps
        bm[i] -= eps
        fd = (float(area_fn(jnp.asarray(bp))) - float(area_fn(jnp.asarray(bm)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=1e-3)


def test_jit_compiles():
    f = jax.jit(iou_rotated_3d)
    b = jnp.asarray([0, 0, 0, 2, 2, 2, 0.3], jnp.float32)
    np.testing.assert_allclose(float(f(b, b)), 1.0, atol=1e-5)


def test_degenerate_box_gradients_finite():
    """Gradients through the rotated-IoU family must stay finite for
    DEGENERATE boxes (zero/negative extents) — an untrained FCOS head emits
    negative distance regressions, and a NaN here poisons every parameter on
    the first optimizer step (caught by the synthetic fcos_obb quality gate:
    loss finite, grad_norm NaN at step 0)."""
    import numpy as np

    from nerf_rpn_tpu.ops.fcos_box import decode_fcos_obb
    from nerf_rpn_tpu.ops.rotated_iou import (
        diou_rotated_3d,
        giou_rotated_3d,
        iou_rotated_3d,
    )

    rng = np.random.default_rng(0)
    regs = jnp.asarray(rng.normal(0, 2, (256, 8)).astype(np.float32))
    tgts = jnp.asarray(np.abs(rng.normal(2, 1, (256, 8))).astype(np.float32))
    dummy = jnp.zeros((256, 3))
    tgt_boxes = decode_fcos_obb(dummy, tgts)
    for fn in (lambda p: jnp.sum(iou_rotated_3d(p, tgt_boxes)),
               lambda p: jnp.sum(giou_rotated_3d(p, tgt_boxes)[0]),
               lambda p: jnp.sum(diou_rotated_3d(p, tgt_boxes)[0])):
        def loss(r):
            return fn(decode_fcos_obb(dummy, r))

        v, g = jax.value_and_grad(loss)(regs)
        assert bool(jnp.isfinite(v)), "loss value not finite"
        assert bool(jnp.isfinite(g).all()), "gradient not finite"
