"""Tools + datatools: proposals2ngp roundtrip, PLY dumps, heatmaps, box prep."""

import json
import os

import numpy as np
import pytest

from nerf_rpn_tpu.tools.proposals2ngp import (
    aabb_proposals_to_ngp,
    obb_proposals_to_ngp,
    ngp_matrix_to_nerf,
    process_scene,
)
from nerf_rpn_tpu.tools.visualize_rpn_input import (
    write_ply,
    aabb_corners,
    visualize_scene,
)
from nerf_rpn_tpu.tools.render_heatmap import (
    combine_levels,
    composite_heatmap,
    gaussian_filter_3d,
    render_scene,
)
from nerf_rpn_tpu.datatools.hypersim_boxes import (
    nerf_matrix_to_ngp,
    process_aabbs,
    process_obbs,
)
from nerf_rpn_tpu.datatools.scannet_boxes import (
    convex_hull_2d,
    minimum_bounding_rectangle,
    instance_obb,
    filter_boxes,
    read_ply_vertices,
)
from nerf_rpn_tpu.datatools.nerf_features import build_sample_grid, extract_rgbsigma


def _scene_params():
    return {
        "resolution": np.array([32, 32, 32], np.float64),
        "bbox_min": np.array([-1.0, -1.0, -1.0]),
        "bbox_max": np.array([1.0, 1.0, 1.0]),
        "scale": 1.0,
        "offset": np.array([0.0, 0.0, 0.0]),
        "from_mitsuba": False,
    }


def test_ngp_nerf_matrix_roundtrip():
    """hypersim nerf->ngp followed by tools ngp->nerf is the identity."""
    rng = np.random.default_rng(0)
    m = np.hstack([np.linalg.qr(rng.normal(size=(3, 3)))[0],
                   rng.normal(size=(3, 1))])
    scale, offset = 0.5, np.array([0.1, 0.2, 0.3])
    fwd = nerf_matrix_to_ngp(m, scale, offset, from_mitsuba=False)
    back = ngp_matrix_to_nerf(fwd, scale, offset, from_mitsuba=False)
    np.testing.assert_allclose(back, m, atol=1e-12)


def test_proposals_to_ngp_shapes():
    props = np.array([[4, 4, 4, 12, 12, 12]], np.float32)
    boxes = aabb_proposals_to_ngp(props, _scene_params())
    assert len(boxes) == 1
    assert len(boxes[0]["extents"]) == 3
    # 8-voxel box in a 32-grid over a 2-unit bbox -> extent 0.5 per axis
    np.testing.assert_allclose(boxes[0]["extents"], [0.5, 0.5, 0.5], atol=1e-9)
    obbs = np.array([[16, 16, 16, 8, 8, 8, 0.3]], np.float32)
    boxes = obb_proposals_to_ngp(obbs, _scene_params())
    np.testing.assert_allclose(boxes[0]["extents"], [0.5, 0.5, 0.5], atol=1e-9)
    rot = np.asarray(boxes[0]["orientation"])
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-9)


def test_process_scene_roundtrip(tmp_path):
    np.savez(tmp_path / "s.npz", **_scene_params())
    np.savez(tmp_path / "props.npz",
             proposal=np.array([[4, 4, 4, 12, 12, 12]], np.float32),
             score=np.array([0.9], np.float32))
    (tmp_path / "transforms.json").write_text(json.dumps({"frames": []}))
    n = process_scene(tmp_path / "props.npz", tmp_path / "transforms.json",
                      tmp_path / "s.npz", tmp_path / "out.json",
                      bbox_format="aabb", threshold=0.5)
    assert n == 1
    out = json.loads((tmp_path / "out.json").read_text())
    assert len(out["bounding_boxes"]) == 1
    assert out["bounding_boxes"][0]["score"] == pytest.approx(0.9, rel=1e-5)


def test_write_ply_and_read_back(tmp_path):
    pts = np.array([[0, 0, 0], [1, 2, 3]], np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    boxes = [aabb_corners(np.array([0, 0, 0, 1, 1, 1], np.float32))]
    path = tmp_path / "test.ply"
    write_ply(str(path), pts, colors, boxes)
    verts = read_ply_vertices(str(path))
    assert verts.shape == (10, 3)  # 2 points + 8 corners
    np.testing.assert_allclose(verts[:2], pts, atol=1e-3)


def test_visualize_scene(tmp_path):
    vol = np.zeros((8, 8, 8, 4), np.float32)
    vol[2:6, 2:6, 2:6] = [1, 0, 0, 100.0]
    np.savez(tmp_path / "sc.npz", rgbsigma=vol)
    np.save(tmp_path / "sc.npy", np.array([[2, 2, 2, 6, 6, 6]], np.float32))
    out = tmp_path / "viz"
    visualize_scene("sc", str(out), str(tmp_path), str(tmp_path), "aabb")
    assert (out / "sc.ply").is_file()


def test_heatmap_pipeline(tmp_path):
    s0 = np.zeros((8, 8, 8), np.float32)
    s0[4, 4, 4] = 1.0
    np.savez(tmp_path / "hm.npz", **{"0": s0, "1": np.zeros((4, 4, 4), np.float32)})
    render_scene("hm", str(tmp_path), str(tmp_path / "out"),
                 grid_shape=(32, 32, 32), sigma=1.0, export_ply=True)
    assert (tmp_path / "out" / "hm_heatmap.png").is_file()
    assert (tmp_path / "out" / "hm_heatmap.ply").is_file()


def test_gaussian_filter_preserves_mass():
    vol = np.zeros((9, 9, 9), np.float32)
    vol[4, 4, 4] = 1.0
    sm = gaussian_filter_3d(vol, 1.0)
    np.testing.assert_allclose(sm.sum(), 1.0, rtol=1e-3)
    assert sm[4, 4, 4] < 1.0


def test_hypersim_aabb_identity_box():
    """An axis-aligned unit box at the bbox centre maps to grid centre."""
    params = _scene_params()
    json_dict = {"bounding_boxes": [{
        "extents": [0.5, 0.5, 0.5],
        "orientation": np.eye(3).tolist(),
        "position": [0.0, 0.0, 0.0],
    }]}
    boxes = process_aabbs(json_dict, params)
    assert boxes.shape == (1, 6)
    ctr = (boxes[0, :3] + boxes[0, 3:]) / 2
    # nerf->ngp permutes/flips axes but the centre of a centred box stays
    np.testing.assert_allclose(ctr, [16, 16, 16], atol=1.0)


def test_hypersim_obb_theta():
    params = _scene_params()
    t = 0.4
    rot = np.array([
        [np.cos(t), -np.sin(t), 0],
        [np.sin(t), np.cos(t), 0],
        [0, 0, 1],
    ])
    json_dict = {"bounding_boxes": [{
        "extents": [0.5, 0.3, 0.2],
        "orientation": rot.tolist(),
        "position": [0.0, 0.0, 0.0],
    }]}
    boxes = process_obbs(json_dict, params)
    assert boxes.shape == (1, 7)
    assert np.isfinite(boxes[0, 6])


def test_convex_hull_and_min_rect():
    # axis-aligned rectangle corners + interior noise
    rng = np.random.default_rng(0)
    corners = np.array([[0, 0], [4, 0], [4, 2], [0, 2]], np.float64)
    interior = rng.uniform([0.1, 0.1], [3.9, 1.9], (50, 2))
    pts = np.vstack([corners, interior])
    hull = convex_hull_2d(pts)
    assert len(hull) == 4
    ctr, lp, lo, ang = minimum_bounding_rectangle(pts)
    np.testing.assert_allclose(ctr, [2, 1], atol=1e-9)
    np.testing.assert_allclose(sorted([lp, lo]), [2, 4], atol=1e-9)

    # rotated rectangle
    t = 0.5
    rot = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    pts_rot = pts @ rot.T
    ctr2, lp2, lo2, ang2 = minimum_bounding_rectangle(pts_rot)
    np.testing.assert_allclose(sorted([lp2, lo2]), [2, 4], atol=1e-6)
    np.testing.assert_allclose(np.abs(np.cos(ang2 - t)), 1.0, atol=1e-6)


def test_instance_obb():
    rng = np.random.default_rng(1)
    pts = rng.uniform([0, 0, 1], [4, 2, 3], (200, 3))
    pts[:4] = [[0, 0, 1], [4, 0, 1], [4, 2, 3], [0, 2, 3]]  # pin the extremes
    obb = instance_obb(pts)
    np.testing.assert_allclose(obb[:3], [2, 1, 2], atol=0.05)
    np.testing.assert_allclose(obb[5], 2.0, atol=1e-6)  # z extent


def test_filter_boxes(tmp_path):
    np.savez(tmp_path / "feat.npz", resolution=np.array([16, 16, 16]))
    inst = [
        {"label": "chair", "obb": [2, 2, 1, 2, 2, 2, 0.0],
         "min_pt": [0, 0, 0], "max_pt": [4, 4, 4]},
        {"label": "wall", "obb": [2, 2, 1, 2, 2, 2, 0.0],
         "min_pt": [0, 0, 0], "max_pt": [4, 4, 4]},
        {"label": "table", "obb": [2, 2, 1, 0.1, 2, 2, 0.0],
         "min_pt": [0, 0, 0], "max_pt": [4, 4, 4]},
    ]
    (tmp_path / "scene.json").write_text(json.dumps({"instances": inst}))
    filter_boxes(str(tmp_path / "feat.npz"), str(tmp_path / "scene.json"),
                 str(tmp_path / "out.npy"), str(tmp_path / "out.json"),
                 min_size=2.0)
    kept = np.load(tmp_path / "out.npy")
    assert kept.shape[0] == 1  # 'wall' excluded by label, tiny box by size


def test_nerf_feature_extraction(tmp_path):
    def fake_nerf(pts):
        rgb = np.stack([pts[:, 0], pts[:, 1], pts[:, 2]], -1)
        sigma = np.linalg.norm(pts, axis=-1)
        return rgb, sigma

    out_file = tmp_path / "scene.npz"
    grid, res = extract_rgbsigma(
        fake_nerf, [0, 0, 0], [2, 1, 1], max_res=8, chunk=17,
        output_file=str(out_file))
    assert res.tolist() == [8, 4, 4]
    assert grid.shape == (8, 4, 4, 4)
    with np.load(out_file) as f:
        assert f["rgbsigma"].shape == (8, 4, 4, 4)
    # rgb channel 0 increases along x
    assert (np.diff(grid[:, 0, 0, 0]) > 0).all()


def test_build_sample_grid_centres():
    pts, res = build_sample_grid([0, 0, 0], [4, 4, 4], 4)
    assert res.tolist() == [4, 4, 4]
    np.testing.assert_allclose(pts[0], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(pts[-1], [3.5, 3.5, 3.5])


# ---------------------------------------------------------------------------
# visualize_bbox (box overlay projection)
# ---------------------------------------------------------------------------


def test_bbox_projection_center():
    """A box straight ahead of an identity NeRF camera projects to the image
    centre, and its wireframe rasterizes into the overlay."""
    from nerf_rpn_tpu.tools.visualize_bbox import (
        draw_line,
        get_obb_corners,
        get_world_to_proj_matrix,
        project_points,
        render_bbox_overlay,
    )

    frame = {"transform_matrix": np.eye(4).tolist(), "fy": 240.0, "fx": 240.0}
    h, w = 480, 640
    world2proj = get_world_to_proj_matrix(frame, w, h)
    # NeRF cameras look along -z: a point at (0, 0, -2) is dead ahead
    pts = project_points(world2proj, np.array([[0.0, 0.0, -2.0]]))
    assert pts.shape == (1, 2)
    np.testing.assert_allclose(pts[0], [w // 2, h // 2], atol=1)
    # a behind-the-camera point is dropped
    assert project_points(world2proj, np.array([[0.0, 0.0, 2.0]])).shape[0] == 0

    corners = get_obb_corners([0.0, 0.0, -2.0, 0.6, 0.6, 0.6, 0.3])
    assert corners.shape == (8, 3)
    img = np.zeros((h, w, 3), np.uint8)
    render_bbox_overlay(img, world2proj, corners, color=(255, 0, 0))
    ys, xs = np.nonzero(img[..., 0])
    assert len(ys) > 50  # edges actually drew
    # all drawn pixels cluster around the centre (box is small + centred)
    assert abs(xs.mean() - w / 2) < 60 and abs(ys.mean() - h / 2) < 60

    # draw_line clips out-of-bounds cleanly
    img2 = np.zeros((8, 8, 3), np.uint8)
    draw_line(img2, (-5.0, -5.0), (20.0, 20.0), (0, 255, 0))
    assert img2[..., 1].any()


def test_visualize_bbox_process_scene(tmp_path):
    from nerf_rpn_tpu.tools.visualize_bbox import process_scene

    frame = {"transform_matrix": np.eye(4).tolist(), "fy": 240.0,
             "fx": 240.0, "file_path": "images/0.jpg"}
    instances = {"instances": [
        {"label": "chair", "obb": [0.0, 0.0, -2.0, 0.5, 0.5, 0.5, 0.0]},
        {"label": "table", "min_pt": [-0.4, -0.4, -2.4],
         "max_pt": [0.4, 0.4, -1.6], "obb": [0, 0, -2.0, 0.8, 0.8, 0.8, 0]},
    ]}
    written = process_scene(instances, {"frames": [frame]}, str(tmp_path),
                            str(tmp_path / "out"))
    assert len(written) == 1 and written[0].endswith("0.png")
    # the PNG decodes and contains non-black (drawn) pixels
    from PIL import Image

    arr = np.asarray(Image.open(written[0]))
    assert arr.shape[-1] == 3 and arr.any()
