"""ScanNet preparation toolchain tests (VERDICT r1 item 6): sharpness
sampling, pose validation, scene layout, gt-pose COLMAP seeding, and COLMAP
command assembly — semantics pinned to the reference
``data/scannet/prepare_scannet.py`` / ``run_colmap.py``."""

import json
import os
import sqlite3

import numpy as np
import pytest

from nerf_rpn_tpu.datatools.prepare_scannet import (
    build_train_images_txt,
    count_reconstructed_images,
    pose_to_colmap_qt,
    prepare_scene,
    process_commands,
    read_fx_color,
    rotmat_to_quat_wxyz,
    sample_train_frames,
    sample_val_frames,
    sfm_commands,
    sharpness,
    validate_poses,
    write_ground_truth_poses,
)
from nerf_rpn_tpu.datatools.nerf_features import (
    build_sample_grid,
    ddp_flat_to_grid,
    extract_rgbsigma,
    grid_to_ddp_flat,
    mean_rgb_over_poses,
)


# ---------------------------------------------------------------------------
# frame selection
# ---------------------------------------------------------------------------


def test_sample_train_frames_reference_chunking():
    # 10 frames, 3 train samples -> interval 3: chunks [0:3],[3:6],[6:9];
    # frame 9 (the len%num tail) is never a candidate (reference
    # prepare_scannet.py:63-74)
    frames = list(range(10))
    score = {0: 1, 1: 5, 2: 2, 3: 9, 4: 1, 5: 1, 6: 2, 7: 8, 8: 3, 9: 99}
    train, scores = sample_train_frames(frames, 3, lambda i: score[i])
    assert train == [1, 3, 7]
    assert 9 not in scores  # tail never scored
    assert set(scores) == set(range(9))


def test_sample_val_frames_excludes_train_and_skips_empty():
    frames = list(range(6))
    score = {i: float(i) for i in frames}
    # train takes the max of each 1-chunk -> all frames
    train, scores = sample_train_frames(frames, 6, lambda i: score[i])
    assert train == frames
    val = sample_val_frames(frames, train, scores, 3, lambda i: score[i])
    assert val == []  # every chunk fully taken -> skipped (reference :80-82)

    train2 = [1, 5]
    val2 = sample_val_frames(frames, train2, scores, 2, lambda i: score[i])
    # chunks [0,1,2] minus train -> {0,2} -> 2; [3,4,5] minus train -> {3,4} -> 4
    assert val2 == [2, 4]


def test_sample_val_frames_scores_tail_on_demand():
    # 7 frames, 3 train samples -> interval 2 covers frames 0..5; frame 6 is
    # unscored.  val interval 7//1=7 covers all frames incl. 6 -> must call
    # score_fn instead of KeyError-ing (the reference would crash here)
    frames = list(range(7))
    base = {i: float(i % 3) for i in range(7)}
    train, scores = sample_train_frames(frames, 3, lambda i: base[i])
    assert 6 not in scores
    calls = []

    def fallback(i):
        calls.append(i)
        return 100.0

    val = sample_val_frames(frames, train, scores, 1, fallback)
    assert calls == [6] and val == [6]


def test_sample_more_than_available():
    frames = [3, 7]
    train, _ = sample_train_frames(frames, 100, lambda i: float(i))
    assert train == [3, 7]


def test_validate_poses(tmp_path):
    good = np.eye(4)
    np.savetxt(tmp_path / "0.txt", good)
    bad = good.copy()
    bad[1, 2] = np.inf
    np.savetxt(tmp_path / "1.txt", bad)
    nan = good.copy()
    nan[0, 0] = np.nan
    np.savetxt(tmp_path / "2.txt", nan)
    (tmp_path / "3.txt").write_text("not a matrix\n")
    # 4.txt missing
    assert validate_poses([0, 1, 2, 3, 4], str(tmp_path)) == [0]


def test_sharpness_orders_blur(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    sharp = rng.integers(0, 255, (64, 64), np.uint8)
    blurred = sharp.astype(np.float32)
    for ax in (0, 1):
        blurred = (np.roll(blurred, 1, ax) + blurred + np.roll(blurred, -1, ax)) / 3
    Image.fromarray(sharp).save(tmp_path / "sharp.jpg")
    Image.fromarray(blurred.astype(np.uint8)).save(tmp_path / "blur.jpg")
    assert sharpness(str(tmp_path / "sharp.jpg")) > sharpness(str(tmp_path / "blur.jpg"))


def test_prepare_scene_layout(tmp_path):
    scene = tmp_path / "scene0000_00"
    for sub in ("color", "pose", "intrinsic"):
        (scene / "extract" / sub).mkdir(parents=True)
    for i in range(12):
        (scene / "extract" / "color" / f"{i}.jpg").write_bytes(b"")
        np.savetxt(scene / "extract" / "pose" / f"{i}.txt", np.eye(4))
    # frame 5's pose is invalid
    m = np.eye(4)
    m[2, 3] = np.nan
    np.savetxt(scene / "extract" / "pose" / "5.txt", m)

    out = tmp_path / "out"
    score = lambda i: float((i * 7) % 11)
    result = prepare_scene(str(scene), str(out), num_train_samples=3,
                           num_val_samples=2, min_valid_frames=5,
                           score_fn=score)
    assert result is not None
    train, val = result
    # 11 valid frames (5 dropped): interval 3 -> chunks [0,1,2],[3,4,6],[7,8,9]
    exp_train, _ = sample_train_frames(
        [0, 1, 2, 3, 4, 6, 7, 8, 9, 10, 11], 3, score)
    assert train == exp_train
    sdir = out / "scene0000_00"
    assert (sdir / "train_set.csv").read_text().splitlines() == [
        f"{i}.jpg" for i in train]
    assert (sdir / "test_set.csv").read_text().splitlines() == [
        f"{i}.jpg" for i in val]
    cfg = json.loads((sdir / "config.json").read_text())
    assert cfg == {"name": "scene0000_00", "max_depth": 15.0, "dist2m": 1.0,
                   "rgb_only": True}
    assert (sdir / "colmap" / "sparse").is_dir()
    assert (sdir / "colmap" / "sparse_train").is_dir()

    # too few valid frames -> skipped, nothing written
    assert prepare_scene(str(scene), str(tmp_path / "out2"),
                         min_valid_frames=100) is None
    assert not (tmp_path / "out2").exists()


# ---------------------------------------------------------------------------
# gt-pose seeding
# ---------------------------------------------------------------------------


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        r = _random_rotation(rng)
        q = rotmat_to_quat_wxyz(r)
        np.testing.assert_allclose(_quat_to_mat(q), r, atol=1e-10)
        assert q[0] >= 0


def test_pose_to_colmap_qt():
    rng = np.random.default_rng(1)
    pose = np.eye(4)
    pose[:3, :3] = _random_rotation(rng)
    pose[:3, 3] = rng.normal(size=3)
    quat, trans = pose_to_colmap_qt(pose)
    # COLMAP stores world->cam: R_wc = R_cw^T, t = -R_wc @ c
    r_wc = _quat_to_mat(quat)
    np.testing.assert_allclose(r_wc, pose[:3, :3].T, atol=1e-10)
    np.testing.assert_allclose(trans, -pose[:3, :3].T @ pose[:3, 3],
                               atol=1e-10)
    # a world point maps into the camera frame consistently
    p = rng.normal(size=3)
    cam = r_wc @ p + trans
    np.testing.assert_allclose(pose[:3, :3] @ cam + pose[:3, 3], p, atol=1e-9)


def _make_colmap_db(path, names):
    db = sqlite3.connect(path)
    db.execute("CREATE TABLE cameras (camera_id INTEGER PRIMARY KEY, "
               "model INTEGER, width INTEGER, height INTEGER, params BLOB, "
               "prior_focal_length INTEGER)")
    db.execute("CREATE TABLE images (image_id INTEGER PRIMARY KEY, "
               "name TEXT, camera_id INTEGER)")
    params = np.array([600.0, 324.0, 243.0], np.float64)
    db.execute("INSERT INTO cameras VALUES (1, 0, 648, 486, ?, 1)",
               (params.tobytes(),))
    for i, n in enumerate(names, start=1):
        db.execute("INSERT INTO images VALUES (?, ?, 1)", (i, n))
    db.commit()
    db.close()


def test_write_ground_truth_poses(tmp_path):
    sparse = tmp_path / "sparse0"
    sparse.mkdir()
    pose_dir = tmp_path / "pose"
    pose_dir.mkdir()
    rng = np.random.default_rng(2)
    poses = {}
    for i in (4, 9):
        pose = np.eye(4)
        pose[:3, :3] = _random_rotation(rng)
        pose[:3, 3] = rng.normal(size=3)
        poses[i] = pose
        np.savetxt(pose_dir / f"{i}.txt", pose)
    (tmp_path / "cam.txt").write_text(
        "colorWidth = 1296\nfx_color = 1170.2\nfy_color = 1170.2\n")
    db_path = tmp_path / "db_all.db"
    _make_colmap_db(str(db_path), ["4.jpg", "9.jpg"])

    write_ground_truth_poses(str(sparse), str(db_path), str(pose_dir),
                             str(tmp_path / "cam.txt"))

    # empty points3D, cameras.txt with fx/2, images.txt 2 lines per image
    assert (sparse / "points3D.txt").read_text() == ""
    cam_lines = (sparse / "cameras.txt").read_text().splitlines()
    assert cam_lines[-1].split()[:5] == ["1", "SIMPLE_PINHOLE", "648", "486",
                                         str(1170.2 / 2)]
    # database camera params rewritten too
    db = sqlite3.connect(str(db_path))
    params = np.frombuffer(
        list(db.execute("SELECT params FROM cameras"))[0][0], np.float64)
    db.close()
    assert params[0] == 1170.2 / 2 and params[1] == 324.0

    img_lines = (sparse / "images.txt").read_text().splitlines()
    data = [l for l in img_lines if l and not l.startswith("#")]
    assert len(data) == 2
    for line in data:
        parts = line.split()
        img_id, name = int(parts[0]), parts[9]
        i = int(name.split(".")[0])
        quat = np.array([float(x) for x in parts[1:5]])
        trans = np.array([float(x) for x in parts[5:8]])
        eq, et = pose_to_colmap_qt(poses[i])
        np.testing.assert_allclose(quat, eq, atol=1e-8)
        np.testing.assert_allclose(trans, et, atol=1e-8)
        assert parts[8] == "1"
    assert (sparse / "gt_poses.txt").read_text() == \
        (sparse / "images.txt").read_text()


def test_count_reconstructed_images(tmp_path):
    # COLMAP's model_converter TXT output has 4 header lines + 2 per image
    # (reference completeness check, run_colmap.py:146-148)
    lines = ["# a\n", "# b\n", "# c\n", "# Number of images: 3\n"]
    for i in range(3):
        lines += [f"{i} 1 0 0 0 0 0 0 1 {i}.jpg\n", "1.0 2.0 5\n"]
    p = tmp_path / "images.txt"
    p.write_text("".join(lines))
    assert count_reconstructed_images(str(p)) == 3


def test_read_fx_color_missing(tmp_path):
    (tmp_path / "cam.txt").write_text("fy_color = 1.0\n")
    with pytest.raises(ValueError):
        read_fx_color(str(tmp_path / "cam.txt"))


def test_build_train_images_txt():
    in_lines = [
        "# Image list with two lines of data per image:\n",
        "#   IMAGE_ID, QW, ...\n",
        "1 0.9 0.1 0.0 0.0 1.0 2.0 3.0 1 100.jpg\n",
        "\n",
        "2 0.8 0.2 0.0 0.0 4.0 5.0 6.0 1 200.jpg\n",
        "\n",
        "3 0.7 0.3 0.0 0.0 7.0 8.0 9.0 1 300.jpg\n",
        "\n",
    ]
    out = build_train_images_txt(
        in_lines, ["100.jpg", "300.jpg"], {"100.jpg": 7, "300.jpg": 8})
    data = [l for l in out if not l.startswith("#")]
    assert data[0].split()[0] == "7" and data[0].rstrip().endswith("100.jpg")
    assert data[1].split()[0] == "8" and data[1].rstrip().endswith("300.jpg")
    assert not any("200.jpg" in l for l in out)
    assert out[0].startswith("#") and out[1].startswith("#")
    # COLMAP images.txt is two lines per image: every kept image line must
    # end with a blank POINTS2D line (point_triangulator reads line pairs)
    for l in data:
        assert l.endswith(".jpg\n\n"), l
    text = "".join(out)
    body = [l for l in text.splitlines() if not l.startswith("#")]
    assert body == [data[0].rstrip("\n").rstrip(), "",
                    data[1].rstrip("\n").rstrip(), ""]


# ---------------------------------------------------------------------------
# COLMAP command assembly
# ---------------------------------------------------------------------------


def test_sfm_commands():
    cmds = sfm_commands("/data/scene", gpu_list=None)
    extract, match = cmds["database"]
    assert "--database_path /data/scene/recon/db_all.db" in extract
    assert "--image_path /data/scene/images_all" in extract
    assert "--ImageReader.single_camera 1" in extract
    assert "--ImageReader.camera_model SIMPLE_PINHOLE" in extract
    assert "gpu_index" not in extract
    assert "--SiftMatching.guided_matching 1" in match

    tri, mapper, conv = cmds["reconstruct"]
    s0 = "/data/scene/recon/sparse/0"
    assert f"--input_path {s0} --output_path {s0}" in tri
    assert tri.startswith("colmap point_triangulator")
    assert "--Mapper.multiple_model 0" in mapper
    assert f"--input_path {s0}" in mapper
    assert f"--input_path={s0}" in conv and "--output_type=TXT" in conv

    gpu = sfm_commands("/data/scene", gpu_list=[0, 2])
    assert "--SiftExtraction.gpu_index=0,2" in gpu["database"][0]
    assert "--SiftMatching.gpu_index=0,2" in gpu["database"][1]


def test_process_commands():
    cmds = process_commands("/d", "./y_down_to_z_up.txt", gpu_list=[1])
    zup = "/d/recon/sparse_z_up/0"
    assert f"--input_path=/d/recon/sparse/0 --output_path={zup}" in cmds["transform"][0]
    assert "--transform_path=./y_down_to_z_up.txt" in cmds["transform"][0]
    assert f"--input_path={zup}" in cmds["transform"][1]

    assert "--database_path /d/recon/db.db" in cmds["train_extract"][0]
    assert "--image_path /d/images_train" in cmds["train_extract"][0]
    assert "--SiftExtraction.gpu_index=1" in cmds["train_extract"][0]

    match, tri, conv = cmds["train_reconstruct"]
    assert "--SiftMatching.guided_matching 1" in match
    assert "--input_path /d/recon/constructed_sparse_train/0" in tri
    assert "--output_path /d/recon/sparse_train/0" in tri
    assert "--input_path=/d/recon/sparse_train/0" in conv


# ---------------------------------------------------------------------------
# NeRF feature extraction contract (reference run_nerf.py:1144-1210)
# ---------------------------------------------------------------------------


def test_ddp_flat_layout_roundtrip():
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(5, 4, 3, 4)).astype(np.float32)
    flat = grid_to_ddp_flat(grid)
    assert flat.shape == (60, 4)
    np.testing.assert_array_equal(ddp_flat_to_grid(flat, (5, 4, 3)), grid)
    # x fastest (reference meshgrid(z, y, x) row-major flatten)
    np.testing.assert_array_equal(flat[0], grid[0, 0, 0])
    np.testing.assert_array_equal(flat[1], grid[1, 0, 0])
    np.testing.assert_array_equal(flat[5], grid[0, 1, 0])
    np.testing.assert_array_equal(flat[20], grid[0, 0, 1])


def test_reference_linspace_grid():
    pts, res = build_sample_grid([0, 0, 0], [4, 2, 2], 4, centers=False)
    assert res.tolist() == [4, 2, 2]
    np.testing.assert_allclose(pts[0], [0, 0, 0])
    np.testing.assert_allclose(pts[-1], [4, 2, 2])
    # endpoint-inclusive spacing: linspace(0, 4, 4) steps by 4/3
    xs = np.unique(pts[:, 0])
    np.testing.assert_allclose(xs, [0, 4 / 3, 8 / 3, 4], atol=1e-6)


def test_extract_ddp_layout_npz(tmp_path):
    def fake_nerf(pts):
        return np.clip(pts / 4.0, 0, 1), pts[:, 0]

    out_file = tmp_path / "scene0000_00.npz"
    grid, res = extract_rgbsigma(
        fake_nerf, [0, 0, 0], [4, 4, 2], max_res=4, chunk=7,
        output_file=str(out_file), centers=False, ddp_layout=True)
    with np.load(out_file) as f:
        assert f["rgbsigma"].shape == (4 * 4 * 2, 4)
        assert f["resolution"].tolist() == [4, 4, 2]
        assert bool(f["from_ddp_nerf"]) is True
        assert bool(f["from_mitsuba"]) is False
        assert float(f["scale"]) == 1.0
        np.testing.assert_array_equal(
            ddp_flat_to_grid(f["rgbsigma"], f["resolution"]), grid)


def test_mean_rgb_over_poses_reference_semantics():
    """mean_rgb_over_poses == a direct transcription of the reference loop
    (``run_nerf.py:1183-1193``): per-pose viewdir = R @ [0,0,-1], RGB =
    mean of sigmoid(raw rgb) over poses, sigma = raw (unactivated)."""
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(37, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
    # distinct rotations so viewdirs differ per pose
    for i, ang in enumerate([0.3, 1.1, 2.0]):
        c, s = np.cos(ang), np.sin(ang)
        poses[i, :3, :3] = np.asarray(
            [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    w = rng.normal(size=(3, 4)).astype(np.float32)

    def query_fn(points, viewdir):
        # view-dependent rgb, view-independent sigma (the DDP NeRF shape)
        base = points @ w.astype(np.float32)
        base[:, :3] += points @ np.outer(
            np.ones(3, np.float32), viewdir.astype(np.float32))
        return base

    rgb, sigma = mean_rgb_over_poses(query_fn, poses, pts, chunk=11)

    # direct port of the reference loop
    acc = np.zeros((len(pts), 3), np.float64)
    for pose in poses:
        vd = pose[:3, :3] @ np.asarray([0, 0, -1.0], np.float32)
        raw = query_fn(pts, vd)
        acc += 1.0 / (1.0 + np.exp(-raw[:, :3]))
        ref_sigma = raw[:, 3]
    np.testing.assert_allclose(rgb, acc / 3, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(sigma, ref_sigma, rtol=1e-6)


def test_extract_npz_closes_downstream_contract(tmp_path):
    """The npz ``extract_rgbsigma`` writes is the npz every downstream
    consumer expects (VERDICT r3 missing #2): ``load_scene`` (ScanNet
    relu-alpha), ``proposals2ngp`` world-coordinate export, and the
    ddp-layout variant re-ingested via ``ddp_flat_to_grid`` — one toy
    radiance field through the full chain."""
    from nerf_rpn_tpu.data.datasets import density_to_alpha_relu, load_scene
    from nerf_rpn_tpu.tools.proposals2ngp import (
        aabb_proposals_to_ngp,
        obb_proposals_to_ngp,
    )

    bbox_min = np.asarray([1.0, -2.0, 0.0])
    bbox_max = np.asarray([5.0, 0.0, 2.0])

    def toy_field(pts):
        # a solid Gaussian blob at the bbox centre
        ctr = (bbox_min + bbox_max) / 2
        d2 = ((pts - ctr) ** 2).sum(-1)
        rgb = np.stack([np.exp(-d2), pts[:, 0] / 5.0, pts[:, 2] / 2.0], -1)
        return np.clip(rgb, 0, 1), 50.0 * np.exp(-d2)

    out_file = tmp_path / "scene0000_00.npz"
    grid, res = extract_rgbsigma(
        toy_field, bbox_min, bbox_max, max_res=8, output_file=str(out_file))
    assert res.tolist() == [8, 4, 4]

    # 1. dataset ingestion: load_scene reads the 4D rgbsigma + relu alpha
    vol, boxes = load_scene(str(out_file), None, normalize_density=True,
                            alpha_fn=density_to_alpha_relu)
    assert vol.shape == (8, 4, 4, 4)
    assert boxes is None
    np.testing.assert_allclose(
        vol[..., -1], density_to_alpha_relu(grid[..., -1]), atol=1e-6)
    assert vol[..., -1].max() > 0.3  # the blob is visible

    # 2. proposals2ngp: the SAME npz feeds the world-coordinate export;
    # a grid-coordinate proposal maps to the expected world position
    with np.load(out_file) as f:
        feats = dict(f)
    prop = np.asarray([[2.0, 1.0, 1.0, 6.0, 3.0, 3.0]], np.float32)
    boxes_ngp = aabb_proposals_to_ngp(prop, feats)
    assert len(boxes_ngp) == 1
    ctr_grid = (prop[0, :3] + prop[0, 3:]) / 2  # (4, 2, 2)
    diag = bbox_max - bbox_min
    world = ctr_grid / np.asarray(res) * diag + bbox_min
    # at scale=1 / offset=0 the z-up->y-up cycle and the ngp->nerf
    # conversion cancel on positions: the export is world coordinates
    # (the matrix chain itself is parity-tested in test_tools)
    np.testing.assert_allclose(boxes_ngp[0]["position"], world, atol=1e-6)

    obb = np.asarray([[4.0, 2.0, 2.0, 4.0, 2.0, 2.0, 0.3]], np.float32)
    boxes_obb = obb_proposals_to_ngp(obb, feats)
    assert len(boxes_obb) == 1

    # 3. the reference ddp flat layout re-ingests to the identical grid,
    # and proposals2ngp consumes its scalar offset too
    ddp_file = tmp_path / "ddp.npz"
    extract_rgbsigma(toy_field, bbox_min, bbox_max, max_res=8,
                     output_file=str(ddp_file), centers=False,
                     ddp_layout=True)
    with np.load(ddp_file) as f:
        ddp = dict(f)
    assert ddp["rgbsigma"].shape == (8 * 4 * 4, 4)
    regrid = ddp_flat_to_grid(ddp["rgbsigma"], ddp["resolution"])
    assert regrid.shape == (8, 4, 4, 4)
    assert np.asarray(ddp["offset"]).ndim == 0  # reference scalar contract
    assert len(aabb_proposals_to_ngp(prop, ddp)) == 1


# ---------------------------------------------------------------------------
# COLMAP integration smoke (requires the colmap binary; skipped otherwise)
# ---------------------------------------------------------------------------


def _toy_colmap_scene(tmp_path, n_frames=3, size=(128, 96)):
    """A 3-frame toy scene: translated crops of one noise texture (SIFT can
    match them), gt camera-to-world poses, ScanNet-style layout."""
    from PIL import Image

    rng = np.random.default_rng(0)
    scene_dir = tmp_path / "scene0000_00"
    data_dir = tmp_path / "nerf_scene"
    for d in ("extract/color", "extract/pose", "extract/intrinsic"):
        (scene_dir / d).mkdir(parents=True)
    (data_dir / "images_all").mkdir(parents=True)
    (data_dir / "images_train").mkdir()

    w, h = size
    texture = rng.integers(0, 256, (h + 64, w + 64, 3), np.uint8)
    for i in range(n_frames):
        crop = texture[i * 8:i * 8 + h, i * 8:i * 8 + w]
        img = Image.fromarray(crop)
        img.save(scene_dir / "extract" / "color" / f"{i}.jpg")
        img.save(data_dir / "images_all" / f"{i}.jpg")
        if i < n_frames - 1:  # train subset
            img.save(data_dir / "images_train" / f"{i}.jpg")
        pose = np.eye(4)
        pose[:3, 3] = [0.05 * i, 0.0, 0.0]
        np.savetxt(scene_dir / "extract" / "pose" / f"{i}.txt", pose)
    (scene_dir / "scene0000_00.txt").write_text(
        "colorWidth = 128\nfx_color = 300.0\nfy_color = 300.0\n")
    transform = tmp_path / "transform.txt"
    np.savetxt(transform, np.eye(4)[:3])
    return scene_dir, data_dir, transform


@pytest.mark.skipif(__import__("shutil").which("colmap") is None,
                    reason="colmap binary not installed in this image")
def test_colmap_pipeline_integration(tmp_path):
    """End-to-end smoke of the gt-pose-seeded SfM + train re-triangulation
    phases against a real COLMAP binary on a 3-frame toy scene (reference
    ``run_colmap.py`` ``run_colmap_sfm`` + ``process``)."""
    from nerf_rpn_tpu.datatools.prepare_scannet import (
        run_colmap_process,
        run_colmap_sfm,
    )

    scene_dir, data_dir, transform = _toy_colmap_scene(tmp_path)
    complete = run_colmap_sfm(str(scene_dir), str(data_dir), verbose=False)
    images_txt = data_dir / "recon" / "sparse" / "0" / "images.txt"
    assert images_txt.is_file()
    assert count_reconstructed_images(str(images_txt)) >= 1
    assert isinstance(complete, bool)

    run_colmap_process(str(data_dir), str(transform), verbose=False)
    # the rebuilt constructed_sparse_train images.txt is two lines per image
    constructed = (data_dir / "recon" / "constructed_sparse_train" / "0"
                   / "images.txt")
    body = [l for l in constructed.read_text().splitlines()
            if l and not l.startswith("#")]
    blanks = [l for l in constructed.read_text().split("\n")
              if not l.strip() and l == ""]
    assert len(body) >= 1 and len(blanks) >= len(body)
    # and the train sparse model was produced
    assert (data_dir / "recon" / "sparse_train" / "0").is_dir()
