"""ScanNet scene preparation: sharp-frame sampling, pose validation, COLMAP.

Parity target: reference ``data/scannet/prepare_scannet.py`` +
``run_colmap.py`` — sample the sharpest frame (variance-of-Laplacian) out of
each chunk of the video, validate poses (finite 4x4 matrices), lay out the
dense-depth-priors-NeRF train/val split, and orchestrate the COLMAP sparse
reconstruction seeded with ground-truth poses.

External-tool boundaries are explicit: image decoding uses whatever of
PIL/cv2/imageio is available (gated), and COLMAP commands are emitted via
subprocess only when the ``colmap`` binary exists — otherwise the exact
command list is returned/printed so the user can run it elsewhere.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess

import numpy as np


def _load_gray(image_path: str) -> np.ndarray:
    try:
        from PIL import Image

        return np.asarray(Image.open(image_path).convert("L"), np.float32)
    except ImportError:
        pass
    try:
        import cv2

        return cv2.imread(image_path, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    except ImportError as e:
        raise RuntimeError("need PIL or cv2 to score image sharpness") from e


def sharpness(image_path: str) -> float:
    """Variance of the Laplacian (reference ``prepare_scannet.sharpness``)."""
    img = _load_gray(image_path)
    lap = (
        -4 * img
        + np.roll(img, 1, 0) + np.roll(img, -1, 0)
        + np.roll(img, 1, 1) + np.roll(img, -1, 1)
    )
    return float(lap[1:-1, 1:-1].var())


def validate_pose(idx: int, pose_dir: str) -> bool:
    """A pose is valid if its 4x4 matrix is fully finite."""
    pose_file = os.path.join(pose_dir, f"{idx}.txt")
    if not os.path.isfile(pose_file):
        return False
    try:
        mat = np.loadtxt(pose_file)
    except ValueError:
        return False
    return mat.shape == (4, 4) and np.isfinite(mat).all()


def sample_sharp_frames(
    rgb_dir: str,
    pose_dir: str,
    num_train: int = 100,
    num_val: int = 20,
):
    """Pick the sharpest valid-pose frame per uniform chunk.

    Returns (train_idxs, val_idxs) — val frames are the sharpest of each of
    ``num_val`` chunks among frames not already in train.
    """
    frames = sorted(
        int(f.split(".")[0]) for f in os.listdir(rgb_dir)
        if f.split(".")[0].isdigit()
    )
    frames = [i for i in frames if validate_pose(i, pose_dir)]
    if not frames:
        return [], []

    def ext(i):
        for e in (".jpg", ".png"):
            p = os.path.join(rgb_dir, f"{i}{e}")
            if os.path.isfile(p):
                return p
        raise FileNotFoundError(i)

    chunks = np.array_split(np.asarray(frames), min(num_train, len(frames)))
    scores = {}
    train = []
    for chunk in chunks:
        vals = [sharpness(ext(i)) for i in chunk]
        for i, v in zip(chunk, vals):
            scores[int(i)] = v
        train.append(int(chunk[int(np.argmax(vals))]))

    remaining = [i for i in frames if i not in set(train)]
    val = []
    if remaining:
        for chunk in np.array_split(np.asarray(remaining), min(num_val, len(remaining))):
            vals = [scores.get(int(i)) or sharpness(ext(i)) for i in chunk]
            val.append(int(chunk[int(np.argmax(vals))]))
    return train, val


def prepare_scene(scene_path: str, output_path: str, num_train: int = 100,
                  num_val: int = 20):
    """Lay out the dense-depth-priors-NeRF directory structure for a scene."""
    rgb_dir = os.path.join(scene_path, "rgb")
    pose_dir = os.path.join(scene_path, "pose")
    train, val = sample_sharp_frames(rgb_dir, pose_dir, num_train, num_val)
    os.makedirs(output_path, exist_ok=True)
    for split, idxs in (("train", train), ("val", val)):
        for sub in ("rgb", "pose", "depth"):
            os.makedirs(os.path.join(output_path, split, sub), exist_ok=True)
        for i in idxs:
            for sub, exts in (("rgb", (".jpg", ".png")), ("pose", (".txt",)),
                              ("depth", (".png",))):
                for e in exts:
                    src = os.path.join(scene_path, sub, f"{i}{e}")
                    if os.path.isfile(src):
                        shutil.copy(src, os.path.join(output_path, split, sub))
                        break
    os.makedirs(os.path.join(output_path, "colmap", "sparse"), exist_ok=True)
    os.makedirs(os.path.join(output_path, "colmap", "sparse_train"), exist_ok=True)
    with open(os.path.join(output_path, "split.json"), "w") as f:
        json.dump({"train": train, "val": val}, f)
    return train, val


def colmap_commands(data_dir: str, use_gpu: bool = False) -> list[str]:
    """The COLMAP sparse-reconstruction command sequence (gt-pose seeded
    triangulation, reference ``run_colmap.run_colmap_sfm``)."""
    rgb = os.path.join(data_dir, "rgb_all")
    db = os.path.join(data_dir, "db_all.db")
    sparse = os.path.join(data_dir, "colmap", "sparse")
    gpu = "1" if use_gpu else "0"
    return [
        f"colmap feature_extractor --database_path {db} --image_path {rgb} "
        f"--ImageReader.single_camera 1 --SiftExtraction.use_gpu {gpu}",
        f"colmap exhaustive_matcher --database_path {db} "
        f"--SiftMatching.guided_matching 1 --SiftMatching.use_gpu {gpu}",
        f"colmap point_triangulator --database_path {db} --image_path {rgb} "
        f"--input_path {sparse} --output_path {sparse}",
        f"colmap model_converter --input_path={sparse} --output_path={sparse} "
        f"--output_type=TXT",
    ]


def run_colmap(data_dir: str, use_gpu: bool = False, dry_run: bool = False):
    cmds = colmap_commands(data_dir, use_gpu)
    if dry_run or shutil.which("colmap") is None:
        print("colmap binary not found (or --dry_run); run these manually:")
        for c in cmds:
            print(" ", c)
        return cmds
    for c in cmds:
        subprocess.run(c, shell=True, check=True)
    return cmds


def main(argv=None):
    p = argparse.ArgumentParser(description="Prepare ScanNet scenes for NeRF.")
    p.add_argument("--scannet_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--num_scenes", type=int, default=None)
    p.add_argument("--num_train_samples", type=int, default=100)
    p.add_argument("--num_val_samples", type=int, default=20)
    p.add_argument("--run_colmap", action="store_true")
    args = p.parse_args(argv)

    scenes = sorted(
        d for d in os.listdir(args.scannet_path)
        if os.path.isdir(os.path.join(args.scannet_path, d))
    )
    if args.num_scenes:
        scenes = scenes[: args.num_scenes]
    for scene in scenes:
        out = os.path.join(args.output_path, scene)
        train, val = prepare_scene(
            os.path.join(args.scannet_path, scene), out,
            args.num_train_samples, args.num_val_samples)
        print(f"{scene}: {len(train)} train / {len(val)} val frames")
        if args.run_colmap:
            run_colmap(out)


if __name__ == "__main__":
    main()
