"""NeRF -> rgbsigma voxel-grid feature extraction.

Parity target: the reference's patched dense-depth-priors ``run_nerf.py``
``extract`` task (``data/scannet/run_nerf.py:1144-1210``): build a grid of
``max_res`` samples inside the scene bbox, query the NeRF at every grid
point (mean RGB over training poses via sigmoid, raw sigma), and save an
``rgbsigma`` npz in the RPN input layout ``(W, L, H, C)``.

The reference is welded to one specific torch NeRF; here extraction is a
generic batched orchestrator: pass any jax-callable
``nerf_fn(points (N, 3)) -> (rgb (N, 3), sigma (N,))`` and it handles grid
construction, chunked device batching, and npz writing — usable for any
NeRF re-implementation (instant-ngp grids, dense-depth-priors, ...).
"""

from __future__ import annotations

import numpy as np


def build_sample_grid(bbox_min, bbox_max, max_res: int):
    """Voxel-centre sample points.

    Returns (points (W*L*H, 3) float32, resolution (3,) int) where the
    longest bbox side gets ``max_res`` samples and the others scale
    proportionally (the reference's grid construction).
    """
    bbox_min = np.asarray(bbox_min, np.float64)
    bbox_max = np.asarray(bbox_max, np.float64)
    diag = bbox_max - bbox_min
    res = np.round(diag / diag.max() * max_res).astype(int)
    res = np.maximum(res, 1)
    axes = [
        bbox_min[i] + (np.arange(res[i]) + 0.5) / res[i] * diag[i]
        for i in range(3)
    ]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.float32), res


def extract_rgbsigma(
    nerf_fn,
    bbox_min,
    bbox_max,
    max_res: int = 160,
    chunk: int = 65536,
    output_file: str | None = None,
    extra_arrays: dict | None = None,
):
    """Query ``nerf_fn`` over the grid and assemble (W, L, H, 4) rgbsigma.

    ``nerf_fn(points (N, 3)) -> (rgb (N, 3) in [0, 1], sigma (N,) raw)``.
    When ``output_file`` is given, writes the npz with rgbsigma, resolution,
    bbox_min/bbox_max plus any ``extra_arrays`` (scale/offset/from_mitsuba
    for the ngp pipelines).
    """
    points, res = build_sample_grid(bbox_min, bbox_max, max_res)
    n = points.shape[0]
    out = np.zeros((n, 4), np.float32)
    for start in range(0, n, chunk):
        pts = points[start : start + chunk]
        rgb, sigma = nerf_fn(pts)
        out[start : start + chunk, :3] = np.asarray(rgb)
        out[start : start + chunk, 3] = np.asarray(sigma).reshape(-1)
    rgbsigma = out.reshape(*res, 4)
    if output_file is not None:
        payload = {
            "rgbsigma": rgbsigma,
            "resolution": np.asarray(res),
            "bbox_min": np.asarray(bbox_min, np.float32),
            "bbox_max": np.asarray(bbox_max, np.float32),
        }
        payload.update(extra_arrays or {})
        np.savez_compressed(output_file, **payload)
    return rgbsigma, res
