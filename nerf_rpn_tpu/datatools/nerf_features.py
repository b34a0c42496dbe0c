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


def build_sample_grid(bbox_min, bbox_max, max_res: int, centers: bool = True):
    """Sample points over the scene bbox.

    Returns (points (W*L*H, 3) float32, resolution (3,) int) where the
    longest bbox side gets ``max_res`` samples and the others scale
    proportionally (reference resolution rule, ``run_nerf.py:1160-1162``).
    ``centers=True`` samples voxel centres; ``centers=False`` reproduces the
    reference's endpoint-inclusive ``linspace(min, max, res)`` positions
    (``run_nerf.py:1167-1169``).
    """
    bbox_min = np.asarray(bbox_min, np.float64)
    bbox_max = np.asarray(bbox_max, np.float64)
    diag = bbox_max - bbox_min
    res = np.round(diag / diag.max() * max_res).astype(int)
    res = np.maximum(res, 1)
    if centers:
        axes = [
            bbox_min[i] + (np.arange(res[i]) + 0.5) / res[i] * diag[i]
            for i in range(3)
        ]
    else:
        axes = [np.linspace(bbox_min[i], bbox_max[i], res[i])
                for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.float32), res


def grid_to_ddp_flat(rgbsigma: np.ndarray) -> np.ndarray:
    """(W, L, H, C) grid -> the reference extractor's flat (W*L*H, C) layout.

    The reference flattens ``meshgrid(z, y, x)`` row-major
    (``run_nerf.py:1171-1172``), so the flat index is
    ``(iz * L + iy) * W + ix`` — x fastest.
    """
    return np.ascontiguousarray(rgbsigma.transpose(2, 1, 0, 3)).reshape(
        -1, rgbsigma.shape[-1])


def ddp_flat_to_grid(flat: np.ndarray, resolution) -> np.ndarray:
    """Inverse of :func:`grid_to_ddp_flat`: a reference-produced flat
    ``rgbsigma`` + its ``resolution=(W, L, H)`` -> our (W, L, H, C) grid."""
    w, l, h = (int(r) for r in resolution)
    return np.ascontiguousarray(
        flat.reshape(h, l, w, flat.shape[-1]).transpose(2, 1, 0, 3))


def extract_rgbsigma(
    nerf_fn,
    bbox_min,
    bbox_max,
    max_res: int = 160,
    chunk: int = 65536,
    output_file: str | None = None,
    extra_arrays: dict | None = None,
    centers: bool = True,
    ddp_layout: bool = False,
):
    """Query ``nerf_fn`` over the grid and assemble (W, L, H, 4) rgbsigma.

    ``nerf_fn(points (N, 3)) -> (rgb (N, 3) in [0, 1], sigma (N,) raw)``.
    When ``output_file`` is given, writes the npz with rgbsigma, resolution,
    bbox_min/bbox_max plus any ``extra_arrays`` (scale/offset/from_mitsuba
    for the ngp pipelines).  ``ddp_layout=True`` writes the reference
    dense-depth-priors contract instead (``run_nerf.py:1144-1155``): flat
    (W*L*H, 4) rgbsigma with x-fastest ordering, plus
    scale/offset/from_mitsuba/from_ddp_nerf fields.
    """
    points, res = build_sample_grid(bbox_min, bbox_max, max_res,
                                    centers=centers)
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
            "rgbsigma": grid_to_ddp_flat(rgbsigma) if ddp_layout else rgbsigma,
            "resolution": np.asarray(res),
            "bbox_min": np.asarray(bbox_min, np.float32),
            "bbox_max": np.asarray(bbox_max, np.float32),
        }
        if ddp_layout:
            payload.update(scale=1.0, offset=0.0, from_mitsuba=False,
                           from_ddp_nerf=True)
        payload.update(extra_arrays or {})
        np.savez_compressed(output_file, **payload)
    return rgbsigma, res
