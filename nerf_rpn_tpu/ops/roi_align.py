"""Rotated 3D ROI align / pool as differentiable gather-interp (TPU-native).

Replaces the reference's CUDA ``ROIAlignRotated3D``
(``model/rotated_align/cuda_3d/ROIAlignRotated3D_cuda.cu``) and the pure-torch
``ROIPool.rotated_forward`` / ``normal_forward`` paths
(``model/detector.py:264-438``): for each output bin, sample a fixed grid of
points in the RoI's local frame, rotate about z by theta, trilinear-gather
from the feature volume and reduce (mean for align, max for pooling parity).

Differences from the reference, by design (SURVEY 2.9 replacement note):
- theta is in RADIANS (the CUDA kernel took degrees; every other caller in
  the system uses radians — keeping one convention removes the footgun).
- the backward pass is jax autodiff through the gather (the reference's
  hand-written backward indexes length with width — a stride bug we do not
  reproduce).
- sampling_ratio is a static sample count per bin axis (the reference's
  adaptive ceil(roi_dim/pooled_dim) is data-dependent and unjittable);
  out-of-bounds samples contribute zero, matching the kernel's bounds check.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def trilinear_gather(volume: jax.Array, pts: jax.Array) -> jax.Array:
    """Sample (X, Y, Z, C) at float coords pts (..., 3); zero outside."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    sx, sy, sz, _ = volume.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    out = 0.0
    in_bounds = (
        (x >= 0) & (x <= sx - 1) & (y >= 0) & (y <= sy - 1)
        & (z >= 0) & (z <= sz - 1)
    )
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                xi = jnp.clip(x0 + dx, 0, sx - 1).astype(jnp.int32)
                yi = jnp.clip(y0 + dy, 0, sy - 1).astype(jnp.int32)
                zi = jnp.clip(z0 + dz, 0, sz - 1).astype(jnp.int32)
                w = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                out = out + volume[xi, yi, zi] * w[..., None]
    return out * in_bounds[..., None]


def _roi_sample_points(
    rois: jax.Array, output_size: tuple, sampling_ratio: int
) -> jax.Array:
    """Sample coordinates for each RoI.

    rois: (R, 7) [cx, cy, cz, w, l, h, theta] in feature-grid coordinates.
    Returns (R, ox, oy, oz, S^3, 3) float coords.
    """
    ox, oy, oz = output_size
    s = sampling_ratio
    ctr = rois[:, 0:3]
    dims = rois[:, 3:6]
    theta = rois[:, 6]

    def axis_offsets(n_bins, idx_axis):
        # bin centres subdivided s times: ((b + (k+0.5)/s) / n_bins - 0.5)
        b = jnp.arange(n_bins, dtype=jnp.float32)
        k = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        return (b[:, None] + k[None, :]) / n_bins - 0.5  # (n_bins, s)

    fx = axis_offsets(ox, 0)  # (ox, s)
    fy = axis_offsets(oy, 1)
    fz = axis_offsets(oz, 2)
    # local fractional offsets (ox, oy, oz, s, s, s, 3)
    lx = fx[:, None, None, :, None, None]
    ly = fy[None, :, None, None, :, None]
    lz = fz[None, None, :, None, None, :]
    lx, ly, lz = jnp.broadcast_arrays(lx, ly, lz)
    local = jnp.stack([lx, ly, lz], axis=-1).reshape(ox, oy, oz, s ** 3, 3)

    # scale to RoI dims, rotate about z, translate to centre
    scaled = local[None] * dims[:, None, None, None, None, :]  # (R, ...)
    cos = jnp.cos(theta)[:, None, None, None, None]
    sin = jnp.sin(theta)[:, None, None, None, None]
    rx = scaled[..., 0] * cos - scaled[..., 1] * sin
    ry = scaled[..., 0] * sin + scaled[..., 1] * cos
    pts = jnp.stack([rx, ry, scaled[..., 2]], axis=-1)
    return pts + ctr[:, None, None, None, None, :]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "mode"))
def roi_align_rotated_3d(
    features: jax.Array,
    rois: jax.Array,
    spatial_scale: float = 1.0,
    output_size: tuple = (4, 4, 4),
    sampling_ratio: int = 2,
    mode: str = "avg",
) -> jax.Array:
    """(X, Y, Z, C) features + (R, 7) OBB rois (mesh coords) ->
    (R, ox, oy, oz, C).

    ``spatial_scale`` divides the roi coordinates into feature-grid units
    (the reference passes 1/spatial_scale per level, ``detector.py:260``).
    mode 'avg' = ROIAlign semantics; 'max' = max-pool parity with the
    reference's pooling path.
    """
    r = rois.at[:, 0:6].multiply(1.0 / spatial_scale)
    pts = _roi_sample_points(r, output_size, sampling_ratio)  # (R,ox,oy,oz,S,3)
    vals = trilinear_gather(features, pts)  # (R, ox, oy, oz, S, C)
    if mode == "avg":
        return jnp.mean(vals, axis=-2)
    if mode == "max":
        return jnp.max(vals, axis=-2)
    raise ValueError(mode)


def multilevel_roi_align(
    features: list[jax.Array],
    rois: jax.Array,
    levels: jax.Array,
    valid: jax.Array,
    spatial_scales: tuple,
    output_size: tuple = (4, 4, 4),
    sampling_ratio: int = 2,
    mode: str = "avg",
    rotated: bool = True,
    enlarge_scale: float = 0.2,
) -> jax.Array:
    """RoI features from an FPN pyramid (fixed shapes).

    features: per-level (X_l, Y_l, Z_l, C); rois: (R, 6|7) in mesh coords;
    levels: (R,) int; valid: (R,) bool.  Invalid rois produce zeros.  RoIs
    are enlarged by (1 + enlarge_scale) like reference ``enlarge_roi``
    (``detector.py:195-211``).

    TPU note: all levels are flattened into ONE (sum V_l, C) row buffer
    (axis merges on the major axes are free) and each RoI gathers its 8
    trilinear corners at its OWN level via a per-roi base offset + per-roi
    strides.  TPU gathers/scatters serialize per row, so this is 4x fewer
    rows than the earlier pool-from-every-level-and-select formulation —
    the r5 trace of the RCNN fine-tune train step showed that version
    spending 42 ms/step (of 108) in 32 gather + ~30 scatter fusions
    (benchmarks/trace_rcnn_train.py); the math per selected level is
    unchanged (same coords, corners and weights).
    """
    c = features[0].shape[-1]
    dims = np.asarray([f.shape[:3] for f in features], np.int32)  # (L, 3)
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    return _roi_align_flat(
        flat, dims, rois, levels, valid, None, 1, spatial_scales,
        output_size, sampling_ratio, mode, rotated, enlarge_scale)


def multilevel_roi_align_batched(
    features: list[jax.Array],
    rois: jax.Array,
    levels: jax.Array,
    valid: jax.Array,
    spatial_scales: tuple,
    output_size: tuple = (4, 4, 4),
    sampling_ratio: int = 2,
    mode: str = "avg",
    rotated: bool = True,
    enlarge_scale: float = 0.2,
) -> jax.Array:
    """Batched :func:`multilevel_roi_align`: features (B, X_l, Y_l, Z_l, C),
    rois (B, R, 6|7), levels/valid (B, R) -> (B, R, ox, oy, oz, C).

    Prefer this over ``vmap(multilevel_roi_align)`` in train/eval steps, and
    note the buffer is LEVEL-major — ``concat([f.reshape(B*V_l, C)])`` —
    not scene-major: each piece is then a free reshape view of its conv
    output, so layout assignment keeps the backbone/FPN in natural
    channel-minor layouts.  Both a vmapped per-scene gather and a
    scene-major (B*V, C) buffer made XLA lay the whole FPN out
    batch-second-minor (to make the buffer build free), which put the
    batch=2 dim in the sublane tile — T(2,128) — and knocked the level-0
    3^3 conv backward to 35% MFU (r5 traces,
    benchmarks/trace_rcnn_train.py)."""
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    dims = np.asarray([f.shape[1:4] for f in features], np.int32)
    flat = jnp.concatenate(
        [f.reshape(-1, c) for f in features], axis=0)  # (sum B*V_l, C)
    scene_id = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)  # (B*R,)
    pooled = _roi_align_flat(
        flat, dims, rois.reshape(b * r, rois.shape[-1]),
        levels.reshape(b * r), valid.reshape(b * r), scene_id, b,
        spatial_scales, output_size, sampling_ratio, mode, rotated,
        enlarge_scale)
    return pooled.reshape(b, r, *pooled.shape[1:])


def _roi_align_flat(
    flat: jax.Array,
    dims: np.ndarray,
    rois: jax.Array,
    levels: jax.Array,
    valid: jax.Array,
    scene_id,
    n_scenes: int,
    spatial_scales: tuple,
    output_size: tuple,
    sampling_ratio: int,
    mode: str,
    rotated: bool,
    enlarge_scale: float,
) -> jax.Array:
    """Shared core: gather RoI bins from a flattened LEVEL-major concat
    (each level block holds its ``n_scenes`` scene sub-blocks back to
    back; ``scene_id`` is the per-roi scene index, None when
    n_scenes == 1)."""
    if rotated:
        obb = rois
    else:  # AABB -> centre/size, theta = 0
        ctr = (rois[:, 0:3] + rois[:, 3:6]) / 2
        size = rois[:, 3:6] - rois[:, 0:3]
        obb = jnp.concatenate([ctr, size, jnp.zeros((rois.shape[0], 1))], axis=-1)
    obb = obb.at[:, 3:6].multiply(1.0 + enlarge_scale)

    n_levels = len(dims)
    sizes = dims.prod(axis=1)
    offsets = np.concatenate(
        [[0], np.cumsum(sizes * n_scenes)[:-1]]).astype(np.int32)

    lvl = jnp.clip(levels, 0, n_levels - 1)
    in_range = (levels >= 0) & (levels < n_levels)
    scale = jnp.asarray(np.asarray(spatial_scales, np.float32))[lvl]  # (R,)
    dim_r = jnp.asarray(dims)[lvl]          # (R, 3)
    off_r = jnp.asarray(offsets)[lvl]       # (R,)
    if scene_id is not None:
        off_r = off_r + scene_id * jnp.asarray(sizes.astype(np.int32))[lvl]

    r = obb.at[:, 0:6].multiply((1.0 / scale)[:, None])
    pts = _roi_sample_points(r, output_size, sampling_ratio)
    # (R, ox, oy, oz, S^3, C)
    vals = _trilinear_gather_levels(flat, pts, dim_r, off_r)
    if mode == "avg":
        pooled = jnp.mean(vals, axis=-2)
    elif mode == "max":
        pooled = jnp.max(vals, axis=-2)
    else:
        raise ValueError(mode)
    sel = in_range & valid
    return pooled * sel.astype(pooled.dtype)[:, None, None, None, None]


def _trilinear_gather_levels(
    flat: jax.Array, pts: jax.Array, dims: jax.Array, off: jax.Array
) -> jax.Array:
    """Trilinear sample a flattened level concat at per-roi levels.

    flat: (sum V_l, C) row buffer; pts: (R, ..., 3) float coords in the
    roi's own level grid; dims: (R, 3) that level's (X, Y, Z); off: (R,)
    that level's base row offset.  Zero outside the level bounds — same
    contract as :func:`trilinear_gather` per level.
    """
    extra = pts.ndim - 2  # broadcast dims between R and the coord axis
    ix = (slice(None),) + (None,) * extra
    sx = dims[(*ix, 0)].astype(pts.dtype)
    sy = dims[(*ix, 1)].astype(pts.dtype)
    sz = dims[(*ix, 2)].astype(pts.dtype)
    syi = dims[(*ix, 1)]
    szi = dims[(*ix, 2)]
    base = off[ix]
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    in_bounds = (
        (x >= 0) & (x <= sx - 1) & (y >= 0) & (y <= sy - 1)
        & (z >= 0) & (z <= sz - 1)
    )
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                xi = jnp.clip(x0 + dx, 0, sx - 1).astype(jnp.int32)
                yi = jnp.clip(y0 + dy, 0, sy - 1).astype(jnp.int32)
                zi = jnp.clip(z0 + dz, 0, sz - 1).astype(jnp.int32)
                w = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                idx = base + (xi * syi + yi) * szi + zi
                out = out + flat[idx] * w[..., None]
    return out * in_bounds[..., None]


def map_rois_to_levels(
    boxes: jax.Array,
    k_min: int,
    k_max: int,
    canonical_scale: int = 160,
    canonical_level: int = 4,
    eps: float = 1e-6,
) -> jax.Array:
    """FPN paper eqn-1 level assignment from cube-root box volume
    (reference ``LevelMapper``, ``model/level_mapper.py:21-77``).

    boxes: (..., 6|7); returns level indices relative to k_min (0-based).
    """
    if boxes.shape[-1] == 7:
        vol = jnp.prod(boxes[..., 3:6], axis=-1)
    else:
        vol = jnp.prod(boxes[..., 3:6] - boxes[..., 0:3], axis=-1)
    s = jnp.cbrt(vol)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale) + eps)
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def map_rois_to_levels_np(
    boxes,
    k_min: int,
    k_max: int,
    canonical_scale: int = 160,
    canonical_level: int = 4,
    eps: float = 1e-6,
):
    """Numpy twin of :func:`map_rois_to_levels` for HOST input pipelines.

    The stage-2 collate runs on the host per training batch; calling the jnp
    version there costs a device round-trip per batch (~26 ms through this
    image's TPU tunnel).  Same float32 arithmetic, same results
    (``test_second_stage.py`` asserts elementwise equality vs the jnp
    version).
    """
    import numpy as np

    boxes = np.asarray(boxes, np.float32)
    if boxes.shape[-1] == 7:
        vol = np.prod(boxes[..., 3:6], axis=-1)
    else:
        vol = np.prod(boxes[..., 3:6] - boxes[..., 0:3], axis=-1)
    s = np.cbrt(vol)
    with np.errstate(divide="ignore", invalid="ignore"):
        lvl = np.floor(
            np.float32(canonical_level)
            + np.log2(s / np.float32(canonical_scale))
            + np.float32(eps))
    lvl = np.clip(np.nan_to_num(lvl, nan=k_min, neginf=k_min, posinf=k_max),
                  k_min, k_max)
    return (lvl - k_min).astype(np.int32)
