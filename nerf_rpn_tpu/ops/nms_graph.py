"""Pallas TPU kernel: packed AABB suppression graph for NMS.

Builds, in one pass, the bitmask matrix ``M[j, w]`` (bit c of word w set
iff the score-earlier box ``32w + c`` overlaps box j past the IoU
threshold) that ``ops/nms.nms_mask`` iterates to its fixpoint.  The XLA
path builds it in ``row_chunk``-sized ``lax.map`` steps (a while loop of
small kernels, ~1.4 ms at the bench's 4x2560 problem); here the pair IoUs
run on the VPU over full (row_tile, Np) tiles and the bit-packing is four
bf16 MXU matmuls against constant power-of-two matrices, one per byte of
the packed word (f32 accumulation of one-hot bf16 inputs is exact: each
byte sums distinct powers <= 128).

Mosaic notes: all temporaries are 2-D (R, Np) broadcasts built from
(R, 1) row-coordinate and (1, Np) column-coordinate slices — the column
coordinates arrive pre-transposed as (6, Np) so no in-kernel transpose or
3-D small-axis tensor ever exists.

Safe to use inside the proposal-generation programs: they contain no
convolutions, so the custom call cannot trigger the conv/layout poison
documented in ``models/swin.py``.

Measured result (v5e): exact parity with the XLA build, but ~2.6 ms for
the vmapped 4x2560 bench problem vs ~1.5 ms for the chunked XLA path —
at this candidate count the problem is too small for the kernel's DMA /
grid overheads.  ``nms_mask`` therefore keeps the XLA build by default
(opt in with ``NERF_RPN_TPU_NMS_GRAPH_KERNEL=1``); the kernel stays as
the harness for larger candidate counts.

Semantics twin: ``suppression_graph_reference`` (tested for exact
equality, including the padded-row guards).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WORD = 32


def _kernel(cols_t_ref, rows_ref, pk_ref, out_ref, *, thresh,
            row_tile):
    t = pl.program_id(0)
    rows = rows_ref[:]                        # (R, 6)
    ct = cols_t_ref[:]                        # (6, Np)

    def rc(i):  # (R, 1), (1, Np) coordinate pair
        return rows[:, i:i + 1], ct[i:i + 1, :]

    inter = None
    va = jnp.ones((rows.shape[0], 1), jnp.float32)
    vb = jnp.ones((1, ct.shape[1]), jnp.float32)
    for ax in range(3):
        r_lo, c_lo = rc(ax)
        r_hi, c_hi = rc(ax + 3)
        ext = jnp.maximum(jnp.minimum(r_hi, c_hi) - jnp.maximum(r_lo, c_lo),
                          0.0)                # (R, Np)
        inter = ext if inter is None else inter * ext
        va = va * jnp.maximum(r_hi - r_lo, 0.0)
        vb = vb * jnp.maximum(c_hi - c_lo, 0.0)
    union = va + vb - inter
    iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-30), 0.0)

    # float iotas: an i1 mask mixing f32-compare and i32-compare operands
    # needs a relayout Mosaic can't do ((8,128) vs (16,128) tiles); both
    # index counts are < 2^24 so f32 comparison is exact
    gr = (jnp.float32(t * row_tile)
          + jax.lax.broadcasted_iota(jnp.int32, iou.shape, 0)
          .astype(jnp.float32))
    gc = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1).astype(jnp.float32)
    # select in f32 (mask and payload share the (8,128) layout), THEN cast
    # to bf16 — selecting bf16 directly needs an i1 relayout to (16,128)
    # tiles that Mosaic rejects
    ov = jnp.where((iou > thresh) & (gc < gr), 1.0, 0.0).astype(jnp.bfloat16)
    # four bf16 MXU matmuls, one per byte of the packed word: each packs
    # 8 distinct powers <= 128, so f32 accumulation of bf16 one-hot inputs
    # is exact (sums <= 255)
    word = None
    for k in range(4):
        part = jax.lax.dot(ov, pk_ref[k],
                           preferred_element_type=jnp.float32)  # (R, W)
        p_i = part.astype(jnp.int32) << (8 * k)
        word = p_i if word is None else word | p_i
    out_ref[:] = jax.lax.bitcast_convert_type(word, jnp.uint32)


def _pack_mats(np_: int) -> np.ndarray:
    """(4, Np, Np/32) bf16 packing matrices, one per byte of the word."""
    w = np_ // _WORD
    c_idx = np.arange(np_)
    pk = np.zeros((4, np_, w), np.float32)
    byte = (c_idx % _WORD) // 8
    pk[byte, c_idx, c_idx // _WORD] = 2.0 ** (c_idx % 8)
    return pk.astype(np.float32)


@partial(jax.jit, static_argnames=("iou_threshold", "row_tile", "interpret"))
def suppression_graph(boxes: jax.Array, iou_threshold: float,
                      row_tile: int = 256,
                      interpret: bool = False) -> jax.Array:
    """(Np, 6) score-sorted AABBs -> packed uint32 (Np, Np/32) graph.

    Np must be a multiple of max(row_tile, 32); zero-padded rows produce
    zero-area boxes which never overlap anything (union guard above).
    ``iou_threshold`` is static (it is a config constant in every caller).
    """
    np_, d = boxes.shape
    assert d == 6 and np_ % row_tile == 0 and np_ % _WORD == 0
    w = np_ // _WORD
    pk = _pack_mats(np_)
    kernel = partial(_kernel, thresh=float(iou_threshold),
                     row_tile=row_tile)
    return pl.pallas_call(
        kernel,
        grid=(np_ // row_tile,),
        in_specs=[
            pl.BlockSpec((6, np_), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 6), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, np_, w), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, w), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, w), jnp.uint32),
        interpret=interpret,
    )(boxes.T, boxes, jnp.asarray(pk, jnp.bfloat16))


def suppression_graph_reference(boxes: jax.Array,
                                iou_threshold) -> jax.Array:
    """jnp semantics twin of :func:`suppression_graph`."""
    np_ = boxes.shape[0]
    lo = jnp.maximum(boxes[:, None, 0:3], boxes[None, :, 0:3])
    hi = jnp.minimum(boxes[:, None, 3:6], boxes[None, :, 3:6])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    va = jnp.prod(jnp.maximum(boxes[:, 3:6] - boxes[:, 0:3], 0.0), axis=-1)
    union = va[:, None] + va[None, :] - inter
    iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-30), 0.0)
    pos = jnp.arange(np_)
    ov = (iou > iou_threshold) & (pos[None, :] < pos[:, None])
    powers = (jnp.uint32(1) << jnp.arange(_WORD, dtype=jnp.uint32))
    words = ov.reshape(np_, -1, _WORD).astype(jnp.uint32)
    return jnp.sum(words * powers, axis=-1, dtype=jnp.uint32)
