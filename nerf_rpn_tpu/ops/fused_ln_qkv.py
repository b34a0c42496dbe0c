"""Fused LayerNorm + window-partition + qkv projection (Pallas TPU kernel).

The one remaining named idea from the r3 stages-unit roofline
(benchmarks/README.md): in the conv-free Swin stages compile unit the
chain ``LN(norm1) -> _window_partition -> qkv Dense`` lowers to an XLA
fusion whose strided window gather runs at ~50 GB/s (~1.3 ms of the
24.5 ms forward at the bench shape).  This kernel replaces the HBM
shuffle with windowed BlockSpec DMAs: the grid walks (batch, wx-block,
wy-block) tiles, each step

  1. reads a (wx, wy, Z, C) strided block of the (B, X, Y, Z, C) grid,
  2. applies LayerNorm over C in f32 (eps 1e-5, matching flax),
  3. right-multiplies by the packed qkv weight (C, 3C) on the MXU, and
  4. writes the z-column of windows in window-partition order, so the
     (W, N, 3C) tensor the attention kernel consumes is produced
     directly — the partition transpose never exists in HBM.

Semantics twin: :func:`ln_partition_qkv_reference` (pure jnp, identical
to the model path in ``models/swin.py`` — LN, ``_window_partition``,
``nn.Dense(3C)``).  Exactness is asserted by tests in interpret mode and
on TPU; the A/B lives in ``benchmarks/microbench_lnqkv.py``.

MEASURED RESULT (r4, real TPU): the kernel TIES the XLA chain exactly
(stage0 1.649 vs 1.639/1.687 ms, stage1 1.455 vs 1.446/1.441; bit-exact
at stage0).  Both run ~45 GB/s — the strided (wx, wy)-window access
pattern is the memory-system floor, and windowed BlockSpec DMAs pay the
same per-window descriptor cost the XLA gather does.  NOT wired into the
model (Pallas custom calls also poison conv layouts at graph scale, see
ops/window_attention.py history); kept as an exactness-tested pinned
dead end so later rounds don't re-walk it.

Reference parity context: the torch reference computes the same chain as
separate ops (``model/feature_extractor.py`` SwinTransformerBlock3D:
norm1 -> window_partition -> qkv Linear); this fusion is a TPU-side
execution detail with identical numerics.

Layout strategies (Mosaic rejects some reshapes; pick at call time):
- ``out_layout="w8"``: output (B*nWx*nWy*nWz, wx, wy, wz, 3C); the
  in-kernel op is a major-dim transpose only (no sublane/lane reshape).
  The caller merges (wx, wy, wz) -> N outside the kernel.
- ``out_layout="flat"``: output (W, N, 3C) directly; requires the
  in-kernel (nz, wx, wy, wz, 3C) -> (nz, N, 3C) sublane merge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ln_partition_qkv_reference(
    x: jax.Array,          # (B, X, Y, Z, C), window-divisible
    ln_scale: jax.Array,   # (C,)
    ln_bias: jax.Array,    # (C,)
    w: jax.Array,          # (C, 3C) packed qkv weight
    b: jax.Array,          # (3C,)
    window: tuple[int, int, int],
    dtype=jnp.bfloat16,
) -> jax.Array:
    """jnp semantics twin: LN -> window partition -> qkv matmul."""
    eps = 1e-5
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = (h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    h = h.astype(dtype)
    bsz, sx, sy, sz, c = x.shape
    wx, wy, wz = window
    h = h.reshape(bsz, sx // wx, wx, sy // wy, wy, sz // wz, wz, c)
    h = h.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    h = h.reshape(-1, wx * wy * wz, c)
    y = jnp.dot(h, w.astype(dtype), preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(dtype)


def _kernel(x_ref, s_ref, t_ref, w_ref, b_ref, out_ref, *, window, flat):
    wx, wy, wz = window
    x = x_ref[0]                                   # (wx, wy, Z, C)
    _, _, z, c = x.shape
    nz = z // wz
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    h = h * s_ref[0].astype(jnp.float32) + t_ref[0].astype(jnp.float32)
    h = h.astype(x.dtype)
    # (wx, wy, Z, C) @ (C, 3C) -> (wx, wy, Z, 3C), f32 accumulation
    y = jax.lax.dot_general(
        h, w_ref[:],
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)
    c3 = y.shape[-1]
    # z-split (sublane split) + major transpose into window order
    y = y.reshape(wx, wy, nz, wz, c3)
    y = y.transpose(2, 0, 1, 3, 4)                 # (nz, wx, wy, wz, 3C)
    if flat:
        out_ref[:] = y.reshape(nz, wx * wy * wz, c3)
    else:
        out_ref[:] = y


@partial(jax.jit, static_argnames=("window", "out_layout", "interpret"))
def ln_partition_qkv(
    x: jax.Array,          # (B, X, Y, Z, C), window-divisible
    ln_scale: jax.Array,   # (C,)
    ln_bias: jax.Array,    # (C,)
    w: jax.Array,          # (C, 3C)
    b: jax.Array,          # (3C,)
    window: tuple[int, int, int],
    out_layout: str = "flat",
    interpret: bool = False,
) -> jax.Array:
    """Returns (W, N, 3C) in window-partition order (W = B * nWindows).

    ``out_layout="w8"`` returns (W, wx, wy, wz, 3C) instead; callers
    reshape outside (free major merge for the attention kernel's
    (W, N, 3C) view when the layout cooperates).
    """
    bsz, sx, sy, sz, c = x.shape
    wx, wy, wz = window
    assert sx % wx == 0 and sy % wy == 0 and sz % wz == 0
    nx, ny, nz = sx // wx, sy // wy, sz // wz
    n = wx * wy * wz
    c3 = w.shape[1]
    nw = bsz * nx * ny * nz

    grid = (bsz, nx, ny)
    in_specs = [
        pl.BlockSpec((1, wx, wy, sz, c), lambda bb, i, j: (bb, i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c3), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if out_layout == "flat":
        out_spec = pl.BlockSpec(
            (nz, n, c3),
            lambda bb, i, j, _ny=ny, _nx=nx: ((bb * _nx + i) * _ny + j, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nw, n, c3), x.dtype)
    elif out_layout == "w8":
        out_spec = pl.BlockSpec(
            (nz, wx, wy, wz, c3),
            lambda bb, i, j, _ny=ny, _nx=nx: ((bb * _nx + i) * _ny + j,
                                              0, 0, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nw, wx, wy, wz, c3), x.dtype)
    else:
        raise ValueError(out_layout)

    out = pl.pallas_call(
        partial(_kernel, window=window, flat=(out_layout == "flat")),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w,
      b.reshape(1, c3))
    return out
