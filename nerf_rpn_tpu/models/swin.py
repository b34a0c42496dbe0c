"""3D Swin Transformer FPN backbone (flax.linen, NDHWC).

Parity target: reference ``SwinTransformer_FPN``
(``model/feature_extractor.py:380-800``): Conv3d patch embed (4^3), four
stages of shifted-window attention blocks with 3D relative position bias,
8-neighbour PatchMerging between stages, stochastic depth, and an FPN neck
over the stage outputs.  Variants (driver table, ``run_rpn.py:282-292``):

    swin_t: embed 96,  depths (2,2,6,2),  heads (3,6,12,24)
    swin_s: embed 96,  depths (2,2,18,2), heads (3,6,12,24)
    swin_b: embed 128, depths (2,2,18,2), heads (3,6,12,24)
    swin_l: embed 192, depths (2,2,18,2), heads (6,12,24,48)

TPU re-design notes:
- Window partition is pure reshape/transpose; the attention over 4^3 = 64
  token windows is a batched einsum the MXU eats directly (all windows of
  all batches form one big batch dim).
- Everything shape-dependent (relative-position index, shifted-window
  attention mask) is precomputed in numpy at trace time — shapes are static
  under jit, so no device-side mask construction at step time.
- The cyclic shift is ``jnp.roll`` (an XLA-native rotate, no host sync).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.models.fpn import FPN
from nerf_rpn_tpu.ops.activations import erf_gelu

SWIN_VARIANTS = {
    "swin_t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_s": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swin_l": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


@lru_cache(maxsize=None)
def _relative_position_index(window: tuple[int, int, int]) -> np.ndarray:
    """Flat (N*N,) index into the (2w-1)^3 bias table for each token pair.
    Same indexing scheme as the reference (including its row-major packing)."""
    wx, wy, wz = window
    coords = np.stack(
        np.meshgrid(np.arange(wx), np.arange(wy), np.arange(wz), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wx - 1
    rel[:, :, 1] += wy - 1
    rel[:, :, 2] += wz - 1
    rel[:, :, 0] *= (2 * wz - 1) * (2 * wy - 1)
    rel[:, :, 1] *= 2 * wz - 1
    return rel.sum(-1).reshape(-1)


@lru_cache(maxsize=None)
def _relative_position_onehot(window: tuple[int, int, int]) -> np.ndarray:
    """(N*N, (2w-1)^3) one-hot of :func:`_relative_position_index`.

    ``table[idx]`` is a serialized TPU gather — ~1.4 ms per block at 4^3
    windows in the traced FCOS forward (``benchmarks/trace_forward.py``);
    as ``onehot @ table`` it is one tiny MXU matmul against a trace-time
    constant."""
    idx = _relative_position_index(window)
    size = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
    onehot = np.zeros((idx.shape[0], size), np.float32)
    onehot[np.arange(idx.shape[0]), idx] = 1.0
    return onehot


@lru_cache(maxsize=None)
def _shift_attn_mask(
    pad_size: tuple[int, int, int],
    window: tuple[int, int, int],
    shift: tuple[int, int, int],
) -> np.ndarray | None:
    """(num_windows, N, N) additive mask (-100 where tokens belong to
    different pre-shift regions), or None when no shift is active."""
    if sum(shift) == 0:
        return None
    px, py, pz = pad_size
    region = np.zeros(pad_size, np.float32)
    count = 0
    for xs in ((0, px - window[0]), (px - window[0], px - shift[0]), (px - shift[0], px)):
        for ys in ((0, py - window[1]), (py - window[1], py - shift[1]), (py - shift[1], py)):
            for zs in ((0, pz - window[2]), (pz - window[2], pz - shift[2]), (pz - shift[2], pz)):
                region[xs[0]:xs[1], ys[0]:ys[1], zs[0]:zs[1]] = count
                count += 1
    nx, ny, nz = px // window[0], py // window[1], pz // window[2]
    region = region.reshape(nx, window[0], ny, window[1], nz, window[2])
    region = region.transpose(0, 2, 4, 1, 3, 5).reshape(nx * ny * nz, -1)
    diff = region[:, None, :] - region[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jax.Array, window: Sequence[int],
                      staged: bool = False) -> jax.Array:
    """(B, X, Y, Z, C) -> (B * nW, N, C) with N = prod(window).

    ``staged=False``: one 6D transpose.  In INFERENCE XLA fuses it into
    the LN/qkv neighbourhood and a staged version measured WORSE (37.4 ->
    35.5 scenes/s, benchmarks/README.md) — keep the one-shot form there.

    ``staged=True`` (training): the bwd graph leaves these as standalone
    custom fusions at ~18 GB/s (8 x 0.51 ms of the 124 ms train step), so
    the staged-merge trick (free z-view; y/x copies moving >= 1 KB
    contiguous runs; free final (N, C) split — same as the staged
    space-to-depth patch embed) replaces them with two near-roofline
    copies.  Bit-identical: the staged minor order (wx, wy, wz, C) IS the
    row-major token order.
    """
    b, px, py, pz, c = x.shape
    wx, wy, wz = window
    if staged:
        nx, ny, nz = px // wx, py // wy, pz // wz
        x = x.reshape(b, px, py, nz, wz * c)                    # free view
        x = x.reshape(b, px, ny, wy, nz, wz * c)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        x = x.reshape(b, px, ny, nz, wy * wz * c)
        x = x.reshape(b, nx, wx, ny, nz, wy * wz * c)
        x = x.transpose(0, 1, 3, 4, 2, 5)
        return x.reshape(-1, wx * wy * wz, c)                   # free view
    x = x.reshape(b, px // wx, wx, py // wy, wy, pz // wz, wz, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wx * wy * wz, c)


def _window_reverse(x: jax.Array, window: Sequence[int], b: int,
                    pad_size: Sequence[int],
                    staged: bool = False) -> jax.Array:
    """Inverse of :func:`_window_partition` (same ``staged`` contract)."""
    px, py, pz = pad_size
    wx, wy, wz = window
    if staged:
        nx, ny, nz = px // wx, py // wy, pz // wz
        c = x.shape[-1]
        x = x.reshape(b, nx, ny, nz, wx, wy * wz * c)           # free view
        x = x.transpose(0, 1, 4, 2, 3, 5)
        x = x.reshape(b, px, ny, nz, wy, wz * c)
        x = x.transpose(0, 1, 2, 4, 3, 5)
        return x.reshape(b, px, py, pz, c)                      # free view
    x = x.reshape(b, px // wx, py // wy, pz // wz, wx, wy, wz, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, px, py, pz, -1)


class ShiftedWindowAttention3D(nn.Module):
    """3D W-MSA with relative position bias and optional cyclic shift.

    Optionally (``fused_min_windows > 0``) blocks with enough windows route
    through the fused Pallas kernel
    (``ops/window_attention.fused_qkv_window_attention``).  The kernel wins
    ~2x at block scale (stage-0 pair 2.96 -> 1.50 ms,
    ``benchmarks/microbench_swinblock_ab.py``) but is DISABLED by default:
    embedded in the full backbone graph, XLA layout assignment around the
    custom call re-lays-out the neighbouring conv/LN ops and the full
    forward measures ~5 ms SLOWER (38.3 vs 33 ms,
    ``benchmarks/trace_forward.py``; `benchmarks/microbench_attn_ctx{3,4}`
    bisects: no barrier/conv-variant/dtype fix recovers it).  Training and
    CPU always use the jnp path (the kernel defines no custom VJP).
    """

    dim: int
    window: tuple[int, int, int]
    shift: tuple[int, int, int]
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # 0 = never use the Pallas kernel; >0 = use it for blocks with at least
    # this many windows (opt-in: net loss at full-graph scale, see above)
    fused_min_windows: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, sx, sy, sz, c = x.shape
        wx, wy, wz = self.window
        pad = tuple((w - s % w) % w for s, w in zip((sx, sy, sz), self.window))
        if any(pad):
            x = jnp.pad(x, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)))
        pad_size = tuple(x.shape[1:4])
        shift = tuple(
            0 if w >= p else s
            for s, w, p in zip(self.shift, self.window, pad_size)
        )
        if sum(shift):
            x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))

        n = wx * wy * wz
        windows = _window_partition(x, self.window, staged=train)  # (B*nW, N, C)
        import os as _os

        if not train and _os.environ.get(
                "NERF_RPN_TPU_QKV_BARRIER", "0") != "0":
            # Experiment knob (measured NEUTRAL, default off): materialise
            # the partition before the qkv matmul.  The FCOS-shape trace
            # shows a partition+qkv fusion at 68 GB/s, but the barrier A/B
            # moved nothing at either shape (fcos 32.8 vs 32.9/32.6,
            # anchor 38.11 vs 38.21 scenes/s) — the fusion's trace reading
            # double-counts occurrences and the region is already at its
            # layout floor.
            windows = jax.lax.optimization_barrier(windows)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(windows)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wx - 1) * (2 * wy - 1) * (2 * wz - 1), self.num_heads),
        )
        onehot = jnp.asarray(_relative_position_onehot(self.window),
                             table.dtype)
        bias = (onehot @ table).reshape(n, n, self.num_heads).transpose(2, 0, 1)
        mask = _shift_attn_mask(pad_size, self.window, shift)

        total_windows = windows.shape[0]
        use_fused = (
            not train
            and self.fused_min_windows > 0
            and jax.default_backend() == "tpu"
            and total_windows >= self.fused_min_windows
            and c % self.num_heads == 0
            and n % 8 == 0
        )
        use_flash_train = (
            train
            and _flash_train_min() > 0
            and jax.default_backend() == "tpu"
            and _flash_train_multichip_ok()
            and total_windows >= _flash_train_min()
            and c % self.num_heads == 0
            and n % 8 == 0
        )
        if use_fused:
            from nerf_rpn_tpu.ops.window_attention import (
                fused_qkv_window_attention,
            )

            fmask = None
            if mask is not None:
                fmask = jnp.tile(
                    jnp.asarray(mask, self.dtype), (b, 1, 1))
            y = fused_qkv_window_attention(
                qkv, bias.astype(jnp.float32), fmask, self.num_heads)
        elif use_flash_train:
            from nerf_rpn_tpu.ops.window_attention import (
                flash_window_attention,
            )

            fmask = None
            if mask is not None:
                fmask = jnp.tile(
                    jnp.asarray(mask, self.dtype), (b, 1, 1))
            y = flash_window_attention(
                qkv, bias.astype(jnp.float32), fmask, self.num_heads)
        else:
            import os as _os

            qkv = qkv.reshape(
                total_windows, n, 3, self.num_heads, c // self.num_heads)
            if _os.environ.get("NERF_RPN_TPU_ATTN_NT", "0") != "0":
                # experiment knob: skip the (W, N, H, D) -> (W, H, N, D)
                # transposes (standalone ~0.9 ms copies in the train trace)
                # and let dot_general batch over (w, h) in place
                q, k, v = (qkv[:, :, i] for i in range(3))  # (W, N, H, D)
                q = q * (c // self.num_heads) ** -0.5
                attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                  preferred_element_type=jnp.float32)
                attn = attn + bias[None].astype(attn.dtype)
                if mask is not None:
                    num_windows = mask.shape[0]
                    attn = attn.reshape(b, num_windows, self.num_heads, n, n)
                    attn = attn + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
                    attn = attn.reshape(b * num_windows, self.num_heads, n, n)
                attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
                y = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                               preferred_element_type=jnp.float32).astype(self.dtype)
                y = y.reshape(total_windows, n, c)
            else:
                q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
                q = q * (c // self.num_heads) ** -0.5
                attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                                  preferred_element_type=jnp.float32)
                attn = attn + bias[None].astype(attn.dtype)
                if mask is not None:
                    num_windows = mask.shape[0]
                    attn = attn.reshape(b, num_windows, self.num_heads, n, n)
                    attn = attn + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
                    attn = attn.reshape(b * num_windows, self.num_heads, n, n)
                attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
                y = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                               preferred_element_type=jnp.float32).astype(self.dtype)
                y = y.transpose(0, 2, 1, 3).reshape(total_windows, n, c)

        y = nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        y = _window_reverse(y, self.window, b, pad_size, staged=train)
        if sum(shift):
            y = jnp.roll(y, shift, axis=(1, 2, 3))
        return y[:, :sx, :sy, :sz]


def _flash_train_min() -> int:
    """NERF_RPN_TPU_FLASH_TRAIN_ATTN=<min_windows> (0 disables) routes
    TRAIN-path attention for blocks with at least that many windows
    through the custom-VJP flash kernel
    (ops/window_attention.flash_window_attention) — the fwd keeps logits
    in VMEM and the bwd recomputes the softmax there, replacing ~8 ms of
    qkv-split copies / logit materialisations / tiny-MXU matmuls in the
    r4 train trace.  Default ON at 128 (stages 0-1 at the train.sh
    shapes): measured end-to-end WIN on the full train step — 122.05/
    122.46 -> 115.17 ms/step (min=128; min=256 gives 115.75) with no
    sign of the conv-layout poisoning that sank the EVAL-path kernel
    (see ShiftedWindowAttention3D docstring; same-session A/B,
    benchmarks/README.md r4 rows)."""
    import os

    return int(os.environ.get("NERF_RPN_TPU_FLASH_TRAIN_ATTN", "128"))


def _flash_train_multichip_ok() -> bool:
    """Gate the flash train kernel to single-device processes unless
    explicitly overridden (NERF_RPN_TPU_FLASH_TRAIN_ATTN_MULTICHIP=1).

    A ``pallas_call`` carries no GSPMD partitioning rule: under a >1-chip
    data-parallel mesh the (W, N, 3C) qkv operand would be all-gathered /
    replicated per chip (or fail to partition), silently defeating
    scale-out.  The kernel's numerics and its end-to-end win are only
    validated single-chip (this image has exactly one TPU), so on a
    multi-device process the train path falls back to the XLA attention —
    which partitions cleanly — until someone A/Bs the kernel under a real
    sharded mesh (then flip the override, or wrap the call in shard_map
    over the window axis)."""
    import os

    if os.environ.get("NERF_RPN_TPU_FLASH_TRAIN_ATTN_MULTICHIP", "0") != "0":
        return True
    return jax.device_count() == 1


def _mlp_barrier() -> bool:
    """Experiment knob: NERF_RPN_TPU_MLP_BARRIER=1 splits the MLP
    megafusion with an optimization_barrier.  Default OFF: measured
    NEUTRAL at the bench shape (stages 12.594 vs 12.592 ms,
    benchmarks/microbench_stages_mlp.py) — the 12%-MFU MLP megafusion is
    bandwidth-bound either way, not a fusion-decision artifact."""
    import os

    return os.environ.get("NERF_RPN_TPU_MLP_BARRIER", "0") != "0"


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: tuple[int, int, int]
    shift: tuple[int, int, int]
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_min_windows: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def stochastic_depth(y):
            if not train or self.drop_path == 0.0:
                return y
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (y.shape[0],) + (1,) * (y.ndim - 1))
            return y * mask.astype(y.dtype) / keep

        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + stochastic_depth(
            ShiftedWindowAttention3D(
                self.dim, self.window, self.shift, self.num_heads,
                dtype=self.dtype, name="attn",
                fused_min_windows=self.fused_min_windows,
            )(ln("norm1")(x), train=train)
        )
        h = ln("norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        # erf-form GELU (torch nn.GELU parity) with the A&S-7.1.26
        # polynomial erf: the MLP blocks are VPU-transcendental-bound and
        # lax.erf's lowering costs ~0.7 ms per stage-0 block (same-session
        # A/B: erf-gelu 1.63 ms vs relu 0.90 — ops/activations.py); the
        # poly is exact to 1.5e-7 (bit-identical bf16 outputs, measured)
        h = erf_gelu(h)
        if _mlp_barrier():
            # keep fc1+gelu OUT of fc2's fusion: XLA otherwise megafuses the
            # whole MLP (LN apply + both matmuls + residual) into one fusion
            # that runs at ~12% MFU / 131 GB/s at stage-0 size (bench trace
            # fusion.315 / convert_reduce_fusion.1, benchmarks/README.md)
            h = jax.lax.optimization_barrier(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + stochastic_depth(h)


class PatchMerging3D(nn.Module):
    """8-neighbour concat -> LayerNorm -> Linear(8C -> 2C)."""

    dim: int
    expand: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        b, sx, sy, sz, c = x.shape
        pads = [(0, s % 2) for s in (sx, sy, sz)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        if os.environ.get("NERF_RPN_TPU_MERGE_SLICES", "0") != "0":
            # 8 strided sub-lattice slices + concat (the reference's form,
            # feature_extractor.py:649-686).  The BACKWARD of each slice
            # lowers to a chained scatter-add — 8 x 0.51 ms at 18 GB/s on
            # the stage-0 merge alone (r4 train trace, swin.py merge_1) —
            # kept only as the A/B baseline knob.
            parts = [
                x[:, i::2, j::2, k::2, :]
                for k in (0, 1)
                for j in (0, 1)
                for i in (0, 1)
            ]
            y = jnp.concatenate(parts, axis=-1)
        else:
            # One space-to-depth transpose.  Flattening minor dims
            # (k, j, i, c) row-major gives channel block k*4 + j*2 + i —
            # exactly the reference concat order, so values are
            # bit-identical and parameters keep the reference layout.
            # The backward is the inverse transpose instead of 8
            # serialized scatter-adds: train step 125.6 -> 120.6 ms,
            # eval forward 26.8 -> 26.3 ms/scene (same-session A/B,
            # benchmarks/microbench_merge.py).
            nx, ny, nz = x.shape[1] // 2, x.shape[2] // 2, x.shape[3] // 2
            x8 = x.reshape(b, nx, 2, ny, 2, nz, 2, c)
            x8 = x8.transpose(0, 1, 3, 5, 6, 4, 2, 7)
            y = x8.reshape(b, nx, ny, nz, 8 * c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        out = self.dim * 2 if self.expand else self.dim
        return nn.Dense(out, use_bias=False, dtype=self.dtype, name="reduction")(y)


class PatchEmbed3D(nn.Module):
    """4^3 stride-4 patch embed; parameters keep the Conv kernel layout
    ``(px, py, pz, C_in, C_out)`` so checkpoints/converters are unchanged.

    TPU note: a direct C_in=4 conv is pathological (the 4-lane channel dim
    gets padded, turning a ~5 GFLOP op into ~4.5 ms of HBM shuffling at
    208x208x144).  When the spatial dims divide the patch size, the patch
    window is folded into the channel dim with STAGED space-to-depth
    merges (free z view, then layout-friendly y and x transposes) and the
    embed becomes one clean MXU matmul — 2.25 -> 1.58 ms vs the previous
    (px, py, 1)-kernel regroup conv, which itself was 2.3x over the naive
    conv (benchmarks/microbench_pe{2,4}.py).  Falls back to the plain conv
    for indivisible shapes (SAME padding, as before).
    """

    features: int
    patch: tuple[int, int, int] = (4, 4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        px, py, pz = self.patch
        b, sx, sy, sz, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (px, py, pz, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if sx % px or sy % py or sz % pz:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.patch, padding="SAME",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
        else:
            # Staged space-to-depth + one MXU matmul.  The z-merge is a
            # FREE contiguous view; the y/x merges move (Z/pz, k*c)
            # contiguous runs (>= 1 KB) instead of the 128-byte runs of a
            # one-shot 6D space-to-depth transpose.  Minor-axis channel
            # order after the merges is (px, py, pz, c) — exactly the
            # row-major flatten of the Conv kernel, so parameters keep the
            # reference layout.  A/B at 208x208x144 bf16-in: regroup conv
            # 2.25 ms -> 1.58 ms (benchmarks/microbench_pe4.py; the former
            # conv paid a 0.77 ms XLA input-relayout copy at 145 GB/s).
            x2 = x.astype(self.dtype).reshape(b, sx, sy, sz // pz, pz * c)
            x2 = x2.reshape(b, sx, sy // py, py, sz // pz, pz * c)
            x2 = x2.transpose(0, 1, 2, 4, 3, 5)
            x2 = x2.reshape(b, sx, sy // py, sz // pz, py * pz * c)
            x2 = x2.reshape(b, sx // px, px, sy // py, sz // pz,
                            py * pz * c)
            x2 = x2.transpose(0, 1, 3, 4, 2, 5)
            x2 = x2.reshape(b, sx // px, sy // py, sz // pz,
                            px * py * pz * c)
            w = kernel.reshape(px * py * pz * c, self.features)
            y = jnp.dot(x2, w.astype(self.dtype))
        return y + bias.astype(self.dtype)


class SwinFPN(nn.Module):
    """3D Swin backbone + FPN neck; returns a 4-level, 256-channel pyramid."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    patch_size: tuple[int, int, int] = (4, 4, 4)
    window: tuple[int, int, int] = (4, 4, 4)
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.1
    expand_dim: bool = True
    out_channels: int = 256
    in_dim: int = 4
    dtype: jnp.dtype = jnp.float32
    fused_min_windows: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, stage: str = "all"):
        """``stage`` selects a compile unit (param names are identical in
        every mode, so one checkpoint serves all of them):

        - ``"all"``: grids -> FPN pyramid (the monolithic forward).
        - ``"embed"``: grids -> patch-embedded tokens.
        - ``"stages"``: tokens -> tuple of per-stage features.  This unit
          contains NO convolutions, so inference drivers can jit it
          separately and opt into the Pallas attention kernel without XLA's
          layout assignment poisoning the conv neighbourhood (the kernel
          loses ~5 ms when convs share its program — see
          ShiftedWindowAttention3D; split, it WINS ~2.8 ms at the bench
          shape, ``benchmarks/microbench_split_jits.py``).
        - ``"neck"``: tuple of per-stage features -> FPN pyramid.
        """
        if stage in ("all", "embed"):
            y = PatchEmbed3D(self.embed_dim, self.patch_size, dtype=self.dtype,
                             name="patch_embed")(x)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="patch_norm")(y)
            if stage == "embed":
                return y
        else:
            y = x

        if stage in ("all", "stages"):
            total_blocks = sum(self.depths)
            block_id = 0
            features = []
            for i_stage, depth in enumerate(self.depths):
                dim = self.embed_dim * (2 ** i_stage) if self.expand_dim else self.embed_dim
                if i_stage > 0:
                    prev = self.embed_dim * (2 ** (i_stage - 1)) if self.expand_dim else self.embed_dim
                    y = PatchMerging3D(prev, expand=self.expand_dim, dtype=self.dtype,
                                       name=f"merge_{i_stage}")(y)
                for i_block in range(depth):
                    sd = self.stochastic_depth_prob * block_id / max(total_blocks - 1, 1)
                    shift = tuple(
                        0 if i_block % 2 == 0 else w // 2 for w in self.window
                    )
                    y = SwinBlock(
                        dim, self.num_heads[i_stage], self.window, shift,
                        mlp_ratio=self.mlp_ratio, drop_path=sd, dtype=self.dtype,
                        fused_min_windows=self.fused_min_windows,
                        name=f"stage{i_stage}_block{i_block}",
                    )(y, train=train)
                    block_id += 1
                features.append(y)
            if stage == "stages":
                return tuple(features)
        else:
            features = list(x)

        return FPN(
            in_channels=tuple(
                self.embed_dim * (2 ** i) if self.expand_dim else self.embed_dim
                for i in range(len(self.depths))
            ),
            out_channels=self.out_channels,
            num_outs=len(self.depths),
            dtype=self.dtype,
            name="fpn_neck",
        )(features)


def make_swin_fpn(variant: str, **kw) -> SwinFPN:
    return SwinFPN(**SWIN_VARIANTS[variant], **kw)
