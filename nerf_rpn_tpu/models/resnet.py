"""3D ResNet-FPN backbones (flax.linen, NDHWC).

Parity targets (reference ``model/feature_extractor.py``):
- ``ResNetFPN256``  <-> ``ResNet_FPN_256`` (:148-235): 7^3 stride-2 stem
  (+ optional stride-2 max-pool), bottleneck stages [3,4,6,3] at widths
  64/128/256/512 (expansion 4), built-in FPN with lateral 1x1 convs,
  nearest top-down, 3x3 smooths on all but the top level; out_channels 256.
- ``ResNetFPN64``   <-> ``ResNet_FPN_64`` (:72-142): small-resolution
  variant, stride-1 stem, widths 16/32/64/128, out_channels 64, trilinear
  top-down upsample.
- ``ResNetSimplified``  <-> debug variants (:239-274).

TPU notes: channels-last so convs tile onto the MXU; BatchNorm carries
running stats (use ``axis_name`` for cross-replica sync under shard_map);
pass ``dtype=jnp.bfloat16`` for bf16 compute with f32 params/stats.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.models.fpn import upsample_nearest
from nerf_rpn_tpu.ops.pooling import stem_pool


class StemConv3D(nn.Module):
    """7^3 stride-2 stem conv; parameters identical to
    ``nn.Conv(features, (7,7,7), strides=(2,2,2), padding=3,
    use_bias=False)`` (``kernel`` (7,7,7,C,F)).

    TPU note: a direct C_in=4 conv is catastrophic — the 4-lane channel
    dim wastes 97% of the VPU/MXU lanes, and the stem measured 16 ms of
    the resnet50 bench forward at 9.5% MFU (``trace_forward.py
    --backbone resnet``).  When the z extent is even, the kernel's z
    window is UNFOLDED into channels: 8 z-taps x C channels become the
    lane dim (x_aug[..., z', t*C+c] = x_padded[..., 2z'+t, c]), the kernel
    reshapes to (7, 7, 1, 8C, F) with a zero tap-7 plane, and the conv
    runs with strides (2, 2, 1) — same math, 8x the lanes.  Falls back to
    the plain conv for odd z.
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, sx, sy, sz, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 7, c, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        import os as _os

        s2d = _os.environ.get("NERF_RPN_TPU_STEM_S2D", "1") != "0"
        if sz % 2:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2, 2), padding=((3, 3),) * 3,
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
        elif s2d and sx % 2 == 0 and sy % 2 == 0:
            # x/y pair-regroup on TOP of the z unfold: the conv becomes
            # (4, 4, 1) VALID over C_in = 2*2*8C = 128 — the full lane
            # width.  The 8C=32-lane form below runs at 33% MFU plus a
            # 1.65 ms build->conv relayout in the vgg_EF r4 trace;
            # exact same math (microbench_stem.py::s2dquad, bit-checked
            # against the plain conv).  Channel order (jz, px, py, pz, c).
            zout = sz // 2
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (3, 3), (0, 0)))
            xq = xp.reshape(b, sx + 6, sy + 6, (sz + 6) // 2, 2 * c)
            qs = [xq[:, p::2, q::2] for p in (0, 1) for q in (0, 1)]
            q4 = jnp.concatenate(qs, axis=-1)    # ch = (px, py, pz, c)
            parts = [
                jax.lax.slice_in_dim(q4, j, j + zout, axis=3)
                for j in range(4)
            ]
            x_aug = jnp.concatenate(parts, axis=-1)  # (jz, px, py, pz, c)
            k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
            k8 = k8.reshape(4, 2, 4, 2, 4, 2, c, self.features)
            k8 = k8.transpose(0, 2, 4, 1, 3, 5, 6, 7)
            k8 = k8.reshape(4, 4, 1, 32 * c, self.features)
            y = jax.lax.conv_general_dilated(
                x_aug.astype(self.dtype), k8.astype(self.dtype),
                window_strides=(1, 1, 1), padding="VALID",
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
        else:
            # Build the (B, X, Y, Z/2, 8C) unfold from a FREE z-pair
            # regroup + 4 unit-stride z-shifted slices, instead of 8
            # stride-2 sub-lane slices: block j holds taps (2j, 2j+1), so
            # (j, parity, c) lexicographic == taps-major (t, c) and the
            # same reshaped kernel applies.  6.61 -> 6.34 ms at the vgg
            # stem shape (benchmarks/microbench_stem.py; the pair-regroup
            # conv with no materialisation at all re-tanks the MXU at
            # 2C=8 lanes: 7.72 ms).
            zout = sz // 2
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (3, 3), (0, 0)))
            xq = xp.reshape(b, sx, sy, (sz + 6) // 2, 2 * c)
            parts = [
                jax.lax.slice_in_dim(xq, j, j + zout, axis=3)
                for j in range(4)
            ]
            x_aug = jnp.concatenate(parts, axis=-1)     # (B, X, Y, Z/2, 8C)
            k8 = jnp.pad(kernel, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
            k8 = k8.reshape(7, 7, 1, 8 * c, self.features)  # taps-major
            y = jax.lax.conv_general_dilated(
                x_aug.astype(self.dtype), k8.astype(self.dtype),
                window_strides=(2, 2, 1),
                padding=((3, 3), (3, 3), (0, 0)),
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
        return y + bias.astype(self.dtype) if bias is not None else y


class Bottleneck(nn.Module):
    """1x1 (stride s) -> 3x3 -> 1x1 bottleneck, expansion 4, BN after each."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name=name,
        )
        s = (self.stride,) * 3
        out_ch = self.planes * self.expansion

        residual = x
        y = nn.Conv(self.planes, (1, 1, 1), strides=s, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)

        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1, 1), strides=s, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetFPN256(nn.Module):
    """ResNet-50-style 3D backbone with built-in 4-level FPN, out_channels 256."""

    layers: Sequence[int] = (3, 4, 6, 3)
    in_dim: int = 4
    base_width: int = 64
    out_channels: int = 256
    is_max_pool: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, ...]:
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="stem_bn",
        )
        y = StemConv3D(self.base_width, dtype=self.dtype,
                       name="stem_conv")(x)
        y = nn.relu(bn(y))
        if self.is_max_pool:
            y = stem_pool(y)

        # bottom-up stages
        c_out = []
        for i, depth in enumerate(self.layers):
            planes = self.base_width * (2 ** i)
            for j in range(depth):
                y = Bottleneck(
                    planes,
                    stride=2 if (i > 0 and j == 0) else 1,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"stage{i}_block{j}",
                )(y, train=train)
            c_out.append(y)

        # top-down FPN
        n = len(c_out)
        laterals = [
            nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(c_out[i])
            for i in range(n)
        ]
        p = [laterals[-1]]
        for i in range(n - 2, -1, -1):
            p.insert(0, laterals[i] + upsample_nearest(p[0], laterals[i].shape[1:4]))
        for i in range(n - 1):
            p[i] = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                           dtype=self.dtype, name=f"smooth_{i}")(p[i])
        return tuple(p)


class ResNetFPN64(nn.Module):
    """Small backbone for 64^3 inputs: stride-1 stem, out_channels 64."""

    layers: Sequence[int] = (2, 2, 2, 2)
    in_dim: int = 4
    out_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, ...]:
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_axis_name if train else None,
            name="stem_bn",
        )
        y = nn.Conv(16, (7, 7, 7), strides=(1, 1, 1), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.relu(bn(y))
        c_out = []
        for i, depth in enumerate(self.layers):
            planes = 16 * (2 ** i)
            for j in range(depth):
                y = Bottleneck(
                    planes,
                    stride=2 if (i > 0 and j == 0) else 1,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"stage{i}_block{j}",
                )(y, train=train)
            c_out.append(y)
        n = len(c_out)
        laterals = [
            nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(c_out[i])
            for i in range(n)
        ]
        p = [laterals[-1]]
        for i in range(n - 2, -1, -1):
            up = jax.image.resize(
                p[0],
                (p[0].shape[0], *laterals[i].shape[1:4], p[0].shape[-1]),
                method="trilinear",
            )
            p.insert(0, laterals[i] + up)
        for i in range(n - 1):
            p[i] = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                           dtype=self.dtype, name=f"smooth_{i}")(p[i])
        return tuple(p)


class ResNetSimplified(nn.Module):
    """Debug backbone: stem + N basic residual blocks, single-level output
    (reference ``ResNetSimplified_64/256``)."""

    out_channels: int = 64
    num_residuals: int = 3
    stride2_stem: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, ...]:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        s = (2, 2, 2) if self.stride2_stem else (1, 1, 1)
        y = nn.Conv(self.out_channels, (7, 7, 7), strides=s, padding=3,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.relu(bn("stem_bn")(y))
        if self.stride2_stem:
            y = stem_pool(y)
        for i in range(self.num_residuals):
            r = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                        dtype=self.dtype, name=f"res{i}_conv1")(y)
            r = nn.relu(bn(f"res{i}_bn1")(r))
            r = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                        dtype=self.dtype, name=f"res{i}_conv2")(r)
            r = bn(f"res{i}_bn2")(r)
            y = nn.relu(r + y)
        return (y,)
