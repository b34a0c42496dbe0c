"""Detection heads: anchor-based RPN head and anchor-free FCOS head.

Parity targets:
- ``RPNHead3D`` <-> reference ``RPNHead`` (``model/anchor.py:177-213``):
  conv_depth x (3^3 conv + ReLU) tower -> 1x1 cls (A channels) + 1x1 bbox
  (A*6 AABB deltas or A*8 midpoint-offset deltas); N(0, 0.01) weight init,
  zero bias.
- ``FCOSHead3D`` <-> reference ``FCOSHead`` (``model/fcos/fcos.py:27-130``):
  twin towers of 4 x (3^3 conv + GroupNorm(32) + ReLU), 3^3 cls (1ch) /
  bbox (6 or 8 ch) / centerness convs (centerness on the *bbox* tower),
  focal-loss bias init -log((1-p)/p) with p=0.01 on the cls conv, a learned
  per-level scalar Scale on the regression output, and (norm_reg_targets)
  ReLU + stride-multiply at inference / plain ReLU at training.

Both heads run the same weights over every FPN level (shared towers); the
level loop is unrolled at trace time — XLA fuses each level's tower into a
few conv kernels.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

normal_init = nn.initializers.normal(stddev=0.01)


class PointConv(nn.Module):
    """1x1x1 convolution as an explicit channels matmul.

    Parameter tree is IDENTICAL to ``nn.Conv(features, (1, 1, 1))`` —
    ``kernel`` (1, 1, 1, C, F) + ``bias`` (F,) — so checkpoints and the
    torch converter are unchanged.  Lowering as dot_general instead of
    conv lets XLA emit the result in a flat-friendly layout: the head
    outputs feed ``reshape(B, -1, D)`` at the eval compile-unit boundary,
    and the conv-tiled layout cost ~1 ms of relayout copies there
    (``benchmarks/trace_forward.py``).
    """

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init,
            (1, 1, 1, x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        y = jnp.einsum(
            "...c,cf->...f", x.astype(self.dtype),
            kernel[0, 0, 0].astype(self.dtype))
        return y + bias.astype(self.dtype)


class RPNHead3D(nn.Module):
    in_channels: int = 256
    num_anchors: int = 13
    conv_depth: int = 2
    rotate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]):
        """features: list of (B, X, Y, Z, C) -> (logits, deltas) lists with
        shapes (B, X, Y, Z, A) and (B, X, Y, Z, A * 6|8)."""
        reg_ch = 8 if self.rotate else 6
        tower = [
            nn.Conv(self.in_channels, (3, 3, 3), padding=1,
                    kernel_init=normal_init, dtype=self.dtype,
                    name=f"tower_{d}")
            for d in range(self.conv_depth)
        ]
        cls_conv = PointConv(self.num_anchors, kernel_init=normal_init,
                             dtype=self.dtype, name="cls_logits")
        bbox_conv = PointConv(self.num_anchors * reg_ch,
                              kernel_init=normal_init, dtype=self.dtype,
                              name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = f
            for conv in tower:
                t = nn.relu(conv(t))
            logits.append(cls_conv(t))
            deltas.append(bbox_conv(t))
        return logits, deltas


class Scale(nn.Module):
    """Learned scalar multiplier (one per FPN level in FCOS)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s


class FCOSHead3D(nn.Module):
    in_channels: int = 256
    num_levels: int = 4
    num_convs: int = 4
    rotate: bool = False
    centerness_on_reg: bool = True
    norm_reg_targets: bool = True
    fpn_strides: Sequence[int] = (4, 8, 16, 32)
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        """features -> (cls_logits, bbox_reg, centerness) per level."""
        reg_ch = 8 if self.rotate else 6
        bias_init = nn.initializers.constant(
            -jnp.log((1 - self.prior_prob) / self.prior_prob)
        )

        def make_tower(prefix):
            layers = []
            for d in range(self.num_convs):
                layers.append(
                    nn.Conv(self.in_channels, (3, 3, 3), padding=1,
                            kernel_init=normal_init, dtype=self.dtype,
                            name=f"{prefix}_{d}_conv")
                )
                layers.append(
                    nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                 name=f"{prefix}_{d}_gn")
                )
            def run(x):
                for conv, gn in zip(layers[0::2], layers[1::2]):
                    x = nn.relu(gn(conv(x)))
                return x
            return run

        cls_tower = make_tower("cls_tower")
        bbox_tower = make_tower("bbox_tower")
        cls_conv = nn.Conv(1, (3, 3, 3), padding=1, kernel_init=normal_init,
                           bias_init=bias_init, dtype=self.dtype,
                           name="cls_logits")
        ctr_conv = nn.Conv(1, (3, 3, 3), padding=1, kernel_init=normal_init,
                           dtype=self.dtype, name="centerness")
        bbox_conv = nn.Conv(reg_ch, (3, 3, 3), padding=1,
                            kernel_init=normal_init, dtype=self.dtype,
                            name="bbox_pred")

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(features):
            ct = cls_tower(f)
            bt = bbox_tower(f)
            cls_out.append(cls_conv(ct))
            ctr_out.append(ctr_conv(bt if self.centerness_on_reg else ct))
            reg = bbox_conv(bt)
            # distances (first 6 channels) are scaled; OBB midpoint offsets
            # (channels 6:8) pass through the Scale but not the stride/exp
            reg = Scale(name=f"scale_{lvl}")(reg)
            if self.norm_reg_targets:
                dist = nn.relu(reg[..., :6])
                if not train:
                    dist = dist * self.fpn_strides[lvl]
                reg = jnp.concatenate([dist, reg[..., 6:]], axis=-1)
            else:
                # reference applies exp to every channel in this (discouraged)
                # branch (fcos.py:128)
                reg = jnp.exp(reg)
            reg_out.append(reg)
        return cls_out, reg_out, ctr_out
