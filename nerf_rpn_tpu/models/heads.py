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
        # both prediction heads consume the same tower output: run them as
        # ONE channels matmul (kernels concatenated at trace time; the
        # parameter tree is identical to two separate PointConvs) so the
        # (B, X, Y, Z, 256) tower output is read once, not twice
        class PointParams(nn.Module):
            features: int

            @nn.compact
            def __call__(self, in_features):
                k = self.param("kernel", normal_init,
                               (1, 1, 1, in_features, self.features))
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,))
                return k, b

        a = self.num_anchors
        cls_p = PointParams(a, name="cls_logits")
        bbox_p = PointParams(a * reg_ch, name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = f
            for conv in tower:
                t = nn.relu(conv(t))
            kc, bc = cls_p(t.shape[-1])
            kb, bb = bbox_p(t.shape[-1])
            k = jnp.concatenate([kc, kb], axis=-1)[0, 0, 0]
            b = jnp.concatenate([bc, bb], axis=0)
            y = jnp.einsum("...c,cf->...f", t.astype(self.dtype),
                           k.astype(self.dtype)) + b.astype(self.dtype)
            logits.append(y[..., :a])
            deltas.append(y[..., a:])
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

        # The three 3^3 prediction convs have 1/1/6-8 output channels —
        # individually they run at 0.9-6% MFU and each re-reads the full
        # tower output (trace_forward.py --fcos).  Convs sharing a tower
        # input are fused into ONE conv by concatenating their kernels at
        # trace time; the parameter tree (cls_logits/centerness/bbox_pred
        # {kernel, bias}) is identical to three nn.Conv modules.
        class Conv3Params(nn.Module):
            features: int
            bias_init_: nn.initializers.Initializer = nn.initializers.zeros

            @nn.compact
            def __call__(self, in_features):
                k = self.param("kernel", normal_init,
                               (3, 3, 3, in_features, self.features))
                b = self.param("bias", self.bias_init_, (self.features,))
                return k, b

        cls_p = Conv3Params(1, bias_init_=bias_init, name="cls_logits")
        ctr_p = Conv3Params(1, name="centerness")
        bbox_p = Conv3Params(reg_ch, name="bbox_pred")
        dt = self.dtype

        def conv3(x, kernels_biases):
            k = jnp.concatenate([k for k, _ in kernels_biases], axis=-1)
            b = jnp.concatenate([b for _, b in kernels_biases], axis=0)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), window_strides=(1, 1, 1),
                padding=((1, 1),) * 3,
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
            return y + b.astype(dt)

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(features):
            ct = cls_tower(f)
            bt = bbox_tower(f)
            c_in = f.shape[-1]
            if self.centerness_on_reg:
                cls_out.append(conv3(ct, [cls_p(c_in)]))
                merged = conv3(bt, [ctr_p(c_in), bbox_p(c_in)])
                ctr_out.append(merged[..., :1])
                reg = merged[..., 1:]
            else:
                merged = conv3(ct, [cls_p(c_in), ctr_p(c_in)])
                cls_out.append(merged[..., :1])
                ctr_out.append(merged[..., 1:2])
                reg = conv3(bt, [bbox_p(c_in)])
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
