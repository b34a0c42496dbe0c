"""Assembled anchor-based NeRF-RPN model: backbone + FPN + RPN head.

Parity target: reference ``NeRFRegionProposalNetwork``
(``model/nerf_rpn.py:21-217``) minus its list-of-tensors transform — here a
batch is a dense (B, X, Y, Z, 4) array (bucketed/padded by the data layer)
plus a (B, 3) array of original sizes used for padding masks.

The backbone factory mirrors the driver table (``run_rpn.py:274-292``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.models.heads import FCOSHead3D, RPNHead3D
from nerf_rpn_tpu.models.resnet import ResNetFPN256
from nerf_rpn_tpu.models.swin import SWIN_VARIANTS, SwinFPN
from nerf_rpn_tpu.models.vgg import VGGFPN


def build_backbone(
    backbone_type: str,
    resolution: int = 160,
    dtype: jnp.dtype = jnp.float32,
    bn_axis_name: str | None = None,
) -> nn.Module:
    """Factory with the reference driver's table (``run_rpn.py:274-292``)."""
    if backbone_type == "resnet":
        return ResNetFPN256(
            layers=(3, 4, 6, 3), is_max_pool=True, dtype=dtype,
            bn_axis_name=bn_axis_name, name="backbone",
        )
    if backbone_type == "resnet_tiny":
        # CI / dry-run variant: same topology, minimal width and depth
        return ResNetFPN256(
            layers=(1, 1, 1, 1), base_width=8, out_channels=32,
            is_max_pool=True, dtype=dtype, bn_axis_name=bn_axis_name,
            name="backbone",
        )
    if backbone_type == "vgg_AF":
        return VGGFPN(cfg="AF", input_size=resolution, dtype=dtype,
                      bn_axis_name=bn_axis_name, name="backbone")
    if backbone_type == "vgg_EF":
        return VGGFPN(cfg="EF", input_size=resolution, dtype=dtype,
                      bn_axis_name=bn_axis_name, name="backbone")
    if backbone_type in SWIN_VARIANTS:
        return SwinFPN(**SWIN_VARIANTS[backbone_type], dtype=dtype,
                       name="backbone")
    raise ValueError(f"Unknown backbone {backbone_type}")


class NeRFRPN(nn.Module):
    """Backbone + RPN head; returns (features, logits, deltas) per level.

    Proposal decoding / filtering / losses are pure functions in
    ``models/rpn.py`` so they can sit outside the flax module (and outside
    the checkpointed parameter tree).
    """

    backbone_type: str = "resnet"
    resolution: int = 160
    num_anchors: int = 13
    conv_depth: int = 4
    rotated: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, grids: jax.Array, train: bool = False):
        backbone = build_backbone(
            self.backbone_type, self.resolution, self.dtype, self.bn_axis_name
        )
        features = backbone(grids, train=train)
        head = RPNHead3D(
            in_channels=features[0].shape[-1],
            num_anchors=self.num_anchors,
            conv_depth=self.conv_depth,
            rotate=self.rotated,
            dtype=self.dtype,
            name="rpn_head",
        )
        logits, deltas = head(features)
        return features, logits, deltas


class FCOSOverNeRF(nn.Module):
    """Backbone + FCOS head (reference ``FCOSOverNeRF``,
    ``model/fcos/fcos.py:282-386``); returns (features, cls, reg, ctr)."""

    backbone_type: str = "swin_s"
    resolution: int = 160
    num_convs: int = 4
    rotated: bool = False
    norm_reg_targets: bool = True
    centerness_on_reg: bool = True
    fpn_strides: Sequence[int] = (4, 8, 16, 32)
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, grids: jax.Array, train: bool = False):
        backbone = build_backbone(
            self.backbone_type, self.resolution, self.dtype, self.bn_axis_name
        )
        features = backbone(grids, train=train)
        head = FCOSHead3D(
            in_channels=features[0].shape[-1],
            num_convs=self.num_convs,
            rotate=self.rotated,
            centerness_on_reg=self.centerness_on_reg,
            norm_reg_targets=self.norm_reg_targets,
            fpn_strides=tuple(self.fpn_strides),
            dtype=self.dtype,
            name="fcos_head",
        )
        cls, reg, ctr = head(features, train=train)
        return features, cls, reg, ctr
