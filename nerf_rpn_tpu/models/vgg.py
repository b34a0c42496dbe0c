"""3D VGG-FPN backbone (flax.linen, NDHWC).

Parity target: reference ``VGG_FPN`` (``model/feature_extractor.py:278-377``):
- configs "AF"/"DF"/"EF" where ``F`` marks a pyramid-stage boundary and ``M``
  a 2x ceil-mode max-pool;
- a 7^3 stem that is stride-2 + stride-2 max-pool iff input_size >= 160,
  else stride-1;
- optional ``conv_at_start``: a 32-channel pre-stem whose 4x-downsampled
  skip is added to the first pyramid feature;
- a separate FPN neck over stage channels [128, 256, 512, 512] -> 256.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf_rpn_tpu.models.fpn import FPN
from nerf_rpn_tpu.ops.pooling import stem_pool

VGG_CFGS: dict[str, tuple] = {
    "AF": (64, 128, "F", 256, 256, "M", "F", 512, 512, "M", "F", 512, 512, "M", "F"),
    "DF": (64, 64, 128, 128, "F", 256, 256, 256, "M", "F", 512, 512, 512, "M", "F",
           512, 512, 512, "M", "F"),
    "EF": (64, 64, 128, 128, "F", 256, 256, 256, 256, "M", "F",
           512, 512, 512, 512, "M", "F", 512, 512, 512, 512, "M", "F"),
}


def _ceil_max_pool(x: jax.Array) -> jax.Array:
    """2x max-pool with ceil semantics (pad odd dims with -inf on the high
    side), matching torch ``MaxPool3d(2, 2, ceil_mode=True)``.

    Default path: reduce_window — the regrouped elementwise form
    (``ops/pooling.py``, behind NERF_RPN_TPU_POOL2_REGROUP=1) measured
    WORSE at vgg_EF graph scale (23.5 -> 22.9 scenes/s r4 A/B) even though
    the same trick wins on the 3^3 stem pool; keep the knob for re-tests."""
    import os

    if os.environ.get("NERF_RPN_TPU_POOL2_REGROUP", "0") == "0":
        pads = [(0, s % 2) for s in x.shape[1:4]]
        if any(p[1] for p in pads):
            x = jnp.pad(
                x,
                [(0, 0)] + pads + [(0, 0)],
                mode="constant",
                constant_values=-jnp.inf,
            )
        return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
    from nerf_rpn_tpu.ops.pooling import max_pool_2x2x2

    return max_pool_2x2x2(x, ceil_mode=True)


class VGGFPN(nn.Module):
    """VGG19-ish 3D conv backbone + FPN neck, 4 levels, out_channels 256."""

    cfg: str = "AF"
    in_dim: int = 4
    batch_norm: bool = True
    input_size: int = 160
    conv_at_start: bool = False
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, ...]:
        def cbr(y, ch, name, strides=(1, 1, 1), kernel=3):
            y = nn.Conv(ch, (kernel,) * 3, strides=strides, padding=kernel // 2,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            if self.batch_norm:
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name if train else None,
                    name=f"{name}_bn",
                )(y)
            return nn.relu(y)

        x_skip = None
        if self.conv_at_start:
            x = cbr(x, 32, "start0")
            x = cbr(x, 32, "start1")
            ds = cbr(x, 32, "ds0", strides=(2, 2, 2))
            ds = cbr(ds, 32, "ds1", strides=(2, 2, 2))
            x_skip = cbr(ds, 128, "ds2", kernel=1)

        # stem (z-unfolded 7^3/2 conv — a direct C_in=4 conv wastes 97% of
        # the lanes and cost 16 ms in the resnet bench forward; see
        # resnet.StemConv3D.  Identical params: stem_conv/{kernel, bias}.)
        if self.input_size >= 160:
            from nerf_rpn_tpu.models.resnet import StemConv3D

            y = StemConv3D(64, use_bias=True, dtype=self.dtype,
                           name="stem_conv")(x)
            if self.batch_norm:
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name if train else None,
                    name="stem_bn",
                )(y)
            y = nn.relu(y)
            y = stem_pool(y)
        else:
            y = cbr(x, 64, "stem", kernel=7)

        features: list[jax.Array] = []
        li = 0
        for v in VGG_CFGS[self.cfg]:
            if v == "M":
                y = _ceil_max_pool(y)
            elif v == "F":
                features.append(y)
            else:
                y = cbr(y, int(v), f"layer{li}")
                li += 1

        if self.conv_at_start and x_skip is not None:
            features[0] = features[0] + x_skip

        return FPN(
            in_channels=(128, 256, 512, 512),
            out_channels=self.out_channels,
            num_outs=4,
            dtype=self.dtype,
            name="fpn_neck",
        )(features[-4:])
