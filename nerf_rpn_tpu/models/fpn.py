"""3D Feature Pyramid Network neck (flax.linen, channels-last NDHWC).

Parity target: the mmdet-style 3D FPN at reference ``model/fpn.py:8-185``
(lateral 1x1 convs, nearest top-down upsample, 3x3 output convs, optional
extra levels via stride-2 convs or max-pool).  Re-designed for TPU: features
are (B, X, Y, Z, C) so channels ride the 128-lane axis, and the exact-2x
upsample path lowers to a pure reshape/broadcast (no gather).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def upsample_nearest(x: jax.Array, target_shape: Sequence[int]) -> jax.Array:
    """Nearest-neighbour upsample of (B, X, Y, Z, C) to target (X', Y', Z')."""
    b, sx, sy, sz, c = x.shape
    tx, ty, tz = target_shape
    if (tx, ty, tz) == (2 * sx, 2 * sy, 2 * sz):
        # exact 2x: broadcast trick, cheaper than a general gather-resize
        x = x[:, :, None, :, None, :, None, :]
        x = jnp.broadcast_to(x, (b, sx, 2, sy, 2, sz, 2, c))
        return x.reshape(b, tx, ty, tz, c)
    return jax.image.resize(x, (b, tx, ty, tz, c), method="nearest")


class FPN(nn.Module):
    """FPN neck over a bottom-up pyramid.

    Attributes:
        in_channels: channels of each input level (low -> high stride).
        out_channels: output channels at every level.
        num_outs: number of output levels (extra levels appended on top).
        add_extra_convs: False (max-pool extras) or 'on_input' / 'on_lateral'
            / 'on_output' (stride-2 conv extras).
        relu_before_extra_convs: apply ReLU before extra convs.
    """

    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 4
    add_extra_convs: bool | str = False
    relu_before_extra_convs: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> tuple[jax.Array, ...]:
        assert len(inputs) == len(self.in_channels)
        n = len(inputs)
        conv = lambda feats, name, **kw: nn.Conv(
            self.out_channels, dtype=self.dtype, name=name, **kw
        )(feats)

        laterals = [
            conv(inputs[i], f"lateral_{i}", kernel_size=(1, 1, 1)) for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:4]
            )
        outs = [
            conv(laterals[i], f"output_{i}", kernel_size=(3, 3, 3), padding=1)
            for i in range(n)
        ]
        # extra levels
        for i in range(n, self.num_outs):
            if not self.add_extra_convs:
                outs.append(
                    nn.max_pool(outs[-1], (1, 1, 1), strides=(2, 2, 2), padding="VALID")
                )
            else:
                if i == n:
                    src = {
                        "on_input": inputs[-1],
                        "on_lateral": laterals[-1],
                        "on_output": outs[-1],
                    }[self.add_extra_convs]
                else:
                    src = outs[-1]
                    if self.relu_before_extra_convs:
                        src = nn.relu(src)
                outs.append(
                    conv(src, f"extra_{i}", kernel_size=(3, 3, 3),
                         strides=(2, 2, 2), padding=1)
                )
        return tuple(outs)
