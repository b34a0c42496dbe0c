"""Patch-embed variants, round 2: avoid the C=4 layout shuffle entirely."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from benchmarks.microbench_ops import slope_time, module_chain, init_params


class LaneRegroupConv(nn.Module):
    """(B,X,Y,Z,4) --free reshape--> (B,X,Y,Z/4,16) + (4,4,1) stride conv.

    The (z, c) lane regroup is a contiguous view (no data movement); the
    conv then has C_in=16 which XLA lays out sanely, vs. the pathological
    C_in=4 of the direct 4^3 conv.  Kernel keeps the (4,4,4,4,96) layout.
    """

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, 4, 4, 96))
        bias = self.param("bias", nn.initializers.zeros, (96,))
        b, sx, sy, sz, c = x.shape
        x2 = x.reshape(b, sx, sy, sz // 4, 4 * c)
        k2 = kernel.reshape(4, 4, 1, 16, 96)
        y = jax.lax.conv_general_dilated(
            x2.astype(jnp.bfloat16), k2.astype(jnp.bfloat16),
            window_strides=(4, 4, 1), padding="VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
        y = y + bias.astype(jnp.bfloat16)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                            name="patch_norm")(y)


class DotGeneralEmbed(nn.Module):
    """Free split reshape + multi-contracting-dim dot_general."""

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, 4, 4, 96))
        bias = self.param("bias", nn.initializers.zeros, (96,))
        b, sx, sy, sz, c = x.shape
        x2 = x.reshape(b, sx // 4, 4, sy // 4, 4, sz // 4, 4, c)
        y = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
            dimension_numbers=(((2, 4, 6, 7), (0, 1, 2, 3)), ((), ())),
            preferred_element_type=jnp.float32)
        y = (y + bias).astype(jnp.bfloat16)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                            name="patch_norm")(y)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)

    for name, mod in (("lane_regroup_conv", LaneRegroupConv()),
                      ("dot_general_embed", DotGeneralEmbed())):
        slope_time(name, module_chain(mod, init_params(mod, x_in)), x_in)
    x_bf = x_in.astype(jnp.bfloat16)
    mod = LaneRegroupConv()
    slope_time("lane_regroup_conv_bf16in",
               module_chain(mod, init_params(mod, x_bf)), x_bf)


if __name__ == "__main__":
    main()
