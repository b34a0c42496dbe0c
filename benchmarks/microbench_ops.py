"""Slope-based microbenchmarks for forward-path hotspots.

Per-module timings through the axon tunnel have a ~2 ms dispatch floor, so
single-op numbers are meaningless.  Here each candidate runs n_lo and n_hi
copies CHAINED inside one jit; (t_hi - t_lo) / (n_hi - n_lo) is the true
per-op device time, dispatch cancelled.
"""

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

WARMUP = 3
REPS = 15
N_LO, N_HI = 2, 10


def slope_time(name, make_fn, x, extra=None):
    """make_fn(n) -> jitted fn(x, carry) chaining n applications."""
    times = {}
    for n in (N_LO, N_HI):
        fn = make_fn(n)
        carry = jnp.zeros((), jnp.float32)
        for _ in range(WARMUP):
            carry = fn(x, carry)
        float(carry)
        # throwaway loop (first timed loop unreliable through the tunnel)
        for _ in range(REPS):
            carry = fn(x, carry)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(REPS):
            carry = fn(x, carry)
        float(carry)
        times[n] = (time.perf_counter() - t0) / REPS
    per_op_ms = (times[N_HI] - times[N_LO]) / (N_HI - N_LO) * 1e3
    rec = {"op": name, "ms": round(per_op_ms, 4),
           "lo_ms": round(times[N_LO] * 1e3, 3),
           "hi_ms": round(times[N_HI] * 1e3, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return per_op_ms


def module_chain(mod, params, reducer=None):
    """Chain n applications; output feeds a tiny perturbation of the input."""
    def make(n):
        @jax.jit
        def fn(x, carry):
            y = x + carry.astype(x.dtype) * 1e-12
            s = jnp.zeros((), jnp.float32)
            for _ in range(n):
                out = mod.apply(params, y)
                r = (reducer(out) if reducer else
                     jnp.sum(out.astype(jnp.float32)))
                s = s + r
                y = x + (r * 1e-20).astype(x.dtype)
            return s
        return fn
    return make


def init_params(mod, x, seed=0):
    rng = np.random.default_rng(seed)
    shapes = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), x))
    return jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes)


class ConvPatchEmbed(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.Conv(96, (4, 4, 4), strides=(4, 4, 4), dtype=jnp.bfloat16,
                    name="patch_embed")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                            name="patch_norm")(y)


class S2DPatchEmbed(nn.Module):
    """space-to-depth reshape + matmul; params keep the conv kernel layout."""

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, 4, 4, 96))
        bias = self.param("bias", nn.initializers.zeros, (96,))
        b, sx, sy, sz, c = x.shape
        x = x.reshape(b, sx // 4, 4, sy // 4, 4, sz // 4, 4, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, sx // 4, sy // 4, sz // 4, 64 * c)
        w = kernel.reshape(-1, 96).astype(jnp.bfloat16)
        y = jnp.dot(x.astype(jnp.bfloat16), w) + bias.astype(jnp.bfloat16)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                            name="patch_norm")(y)


class OneConv(nn.Module):
    ch: int = 256

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Conv(self.ch, (3, 3, 3), padding=1,
                               dtype=jnp.bfloat16)(x))


class ShiftConv(nn.Module):
    """3^3 conv as 27 shifted (voxels, C) @ (C, C) matmuls, f32 accum."""

    ch: int = 256

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, self.ch, self.ch))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        xb = x.astype(jnp.bfloat16)
        acc = jnp.zeros(x.shape[:-1] + (self.ch,), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    w = k[dx, dy, dz].astype(jnp.bfloat16)
                    sh = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))[
                        :, dx:dx + x.shape[1], dy:dy + x.shape[2],
                        dz:dz + x.shape[3]]
                    acc = acc + jnp.dot(sh, w,
                                        preferred_element_type=jnp.float32)
        return nn.relu((acc + bias).astype(jnp.bfloat16))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)

    # --- patch embed variants at the bench shape ---
    x_in = jnp.asarray(rng.uniform(0, 1, (1, 208, 208, 144, 4)), jnp.float32)
    conv_pe = ConvPatchEmbed()
    slope_time("patch_embed_conv", module_chain(conv_pe, init_params(conv_pe, x_in)), x_in)
    s2d_pe = S2DPatchEmbed()
    slope_time("patch_embed_s2d", module_chain(s2d_pe, init_params(s2d_pe, x_in)), x_in)
    x_bf = x_in.astype(jnp.bfloat16)
    slope_time("patch_embed_s2d_bf16in", module_chain(s2d_pe, init_params(s2d_pe, x_bf)), x_bf)

    # --- head tower conv at L0 ---
    x0 = jnp.asarray(rng.normal(0, 1, (1, 52, 52, 36, 256)), jnp.bfloat16)
    oc = OneConv()
    slope_time("conv3_256_L0_xla", module_chain(oc, init_params(oc, x0)), x0,
               extra={"gflops": 2 * 52 * 52 * 36 * 27 * 256 * 256 / 1e9})
    sc = ShiftConv()
    slope_time("conv3_256_L0_shiftmm", module_chain(sc, init_params(sc, x0)), x0)

    # --- swin stage blocks (true per-block cost) ---
    from nerf_rpn_tpu.models.swin import SwinBlock
    stage_shapes = [(52, 52, 36, 96), (26, 26, 18, 192),
                    (13, 13, 9, 384), (7, 7, 5, 768)]
    heads = [3, 6, 12, 24]
    for i, (shape, h) in enumerate(zip(stage_shapes, heads)):
        xs = jnp.asarray(rng.normal(0, 1, (1, *shape)), jnp.bfloat16)
        blk = SwinBlock(shape[-1], h, (4, 4, 4), (2, 2, 2), dtype=jnp.bfloat16)
        slope_time(f"swin_block_stage{i}", module_chain(blk, init_params(blk, xs)), xs)

    # --- patch merges ---
    from nerf_rpn_tpu.models.swin import PatchMerging3D
    for i in range(1, 4):
        s_prev = stage_shapes[i - 1]
        xs = jnp.asarray(rng.normal(0, 1, (1, *s_prev)), jnp.bfloat16)
        m = PatchMerging3D(s_prev[-1], dtype=jnp.bfloat16)
        slope_time(f"merge_{i}", module_chain(m, init_params(m, xs)), xs)

    # --- FPN ---
    from nerf_rpn_tpu.models.fpn import FPN
    feats = tuple(jnp.asarray(rng.normal(0, 1, (1, *s)), jnp.bfloat16)
                  for s in stage_shapes)
    fpn = FPN(in_channels=(96, 192, 384, 768), out_channels=256, num_outs=4,
              dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: fpn.init(jax.random.PRNGKey(0), feats))
    fparams = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes)

    def make_fpn(n):
        @jax.jit
        def fn(fs, carry):
            s = jnp.zeros((), jnp.float32)
            cur = tuple(f + carry.astype(f.dtype) * 1e-12 for f in fs)
            for _ in range(n):
                ys = fpn.apply(fparams, cur)
                r = sum(jnp.sum(y.astype(jnp.float32)) for y in ys)
                s = s + r
                cur = tuple(f + (r * 1e-20).astype(f.dtype) for f in fs)
            return s
        return fn
    slope_time("fpn", make_fpn, feats)


if __name__ == "__main__":
    main()
