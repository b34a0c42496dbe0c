"""Breakdown of the anchor-RPN proposal-generation stage at the bench shape:
per-level top-k, decode+clip, NMS, final cap — slope-timed (see
microbench_ops.py for the methodology)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.microbench_ops import slope_time
from nerf_rpn_tpu.models import rpn as rpn_lib
from nerf_rpn_tpu.models.rpn import RPNConfig
from nerf_rpn_tpu.ops.nms import NEG_INF, nms_mask
from nerf_rpn_tpu.ops.topk import safe_top_k
from nerf_rpn_tpu.train.steps import level_shapes_for

SHAPE = (208, 208, 144)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(0)

    cfg = RPNConfig(rotated=False)
    shapes = level_shapes_for(SHAPE, (4, 8, 16, 32))
    anchors_np, _, strides, counts = rpn_lib.build_level_tables(
        cfg, SHAPE, shapes)
    n = sum(counts)
    obj = jnp.asarray(rng.normal(0, 1, (1, n)), jnp.float32)
    dl = jnp.asarray(rng.normal(0, 0.2, (1, n, 6)), jnp.float32)
    ori = jnp.asarray([[200, 200, 130]], jnp.int32)
    anchors = jnp.asarray(anchors_np)

    # --- full propose ---
    def make_full(nrep):
        @jax.jit
        def fn(obj, carry):
            s = jnp.zeros((), jnp.float32)
            cur = obj + carry * 1e-12
            for _ in range(nrep):
                padding = rpn_lib.dynamic_padding_masks(
                    shapes, strides, 13, ori)
                out = rpn_lib.generate_proposals(
                    cfg, cur, dl, anchors, counts, SHAPE,
                    padding_mask=padding)
                r = jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9
                s = s + r
                cur = obj + r * 1e-20
            return s
        return fn
    slope_time("propose_full", make_full, obj)

    # --- per-level top-k only ---
    def make_topk(nrep):
        @jax.jit
        def fn(obj, carry):
            s = jnp.zeros((), jnp.float32)
            cur = obj + carry * 1e-12
            for _ in range(nrep):
                off = 0
                r = jnp.zeros((), jnp.float32)
                for count in counts:
                    k = min(cfg.pre_nms_top_n, count)
                    sl = jax.lax.slice_in_dim(cur, off, off + count, axis=1)
                    ts, ti = safe_top_k(sl, k)
                    r = r + jnp.sum(ts) + jnp.sum(ti) * 1e-9
                    off += count
                s = s + r
                cur = obj + r * 1e-20
            return s
        return fn
    slope_time("propose_topk_only", make_topk, obj)

    # --- NMS only on 10k candidates (realistic decoded boxes) ---
    k_all = sum(min(cfg.pre_nms_top_n, c) for c in counts)
    boxes10k = jnp.asarray(
        np.concatenate([
            rng.uniform(0, 180, (k_all, 3)),
            rng.uniform(4, 60, (k_all, 3)),
        ], -1).astype(np.float32))
    boxes10k = boxes10k.at[:, 3:].set(boxes10k[:, :3] + boxes10k[:, 3:])
    probs10k = jnp.asarray(rng.uniform(0.3, 1, (k_all,)), jnp.float32)
    levels10k = jnp.asarray(
        np.repeat(np.arange(4), [min(cfg.pre_nms_top_n, c) for c in counts]),
        jnp.int32)

    def make_nms(nrep):
        @jax.jit
        def fn(probs, carry):
            s = jnp.zeros((), jnp.float32)
            cur = probs + carry * 1e-12
            for _ in range(nrep):
                keep = nms_mask(boxes10k, cur, jnp.ones_like(cur, bool),
                                cfg.nms_thresh, category=levels10k)
                masked = jnp.where(keep, cur, NEG_INF)
                ts, ti = safe_top_k(masked, cfg.post_nms_top_n)
                r = jnp.sum(jnp.clip(ts, 0.0))
                s = s + r
                cur = probs + r * 1e-20
            return s
        return fn
    slope_time("propose_nms_cap_only", make_nms, probs10k)


if __name__ == "__main__":
    main()
