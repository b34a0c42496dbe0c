"""A/B the Swin stages compile unit with/without the MLP fusion-split
barrier (NERF_RPN_TPU_MLP_BARRIER).

The bench trace showed XLA megafusing each stage-0 MLP (LN apply + fc1 +
gelu + fc2 + residual) into one 17-GFLOP fusion running at ~12% MFU /
131 GB/s (fusion.315 / convert_reduce_fusion.1 — together 1.4 of the
stages unit's 9.2 ms).  The barrier keeps fc1+gelu out of fc2's fusion so
both matmuls hit the MXU as plain dots.

Usage: python benchmarks/microbench_stages_mlp.py [barrier|nobarrier]
(run each mode in a FRESH process: the flag is read at module build time).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "barrier"
os.environ["NERF_RPN_TPU_MLP_BARRIER"] = "1" if mode == "barrier" else "0"

import numpy as np
import jax
import jax.numpy as jnp

SHAPE = (208, 208, 144)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import random_state, timed_chain
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_eval_step

    model = NeRFRPN(backbone_type="swin_s", resolution=max(SHAPE),
                    rotated=False, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=False)
    rng = np.random.default_rng(0)
    eval_step = make_rpn_eval_step(model, cfg, SHAPE)
    state = random_state(model, jnp.zeros((1, 32, 32, 32, 4), jnp.float32))
    grids = jnp.asarray(rng.uniform(0, 1, (1, *SHAPE, 4)), jnp.float32)

    fwd_embed, fwd_stages, fwd_neck_head = eval_step.forward_units
    tokens = jax.block_until_ready(fwd_embed(state, grids))
    pert = jax.jit(lambda t, c: t + c * 1e-20)
    summ = jax.jit(lambda feats: sum(
        jnp.sum(f.astype(jnp.float32)) * 1e-9 for f in feats))

    def stage_step(carry):
        return summ(fwd_stages(state, pert(tokens, carry)))

    s = timed_chain(stage_step, reps=20)
    print(f"{mode}: fwd_stages {s * 1e3:.3f} ms", flush=True)

    # and the full forward, for the end-to-end effect
    sum_fwd = jax.jit(lambda obj: sum(jnp.sum(o) * 1e-9 for o in obj))
    pg = jax.jit(lambda g, c: g + c * 1e-20)

    def fwd_step(carry):
        feats, obj, dl, vox = eval_step.forward(state, pg(grids, carry))
        return sum_fwd(obj)

    s = timed_chain(fwd_step, reps=15)
    print(f"{mode}: full forward {s * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
