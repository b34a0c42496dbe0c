"""Batch-scaling breakdown of the swin_s anchor-RPN eval step.

BENCH_r02 showed batch-4 throughput (30.71 scenes/s) BELOW batch-1 (31.89):
batching should amortise latency-bound segments, so something in the
pipeline scales worse than linearly with B.  This bench times the forward
and propose compile units separately at B=1 and B=4 (chained-step timing,
one scalar fetch) to localise the loss, then sub-times propose stages.

Usage: python benchmarks/microbench_propose_batch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

SHAPE = (208, 208, 144)
WARM = 3


def timed(step, reps=12):
    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARM):
        carry = step(carry)
    float(carry)
    for _ in range(max(reps // 3, 2)):
        carry = step(carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = step(carry)
    float(carry)
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import random_state
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_eval_step

    model = NeRFRPN(backbone_type="swin_s", resolution=max(SHAPE),
                    rotated=False, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=False)
    rng = np.random.default_rng(0)
    eval_step = make_rpn_eval_step(model, cfg, SHAPE)
    state = random_state(
        model, jnp.zeros((1, 32, 32, 32, 4), jnp.float32))
    perturb = jax.jit(lambda g, c: g + c * 1e-20)
    sum_prop = jax.jit(
        lambda out: jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9)
    sum_fwd = jax.jit(lambda obj: sum(jnp.sum(o) * 1e-9 for o in obj))

    for b in (1, 2, 4):
        grids = jnp.asarray(rng.uniform(0, 1, (b, *SHAPE, 4)), jnp.float32)
        ori = jnp.tile(jnp.asarray([[200, 200, 130]], jnp.int32), (b, 1))

        # forward only
        def fwd_step(carry):
            feats, obj, dl, vox = eval_step.forward(
                state, perturb(grids, carry))
            return sum_fwd(obj)

        fwd_s = timed(fwd_step)

        # full eval (forward + propose)
        def full_step(carry):
            batch = {"grids": perturb(grids, carry), "ori_sizes": ori}
            return sum_prop(eval_step(state, batch))

        full_s = timed(full_step)

        # propose only (fixed head outputs, perturbed)
        feats, obj0, dl0, vox = eval_step.forward(state, grids)
        obj0 = [jax.block_until_ready(o) for o in obj0]
        pert_l = jax.jit(lambda obj, c: [o + c * 1e-20 for o in obj])

        def prop_step(carry):
            out = eval_step.propose(pert_l(obj0, carry), dl0, ori)
            return sum_prop(out)

        prop_s = timed(prop_step)

        print(f"B={b}: forward {fwd_s*1e3/b:7.2f} ms/scene   "
              f"propose {prop_s*1e3/b:7.2f} ms/scene   "
              f"full {full_s*1e3/b:7.2f} ms/scene   "
              f"({1/ (full_s / b):.2f} scenes/s)", flush=True)


if __name__ == "__main__":
    main()
