"""A/B the PatchMerging3D formulation inside the full RPN train step.

slices: 8 strided sub-lattice slices + concat (reference form) — backward
lowers to 8 chained scatter-adds at 18 GB/s (~4.8 ms/step at the train.sh
shape, r4 trace).
t8: one space-to-depth transpose (bit-identical channel order) — backward
is the inverse transpose.

Both modes trace/compile in ONE process (the env knob is read at trace
time), so the comparison is same-session.  Optionally --eval to A/B the
eval forward too (the merge also sits in the inference stages unit).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--eval", action="store_true",
                    help="also A/B the eval forward at the bench shape")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import random_state
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    shape = (160, 160, 160)
    batch = 2
    model = NeRFRPN(backbone_type="swin_s", resolution=max(shape),
                    rotated=True, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=True)
    rng = np.random.default_rng(0)
    n_gt = 16
    ctr = rng.uniform(20, 140, (batch, n_gt, 3))
    size = rng.uniform(8, 40, (batch, n_gt, 3))
    theta = rng.uniform(-np.pi / 2, np.pi / 2, (batch, n_gt, 1))
    batch_d = {
        "grids": jnp.asarray(
            rng.uniform(0, 1, (batch, *shape, 4)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "ori_sizes": jnp.full((batch, 3), 160, jnp.int32),
        "gt_boxes": jnp.asarray(
            np.concatenate([ctr, size, theta], -1).astype(np.float32)),
        "gt_mask": jnp.ones((batch, n_gt), bool),
    }
    state0 = random_state(model, batch_d["grids"][:1, :32, :32, :32],
                          with_opt=True)
    key = jax.random.PRNGKey(0)

    def time_mode(mode):
        os.environ["NERF_RPN_TPU_MERGE_SLICES"] = (
            "1" if mode == "slices" else "0")
        train_step, _ = make_rpn_train_step(model, cfg, shape)

        def run(state, reps):
            loss = None
            for i in range(reps):
                state, metrics = train_step(state, batch_d,
                                            jax.random.fold_in(key, i))
                loss = metrics["loss"]
            return state, float(loss)

        state, loss = run(state0, 3)
        state, _ = run(state, 4)
        t0 = time.perf_counter()
        state, _ = run(state, args.reps)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"[train {mode}] {ms:.2f} ms/step  (loss {loss:.4f})")
        return ms

    # old mode first (cached compile), new mode second
    a = time_mode("slices")
    b = time_mode("t8")
    a2 = time_mode("slices")  # re-time to bound session drift
    print(f"train slices {a:.2f} / {a2:.2f} ms vs t8 {b:.2f} ms")

    if args.eval:
        from nerf_rpn_tpu.train.steps import make_rpn_eval_step

        eshape = (208, 208, 144)
        emodel = NeRFRPN(backbone_type="swin_s", resolution=max(eshape),
                         rotated=False, conv_depth=4, dtype=jnp.bfloat16)
        ecfg = RPNConfig(rotated=False)
        egrids = jnp.asarray(rng.uniform(0, 1, (1, *eshape, 4)).astype(
            np.float32)).astype(jnp.bfloat16)
        estate = random_state(emodel, egrids[:, :32, :32, :32])
        ori = jnp.asarray([[200, 200, 130]], jnp.int32)
        perturb = jax.jit(lambda g, c: g + (c * 1e-20).astype(g.dtype))
        summarize = jax.jit(lambda out: jnp.sum(out["scores"]))

        def etime(mode):
            os.environ["NERF_RPN_TPU_MERGE_SLICES"] = (
                "1" if mode == "slices" else "0")
            eval_step = make_rpn_eval_step(emodel, ecfg, eshape)

            def step(carry):
                b = {"grids": perturb(egrids, carry), "ori_sizes": ori}
                return summarize(eval_step(estate, b))

            carry = jnp.zeros((), jnp.float32)
            for _ in range(5):
                carry = step(carry)
            float(carry)
            for _ in range(5):
                carry = step(carry)
            float(carry)
            t0 = time.perf_counter()
            for _ in range(30):
                carry = step(carry)
            float(carry)
            ms = (time.perf_counter() - t0) / 30 * 1e3
            print(f"[eval {mode}] {ms:.2f} ms/scene")
            return ms

        ea = etime("slices")
        eb = etime("t8")
        ea2 = etime("slices")
        print(f"eval slices {ea:.2f} / {ea2:.2f} ms vs t8 {eb:.2f} ms")


if __name__ == "__main__":
    main()
