"""Device-trace the FCOS train step and print the roofline table.

The r4 bench recorded 228.5 ms/step at 37.9% MFU (17.1 TFLOP) — 2x the
anchor step's wall time and 5.4 points lower MFU, with no published trace
(VERDICT r4 #2).  Same config as bench.bench_fcos_train (train_fcos.sh:
swin_s, --rotated_bbox, 160^3, batch 2/chip).

Usage:  python benchmarks/trace_fcos_train.py [--top N] [--report-only]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_forward import report  # noqa: E402


def capture(trace_dir: str, batch: int = 2) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import SHAPE_FCOS, _train_batch, random_state
    import jax.numpy as jnp
    from nerf_rpn_tpu.models.fcos import FCOSConfig
    from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
    from nerf_rpn_tpu.train.steps import make_fcos_train_step

    shape = SHAPE_FCOS
    batch_d = _train_batch(shape, batch, box_dim=7)
    model = FCOSOverNeRF(backbone_type="swin_s", resolution=max(shape),
                         rotated=True, dtype=jnp.bfloat16)
    cfg = FCOSConfig(rotated=True)
    state = random_state(model, batch_d["grids"][:1, :32, :32, :32],
                         with_opt=True)
    train_step, _ = make_fcos_train_step(model, cfg, shape)
    key = jax.random.PRNGKey(0)

    def run(state, reps):
        loss = None
        for i in range(reps):
            state, metrics = train_step(state, batch_d,
                                        jax.random.fold_in(key, i))
            loss = metrics["loss"]
        float(loss)
        return state

    state = run(state, 3)
    state = run(state, 3)
    with jax.profiler.trace(trace_dir):
        state = run(state, 10)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/trace_fcos_train")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--unit", default="jit_train_step")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.dir)
    report(args.dir, args.top, unit=args.unit)
