"""Device-trace the RCNN fine-tune train step and print the roofline table.

The r4 bench recorded 114.77 ms/step at 11.2% MFU (2.535 TFLOP) — the same
wall time as the 9.9-TFLOP anchor step for a quarter of the FLOPs.  This
harness reuses bench.rcnn_train_setup (swin_s fine-tune, 160^3, batch 2,
1024 candidate rois -> 128 sampled) and trace_forward.report.

Usage:  python benchmarks/trace_rcnn_train.py [--top N] [--report-only]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_forward import report  # noqa: E402  (benchmarks/ on path via cwd)


def capture(trace_dir: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import rcnn_train_setup

    train_step, state, batch_d, key = rcnn_train_setup()

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
    ap.add_argument("--dir", default="/tmp/trace_rcnn_train")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--unit", default="jit_train_step")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.dir)
    report(args.dir, args.top, unit=args.unit)
