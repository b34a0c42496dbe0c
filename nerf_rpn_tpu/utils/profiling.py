"""Profiling / tracing helpers (SURVEY 5.1: the reference ships only a
CUDA-event latency loop; the TPU rebuild gets real traces).

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of device + host activity.
- ``benchmark_fn``: the chained-step latency harness used by bench.py and
  the drivers' ``--mode benchmark`` (one host fetch per run, because
  block_until_ready is unreliable through this image's axon tunnel and each
  fetch costs a ~26 ms TCP round-trip).
- ``nan_check``: checkify-based NaN/Inf guard for debugging training
  (SURVEY 5.2: replaces torch's set_detect_anomaly; XLA is deterministic so
  the reference's atomicAdd nondeterminism has no analogue here).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn, *args, warmup: int = 3, reps: int = 30):
    """Mean seconds/call for ``fn(*args, carry) -> scalar carry``.

    ``fn`` must thread the scalar carry so each step data-depends on the
    previous one; only the final scalar is fetched.
    """
    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = fn(*args, carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / reps


def nan_check(fn):
    """Wrap a jittable fn so NaN/Inf in any output raises with location info."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
