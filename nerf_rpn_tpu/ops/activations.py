"""Activation variants tuned for the TPU VPU.

``erf_gelu``: the exact-form GELU ``x * 0.5 * (1 + erf(x / sqrt(2)))`` with
erf evaluated by the Abramowitz & Stegun 7.1.26 rational polynomial in f32
(|erf error| <= 1.5e-7) instead of ``lax.erf``.

Why: the Swin MLP blocks are VPU-transcendental-bound, not HBM-bound —
same-session A/B of one stage-0 MLP chain (97k tokens, C=96, v5e):
erf-gelu 1.63 ms vs relu 0.90 ms vs tanh-gelu 0.95 ms
(`benchmarks/microbench_fused_mlp.py` investigation).  XLA lowers
``lax.erf`` to a much longer polynomial chain than A&S needs at bf16/f32
output precision.  1.5e-7 absolute error is ~25x below one bf16 ULP at
|gelu| ~ 1: on the bf16 compute path the outputs round bit-identically
(measured mismatch fraction 0.0 over 37M elements), and at f32 it is an
order below the torch-parity test tolerances.

Gradients are taken through the polynomial itself (smooth, and its
derivative approximates gelu' to the same order).

``NERF_RPN_TPU_EXACT_ERF=1`` restores ``lax.erf`` everywhere (escape
hatch; also used by the parity tests to bound the substitution error).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

def _erfc_as7126(z: jax.Array) -> jax.Array:
    """f32 Abramowitz & Stegun 7.1.26 erfc; |abs error| <= 1.5e-7.

    erfc(z) = poly(t) exp(-z^2) for z >= 0 with t = 1/(1 + 0.3275911 z);
    the negative branch reflects: erfc(z) = 2 - erfc(-z).
    """
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    pos = poly * jnp.exp(-a * a)
    return jnp.where(z >= 0, pos, 2.0 - pos)


def erf_gelu(x: jax.Array) -> jax.Array:
    """Exact-form GELU with the cheap-but-sufficient polynomial erfc.

    Mirrors ``jax.nn.gelu(approximate=False)`` op-for-op — it lowers to
    ``0.5 * x * erfc(-x * sqrt(1/2))`` with the sqrt constant rounded to
    ``x.dtype`` and every multiply in ``x.dtype``; erfc itself evaluates
    in f32 and rounds back (as XLA's erfc on a low-precision input does),
    so the only divergence is the erfc kernel.
    """
    if os.environ.get("NERF_RPN_TPU_EXACT_ERF", "0") != "0":
        from flax import linen as nn

        return nn.gelu(x, approximate=False)
    import numpy as np

    sqrt_half = np.sqrt(0.5).astype(x.dtype)
    arg = -x * sqrt_half
    e = _erfc_as7126(arg.astype(jnp.float32)).astype(x.dtype)
    return (0.5 * x) * e
