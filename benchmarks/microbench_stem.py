"""A/B/C the z-unfolded 7^3/2 stem conv formulations (resnet.StemConv3D).

The stem must avoid a direct C_in=4 conv (9.5% MFU, 16 ms — r2 trace).  The
r2 fix unfolds the kernel's 8-tap z window into channels, but builds the
(B, X, Y, Z/2, 8C) input with 8 stride-2 z-slices + a minor concat — which
the vgg_EF r4 trace shows costing ~4.4 ms of sub-roofline plumbing
(copy.55 1.9 ms @233 GB/s, concatenate.9 1.1 ms, pads 1.6 ms) before the
conv even starts.

Variants (all bit-identical math to conv(7^3, stride 2, pad 3)):

- unfold8 (current): pad z (3,4); 8x lax.slice stride-2 z-slices; concat
  minor -> (.., Z/2, 8C); conv (7,7,1,8C,F) strides (2,2,1).
- pairconv: pad z (3,3); FREE pair-regroup reshape (.., Z+6, C) ->
  (.., (Z+6)/2, 2C); conv (7,7,4,2C,F) strides (2,2,1) VALID in z — the
  conv's own z window does the unfold, nothing is materialised.  Lane
  width drops to 2C=8, which may re-tank the MXU — that's what we measure.
- quadshift: same pair-regroup, then x_aug from 4 UNIT-stride z-shifted
  slices + concat (channel order (j, p, c) == taps-major (t, c), so the
  same reshaped kernel applies); conv identical to unfold8.

Usage: python benchmarks/microbench_stem.py [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--shape", type=int, nargs=3, default=(208, 208, 144))
    ap.add_argument("--features", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    C, F = 4, args.features
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(0, 0.05, (7, 7, 7, C, F)), jnp.bfloat16)

    def plain(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(2, 2, 2), padding=((3, 3),) * 3,
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))

    def unfold8(x, k):
        b, sx, sy, sz, c = x.shape
        zout = sz // 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (3, 4), (0, 0)))
        taps = [lax.slice_in_dim(xp, t, t + 2 * zout, stride=2, axis=3)
                for t in range(8)]
        x_aug = jnp.concatenate(taps, axis=-1)
        k8 = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
        k8 = k8.reshape(7, 7, 1, 8 * c, F)
        return lax.conv_general_dilated(
            x_aug, k8, window_strides=(2, 2, 1),
            padding=((3, 3), (3, 3), (0, 0)),
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))

    def pairconv(x, k):
        b, sx, sy, sz, c = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (3, 3), (0, 0)))
        xq = xp.reshape(b, sx, sy, (sz + 6) // 2, 2 * c)
        k8 = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
        k4 = k8.reshape(7, 7, 4, 2 * c, F)
        return lax.conv_general_dilated(
            xq, k4, window_strides=(2, 2, 1),
            padding=((3, 3), (3, 3), (0, 0)),
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))

    def quadshift(x, k):
        b, sx, sy, sz, c = x.shape
        zout = sz // 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (3, 3), (0, 0)))
        xq = xp.reshape(b, sx, sy, (sz + 6) // 2, 2 * c)
        # block j = taps (2j, 2j+1): (j, p, c) lexicographic == (t, c)
        parts = [lax.slice_in_dim(xq, j, j + zout, axis=3) for j in range(4)]
        x_aug = jnp.concatenate(parts, axis=-1)
        k8 = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
        k8 = k8.reshape(7, 7, 1, 8 * c, F)
        return lax.conv_general_dilated(
            x_aug, k8, window_strides=(2, 2, 1),
            padding=((3, 3), (3, 3), (0, 0)),
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))

    def s2dquad(x, k):
        # x/y pair-regroup on TOP of the z quad-shift: the conv becomes
        # (4, 4, 1) VALID over C_in = 2*2*8C = 128 — exactly the lane
        # width (the 8C=32-lane conv runs at 33% MFU in the vgg_EF r4
        # trace, plus a 1.65 ms build->conv relayout).  Channel order
        # (jz, px, py, pz, c); kernel remapped to match.
        b, sx, sy, sz, c = x.shape
        zout = sz // 2
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (3, 3), (0, 0)))
        xq = xp.reshape(b, sx + 6, sy + 6, (sz + 6) // 2, 2 * c)
        # x/y parity slices (major-axis stride-2 reads, contiguous writes)
        qs = [xq[:, p::2, q::2] for p in (0, 1) for q in (0, 1)]
        q32 = jnp.concatenate(qs, axis=-1)      # ch = (px, py, pz, c)
        parts = [lax.slice_in_dim(q32, j, j + zout, axis=3)
                 for j in range(4)]
        x_aug = jnp.concatenate(parts, axis=-1)  # ch = (jz, px, py, pz, c)
        k8 = jnp.pad(k, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
        k8 = k8.reshape(4, 2, 4, 2, 4, 2, c, F)  # (jx,px,jy,py,jz,pz,c,f)
        k8 = k8.transpose(0, 2, 4, 1, 3, 5, 6, 7)
        k8 = k8.reshape(4, 4, 1, 32 * c, F)
        return lax.conv_general_dilated(
            x_aug, k8, window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))

    # correctness on a small f32 grid
    xs = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 12, C)), jnp.float32)
    ks = jnp.asarray(np.asarray(kernel, np.float32))
    ref = np.asarray(plain(xs, ks))
    for name, fn in [("unfold8", unfold8), ("pairconv", pairconv),
                     ("quadshift", quadshift), ("s2dquad", s2dquad)]:
        got = np.asarray(fn(xs, ks))
        err = np.abs(got - ref).max()
        print(f"correctness {name}: shape {got.shape} vs {ref.shape} "
              f"max_err {err:.2e}")
        assert got.shape == ref.shape and err < 1e-4, name

    # timing at the bench stem shape, chained bf16
    x = jnp.asarray(rng.normal(0, 1, (1, *args.shape, C)), jnp.bfloat16)

    def time_fn(name, fn):
        f = jax.jit(lambda x0, c: jnp.sum(
            fn(x0 + (c * 1e-20).astype(x0.dtype), kernel).astype(jnp.float32)))

        def loop(reps):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(reps):
                carry = f(x, carry) * 1e-30
            return float(carry)

        loop(5)
        loop(5)   # throwaway timed loop (tunnel)
        t0 = time.perf_counter()
        loop(args.reps)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"[{name}] {ms:.3f} ms")
        return ms

    r = {}
    for name, fn in [("plain_c4", plain), ("unfold8", unfold8),
                     ("pairconv", pairconv), ("quadshift", quadshift),
                     ("s2dquad", s2dquad)]:
        r[name] = time_fn(name, fn)
    print({k: round(v, 3) for k, v in r.items()})


if __name__ == "__main__":
    main()
