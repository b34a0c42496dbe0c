"""Detection heads: anchor-based RPN head and anchor-free FCOS head.

Parity targets:
- ``RPNHead3D`` <-> reference ``RPNHead`` (``model/anchor.py:177-213``):
  conv_depth x (3^3 conv + ReLU) tower -> 1x1 cls (A channels) + 1x1 bbox
  (A*6 AABB deltas or A*8 midpoint-offset deltas); N(0, 0.01) weight init,
  zero bias.
- ``FCOSHead3D`` <-> reference ``FCOSHead`` (``model/fcos/fcos.py:27-130``):
  twin towers of 4 x (3^3 conv + GroupNorm(32) + ReLU), 3^3 cls (1ch) /
  bbox (6 or 8 ch) / centerness convs (centerness on the *bbox* tower),
  focal-loss bias init -log((1-p)/p) with p=0.01 on the cls conv, a learned
  per-level scalar Scale on the regression output, and (norm_reg_targets)
  ReLU + stride-multiply at inference / plain ReLU at training.

Both heads run the same weights over every FPN level (shared towers); the
level loop is unrolled at trace time — XLA fuses each level's tower into a
few conv kernels.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

normal_init = nn.initializers.normal(stddev=0.01)


import dataclasses


def _fcos_fold_tower() -> bool:
    """NERF_RPN_TPU_FCOS_FOLD_TOWER=1 enables the hand-folded FCOS tower
    (see ``fold_batch_z``).

    Default OFF — measured NET NEGATIVE at the bench config (r5 trace
    pair, swin_s fcos_obb 160^3 batch 2): the fold removes XLA's per-conv
    batch staging (loop fusions 52 -> 17, broadcasts 9.7 -> 0 ms; folded
    forward convs at 95% MFU) but the batch-1 folded tensor kills XLA's
    batch-group weight-grad form — tower wgrads collapse to 17-30 GB/s
    (~70 ms/step) and the step goes 199.2 -> 225.9 ms.  Kept as a pinned
    negative result + harness (test_fcos_head_folded_tower_matches_unfolded
    proves bit-equal outputs)."""
    import os

    return os.environ.get("NERF_RPN_TPU_FCOS_FOLD_TOWER", "0") == "1"


@dataclasses.dataclass(frozen=True)
class FoldSpec:
    """Batch-folded-into-z tower layout (see ``fold_batch_z``)."""

    scenes: int
    pad: int
    z: int          # true z extent per scene
    mask: tuple     # (zb,) 0/1 validity of one scene block
    count: int      # true elements per (scene, group) for GN stats


def fold_batch_z(x: jax.Array, num_groups: int = 32):
    """(B, X, Y, Z, C) -> ((1, X, Y, B*(Z+2p), C), FoldSpec).

    Folds the scene axis into z with p>=1 zero columns on each side of
    every scene so a 3^3 SAME conv on the folded tensor reproduces the
    per-scene SAME conv exactly (each conv reads 1 zero past the scene; the
    GN between convs re-zeros the gaps, so bleed never accumulates and
    p=1 suffices — p is raised only until B*(Z+2p) is a multiple of 8 for
    sublane alignment).  XLA performs this very fold internally per conv
    when batch>1 (the (40,40,16,6,C) fusions in the train traces) but
    re-stages it around every GN/ReLU, ~1.9 ms per level-0 tower conv;
    keeping the tensor folded across the whole tower removes that.
    """
    b, xx, yy, z, c = x.shape
    p = 1
    while (z + 2 * p) % 8 and p < 8:
        p += 1
    zb = z + 2 * p
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p, p), (0, 0)))
    xf = xp.transpose(1, 2, 0, 3, 4).reshape(1, xx, yy, b * zb, c)
    mask = tuple(1.0 if p <= i < p + z else 0.0 for i in range(zb))
    count = xx * yy * z * (c // num_groups)
    return xf, FoldSpec(scenes=b, pad=p, z=z, mask=mask, count=count)


def unfold_batch_z(y: jax.Array, spec: FoldSpec) -> jax.Array:
    """Inverse of ``fold_batch_z`` for a folded tensor with any C."""
    _, xx, yy, bz = y.shape[:4]
    c = y.shape[-1]
    zb = bz // spec.scenes
    yv = y.reshape(xx, yy, spec.scenes, zb, c)
    yv = jax.lax.slice_in_dim(yv, spec.pad, spec.pad + spec.z, axis=3)
    return yv.transpose(2, 0, 1, 3, 4)


class GroupNormFast(nn.Module):
    """GroupNorm with f32 stats and a COMPUTE-dtype affine apply.

    Math- and param-tree-compatible with ``nn.GroupNorm(num_groups,
    epsilon)`` (params ``scale``/``bias`` of shape (C,), stats over
    (spatial, C/G) per (scene, group) in f32).  The difference: flax
    normalizes in f32 end to end, so in a bf16 tower every GN fwd/bwd
    streams f32 copies of the activation (157 MB per (2,40^3,256) level-0
    tensor) — the r5 FCOS train trace shows ~50 ms/step of such
    loop/convert fusions.  Here the stats are folded into per-(scene,
    group) a = gamma/sigma, b = beta - mu*gamma/sigma in f32, cast to the
    input dtype, and the apply is ONE fused multiply-add in bf16.
    Backward through the stats stays exact-shaped (autodiff); only the
    elementwise streams drop to bf16.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, folded: "FoldSpec | None" = None
                 ) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        gamma = scale.astype(jnp.float32).reshape(g, c // g)
        beta = bias.astype(jnp.float32).reshape(g, c // g)

        if folded is None:
            xg = x.reshape(x.shape[0], -1, g, c // g)  # (B, S, G, C/G)
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 3))           # (B, G)
            mean2 = jnp.mean(jnp.square(xf), axis=(1, 3))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)    # (B, G)
            a = inv[..., None] * gamma                 # (B, G, C/G)
            b = beta - mean[..., None] * a
            a = a.reshape(x.shape[0], c).astype(x.dtype)
            b = b.reshape(x.shape[0], c).astype(x.dtype)
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            return x * a.reshape(shape) + b.reshape(shape)

        # Batch-FOLDED input (1, X, Y, scenes*zb, C): stats per
        # (scene-block, group); gap columns may hold conv bleed — masked
        # out of the stats and re-zeroed on output (the affine's +b would
        # otherwise leak into the next conv's halo).
        scenes = folded.scenes
        xx, yy, bz = x.shape[1:4]
        zb = bz // scenes
        m = jnp.asarray(folded.mask, x.dtype).reshape(1, 1, 1, zb, 1)
        xv = x.reshape(xx, yy, scenes, zb, c) * m
        xf = xv.reshape(xx, yy, scenes, zb, g, c // g).astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(0, 1, 3, 5))        # (scenes, G)
        s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 3, 5))
        count = float(folded.count)                # true elems / (scene, group)
        mean = s1 / count
        var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        a = inv[..., None] * gamma                 # (scenes, G, C/G)
        b = beta - mean[..., None] * a
        a = a.reshape(1, 1, scenes, 1, c).astype(x.dtype)
        b = b.reshape(1, 1, scenes, 1, c).astype(x.dtype)
        y = (xv * a + b) * m
        return y.reshape(x.shape)


class RPNHead3D(nn.Module):
    in_channels: int = 256
    num_anchors: int = 13
    conv_depth: int = 2
    rotate: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]):
        """features: list of (B, X, Y, Z, C) -> (logits, deltas) lists with
        shapes (B, X, Y, Z, A) and (B, X, Y, Z, A * 6|8)."""
        reg_ch = 8 if self.rotate else 6
        tower = [
            nn.Conv(self.in_channels, (3, 3, 3), padding=1,
                    kernel_init=normal_init, dtype=self.dtype,
                    name=f"tower_{d}")
            for d in range(self.conv_depth)
        ]
        # both prediction heads consume the same tower output: run them as
        # ONE channels matmul (kernels concatenated at trace time; the
        # parameter tree is identical to two separate PointConvs) so the
        # (B, X, Y, Z, 256) tower output is read once, not twice
        class PointParams(nn.Module):
            features: int

            @nn.compact
            def __call__(self, in_features):
                k = self.param("kernel", normal_init,
                               (1, 1, 1, in_features, self.features))
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,))
                return k, b

        a = self.num_anchors
        cls_p = PointParams(a, name="cls_logits")
        bbox_p = PointParams(a * reg_ch, name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = f
            for conv in tower:
                t = nn.relu(conv(t))
            kc, bc = cls_p(t.shape[-1])
            kb, bb = bbox_p(t.shape[-1])
            k = jnp.concatenate([kc, kb], axis=-1)[0, 0, 0]
            b = jnp.concatenate([bc, bb], axis=0)
            y = jnp.einsum("...c,cf->...f", t.astype(self.dtype),
                           k.astype(self.dtype)) + b.astype(self.dtype)
            logits.append(y[..., :a])
            deltas.append(y[..., a:])
        return logits, deltas


class Scale(nn.Module):
    """Learned scalar multiplier (one per FPN level in FCOS)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s


class FCOSHead3D(nn.Module):
    in_channels: int = 256
    num_levels: int = 4
    num_convs: int = 4
    rotate: bool = False
    centerness_on_reg: bool = True
    norm_reg_targets: bool = True
    fpn_strides: Sequence[int] = (4, 8, 16, 32)
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        """features -> (cls_logits, bbox_reg, centerness) per level."""
        reg_ch = 8 if self.rotate else 6
        bias_init = nn.initializers.constant(
            -jnp.log((1 - self.prior_prob) / self.prior_prob)
        )

        def make_tower(prefix):
            layers = []
            for d in range(self.num_convs):
                layers.append(
                    nn.Conv(self.in_channels, (3, 3, 3), padding=1,
                            kernel_init=normal_init, dtype=self.dtype,
                            name=f"{prefix}_{d}_conv")
                )
                layers.append(
                    GroupNormFast(num_groups=32, epsilon=1e-5,
                                  name=f"{prefix}_{d}_gn")
                )
            def run(x, folded=None):
                for conv, gn in zip(layers[0::2], layers[1::2]):
                    x = nn.relu(gn(conv(x), folded=folded))
                return x
            return run

        cls_tower = make_tower("cls_tower")
        bbox_tower = make_tower("bbox_tower")

        # The three 3^3 prediction convs have 1/1/6-8 output channels —
        # individually they run at 0.9-6% MFU and each re-reads the full
        # tower output (trace_forward.py --fcos).  Convs sharing a tower
        # input are fused into ONE conv by concatenating their kernels at
        # trace time; the parameter tree (cls_logits/centerness/bbox_pred
        # {kernel, bias}) is identical to three nn.Conv modules.
        class Conv3Params(nn.Module):
            features: int
            bias_init_: nn.initializers.Initializer = nn.initializers.zeros

            @nn.compact
            def __call__(self, in_features):
                k = self.param("kernel", normal_init,
                               (3, 3, 3, in_features, self.features))
                b = self.param("bias", self.bias_init_, (self.features,))
                return k, b

        cls_p = Conv3Params(1, bias_init_=bias_init, name="cls_logits")
        ctr_p = Conv3Params(1, name="centerness")
        bbox_p = Conv3Params(reg_ch, name="bbox_pred")
        dt = self.dtype

        def conv3(x, kernels_biases):
            k = jnp.concatenate([k for k, _ in kernels_biases], axis=-1)
            b = jnp.concatenate([b for _, b in kernels_biases], axis=0)
            y = jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), window_strides=(1, 1, 1),
                padding=((1, 1),) * 3,
                dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
            return y + b.astype(dt)

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(features):
            # Fold scenes into z for the tower + final convs (one fold, one
            # unfold per level) instead of XLA's per-conv batch staging;
            # bit-equal per-scene conv outputs (gaps re-zeroed every GN).
            spec = None
            x_in = f
            if _fcos_fold_tower() and f.shape[0] > 1 and f.shape[3] >= 10:
                x_in, spec = fold_batch_z(f, num_groups=32)
            ct = cls_tower(x_in, spec)
            bt = bbox_tower(x_in, spec)
            c_in = f.shape[-1]
            if self.centerness_on_reg:
                cls_o = conv3(ct, [cls_p(c_in)])
                merged = conv3(bt, [ctr_p(c_in), bbox_p(c_in)])
            else:
                cls_merged = conv3(ct, [cls_p(c_in), ctr_p(c_in)])
                bbox_o = conv3(bt, [bbox_p(c_in)])
            if spec is not None:
                if self.centerness_on_reg:
                    cls_o = unfold_batch_z(cls_o, spec)
                    merged = unfold_batch_z(merged, spec)
                else:
                    cls_merged = unfold_batch_z(cls_merged, spec)
                    bbox_o = unfold_batch_z(bbox_o, spec)
            if self.centerness_on_reg:
                cls_out.append(cls_o)
                ctr_out.append(merged[..., :1])
                reg = merged[..., 1:]
            else:
                cls_out.append(cls_merged[..., :1])
                ctr_out.append(cls_merged[..., 1:2])
                reg = bbox_o
            # distances (first 6 channels) are scaled; OBB midpoint offsets
            # (channels 6:8) pass through the Scale but not the stride/exp
            reg = Scale(name=f"scale_{lvl}")(reg)
            if self.norm_reg_targets:
                dist = nn.relu(reg[..., :6])
                if not train:
                    dist = dist * self.fpn_strides[lvl]
                reg = jnp.concatenate([dist, reg[..., 6:]], axis=-1)
            else:
                # reference applies exp to every channel in this (discouraged)
                # branch (fcos.py:128)
                reg = jnp.exp(reg)
            reg_out.append(reg)
        return cls_out, reg_out, ctr_out
