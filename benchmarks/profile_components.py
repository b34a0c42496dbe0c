"""Component breakdown of the bench workload (Swin-S anchor RPN inference).

Times, via the chained-step trick (CLAUDE.md: block_until_ready is
unreliable through the axon tunnel), each piece of the eval step at the
bench shape:

  - forward   : backbone + RPN head + flatten  (the first jit of eval_step)
  - backbone  : SwinFPN alone
  - head      : RPNHead3D alone on fixed pyramid features
  - propose   : proposal generation (top-k/decode/clip/NMS) alone

Also prints XLA's cost_analysis flops for the forward and the device kind,
so MFU can be derived.  One JSON line per component.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

WARMUP = 3
REPS = 20
SHAPE = (208, 208, 144)


def timed(name, step, carry, extra=None):
    # throwaway first loop: first timed loop in a fresh process through the
    # tunnel is unreliable (CLAUDE.md)
    for _ in range(WARMUP):
        carry = step(carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = step(carry)
    float(carry)
    first = (time.perf_counter() - t0) / REPS
    t0 = time.perf_counter()
    for _ in range(REPS):
        carry = step(carry)
    float(carry)
    mean_s = (time.perf_counter() - t0) / REPS
    rec = {"component": name, "ms": round(mean_s * 1e3, 3),
           "ms_first_loop": round(first * 1e3, 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return carry


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from flax.core import FrozenDict

    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN, build_backbone
    from nerf_rpn_tpu.models.heads import RPNHead3D
    from nerf_rpn_tpu.models import rpn as rpn_lib
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from nerf_rpn_tpu.train.steps import make_rpn_eval_step, level_shapes_for

    print(json.dumps({"device_kind": jax.devices()[0].device_kind,
                      "platform": jax.devices()[0].platform}), flush=True)

    rng = np.random.default_rng(0)
    model = NeRFRPN(backbone_type="swin_s", resolution=max(SHAPE),
                    rotated=False, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=False)
    grids = jnp.asarray(rng.uniform(0, 1, (1, *SHAPE, 4)).astype(np.float32))
    shapes_v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grids[:, :32, :32, :32]))
    variables = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes_v)
    tx, _ = make_optimizer(1e-3, 10)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=None, tx=tx)

    # ---- full eval-step pieces (same jits as bench.py) ----
    eval_step = make_rpn_eval_step(model, cfg, SHAPE)
    level_shapes = level_shapes_for(SHAPE, (4, 8, 16, 32))
    anchors_np, _, level_strides, counts = rpn_lib.build_level_tables(
        cfg, SHAPE, level_shapes)

    @jax.jit
    def forward(state, grids):
        feats, logits, deltas = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            grids, train=False)
        obj, dl = rpn_lib.flatten_head_outputs(logits[:4], deltas[:4],
                                               cfg.delta_dim)
        vox = rpn_lib.voxel_objectness_scores(logits[:4])
        return obj, dl, vox

    try:
        ca = forward.lower(state, grids).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(json.dumps({"forward_flops": ca.get("flops"),
                          "forward_bytes": ca.get("bytes accessed")}),
              flush=True)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"cost_analysis_error": str(e)}), flush=True)

    obj_s, dl_s, _ = jax.eval_shape(forward, state, grids)
    obj = jnp.asarray(rng.normal(0, 1, obj_s.shape), obj_s.dtype)
    dl = jnp.asarray(rng.normal(0, 0.2, dl_s.shape), dl_s.dtype)
    ori = jnp.asarray([[200, 200, 130]], jnp.int32)

    perturb = jax.jit(lambda g, c: g + c * 1e-20)
    sum_all = jax.jit(lambda xs: sum(jnp.sum(x.astype(jnp.float32)) for x in
                                     jax.tree.leaves(xs)))

    def fwd_step(carry):
        out = forward(state, perturb(grids, carry))
        return sum_all(out)
    carry = jnp.zeros((), jnp.float32)
    carry = timed("forward", fwd_step, carry)

    # ---- backbone alone ----
    backbone = build_backbone("swin_s", max(SHAPE), jnp.bfloat16)
    bb_params = state.params["backbone"]

    @jax.jit
    def bb_fwd(params, grids):
        feats = backbone.apply({"params": params}, grids, train=False)
        return feats

    def bb_step(carry):
        return sum_all(bb_fwd(bb_params, perturb(grids, carry)))
    carry = timed("backbone", bb_step, carry)

    # ---- head alone on fixed features ----
    head = RPNHead3D(in_channels=256, num_anchors=13, conv_depth=4,
                     rotate=False, dtype=jnp.bfloat16)
    feats = [jnp.asarray(rng.normal(0, 1, (1, *s, 256)), jnp.bfloat16)
             for s in level_shapes]
    head_params = state.params["rpn_head"]

    @jax.jit
    def head_fwd(params, feats):
        return head.apply({"params": params}, feats)

    pf = jax.jit(lambda f, c: [x + c.astype(x.dtype) * 1e-8 for x in f])

    def head_step(carry):
        return sum_all(head_fwd(head_params, pf(feats, carry)))
    carry = timed("rpn_head", head_step, carry)

    # ---- proposal generation alone ----
    @jax.jit
    def propose(obj, dl, ori_sizes):
        padding = rpn_lib.dynamic_padding_masks(
            level_shapes, level_strides, model.num_anchors, ori_sizes)
        return rpn_lib.generate_proposals(
            cfg, obj, dl, jnp.asarray(anchors_np), counts, SHAPE,
            padding_mask=padding)

    def prop_step(carry):
        out = propose(perturb(obj, carry), dl, ori)
        return jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9
    carry = timed("propose", prop_step, carry)

    # ---- patch embed + per-stage swin (coarse) ----
    # patch embed only
    import flax.linen as nn

    class Embed(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(96, (4, 4, 4), strides=(4, 4, 4), dtype=jnp.bfloat16,
                        name="patch_embed")(x)
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                                name="patch_norm")(y)

    embed = Embed()
    ep = {"patch_embed": bb_params["patch_embed"],
          "patch_norm": bb_params["patch_norm"]}

    @jax.jit
    def embed_fwd(p, g):
        return embed.apply({"params": p}, g)

    def embed_step(carry):
        return jnp.sum(embed_fwd(ep, perturb(grids, carry)).astype(jnp.float32))
    carry = timed("patch_embed", embed_step, carry)


if __name__ == "__main__":
    main()
