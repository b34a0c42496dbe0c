"""Device-trace the bench forward and print a per-op roofline table.

The axon tunnel DOES support jax.profiler device traces; the emitted
``vm.trace.json.gz`` events carry the full HLO ``long_name`` (shapes +
layouts), ``hlo_category``, ``bytes_accessed`` and ``model_flops`` — enough
to compute achieved bandwidth / MFU per fusion without tensorboard.

Usage:  python benchmarks/trace_forward.py [--jnp-attn] [--top N]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = 197.0   # v5e bf16
PEAK_GBPS = 819.0


def capture_train(trace_dir: str, batch: int = 2) -> None:
    """Trace the jitted RPN TRAIN step at the reference train.sh config
    (swin_s, --rotated_bbox, 160^3, batch 8 / 4 GPUs = 2 per chip)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import random_state
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    shape = (160, 160, 160)
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
    state = random_state(model, batch_d["grids"][:1, :32, :32, :32],
                         with_opt=True)
    train_step, _ = make_rpn_train_step(model, cfg, shape)
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


def capture(trace_dir: str, jnp_attn: bool, fcos: bool = False,
            backbone: str = "swin_s", batch: int = 1) -> None:
    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    if jnp_attn:
        # force the XLA attention path in the split Swin eval units
        os.environ["NERF_RPN_TPU_FUSED_MIN_WINDOWS"] = "0"

    from nerf_rpn_tpu.train.state import TrainState, make_optimizer

    rng = np.random.default_rng(0)
    if fcos:
        from nerf_rpn_tpu.models.fcos import FCOSConfig
        from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
        from nerf_rpn_tpu.train.steps import make_fcos_eval_step

        shape = (160, 160, 160)
        model = FCOSOverNeRF(backbone_type="swin_s", resolution=max(shape),
                             rotated=True, dtype=jnp.bfloat16)
        cfg = FCOSConfig(rotated=True)
        make_step = lambda: make_fcos_eval_step(model, cfg, shape)
        ori = jnp.tile(jnp.asarray([list(shape)], jnp.int32), (batch, 1))
    else:
        from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
        from nerf_rpn_tpu.models.rpn import RPNConfig
        from nerf_rpn_tpu.train.steps import make_rpn_eval_step

        shape = (208, 208, 144)
        model = NeRFRPN(backbone_type=backbone, resolution=max(shape),
                        rotated=False, conv_depth=4, dtype=jnp.bfloat16)
        cfg = RPNConfig(rotated=False)
        make_step = lambda: make_rpn_eval_step(model, cfg, shape)
        ori = jnp.tile(jnp.asarray([[200, 200, 130]], jnp.int32), (batch, 1))
    # grids arrive in the model dtype (drivers cast in the host collate)
    grids = jnp.asarray(rng.uniform(0, 1, (batch, *shape, 4)).astype(
        np.float32)).astype(jnp.bfloat16)
    shapes_v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grids[:, :32, :32, :32]))
    variables = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype), shapes_v)
    tx, _ = make_optimizer(1e-3, 10)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=None, tx=tx)
    eval_step = make_step()
    perturb = jax.jit(lambda g, c: g + (c * 1e-20).astype(g.dtype))
    summarize = jax.jit(
        lambda out: jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9)

    def step(carry):
        batch = {"grids": perturb(grids, carry), "ori_sizes": ori}
        return summarize(eval_step(state, batch))

    carry = jnp.zeros((), jnp.float32)
    for _ in range(5):
        carry = step(carry)
    float(carry)
    for _ in range(5):
        carry = step(carry)
    float(carry)
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            carry = step(carry)
        float(carry)


def report(trace_dir: str, top: int, iters: int = 10, unit: str = "") -> None:
    """Per-fusion roofline table.  ``unit``: restrict to children whose
    timeline span falls inside that jit parent (e.g. 'jit_fwd_stages') —
    fusion numbers repeat across compile units, so attribution uses the
    (pid, tid, timestamp) interval of the enclosing jit_* event."""
    p = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(p) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {q for q, n in pids.items() if "TPU" in n}
    spans = []  # (pid, tid, ts0, ts1, parent_name)
    for e in ev:
        if (e.get("ph") == "X" and e["pid"] in dev
                and e["name"].startswith("jit_")):
            spans.append((e["pid"], e.get("tid"), e["ts"],
                          e["ts"] + e.get("dur", 0),
                          e["name"].split("(")[0]))

    def parent_of(e):
        # jit_* module spans live on a separate track from the op events:
        # match on pid + timestamp interval only
        for pid, tid, t0, t1, name in spans:
            if e["pid"] == pid and t0 <= e["ts"] < t1:
                return name
        return "?"

    agg, parents = {}, collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in dev:
            continue
        name = e["name"]
        if name.startswith("jit_"):
            parents[name.split("(")[0]] += e.get("dur", 0) / 1e3
            continue
        if unit and parent_of(e) != unit:
            continue
        a = e.get("args", {})
        rec = agg.setdefault(name, dict(
            ms=0.0, n=0, bytes=int(a.get("bytes_accessed", 0)),
            flops=int(a.get("model_flops", 0) or 0),
            cat=a.get("hlo_category", ""), ln=a.get("long_name", "")[:120]))
        rec["ms"] += e.get("dur", 0) / 1e3
        rec["n"] += 1
    for name, ms in parents.most_common():
        print(f"[parent] {name}: {ms / iters:.2f} ms/iter")
    bycat = collections.Counter()
    for r in agg.values():
        bycat[r["cat"]] += r["ms"] / iters
    scope = unit or "all units"
    print(f"child total ({scope}): {sum(bycat.values()):.2f} ms/iter")
    for c, ms in bycat.most_common(12):
        print(f"  {ms:7.2f} ms  {c}")
    print()
    for name, r in sorted(agg.items(), key=lambda kv: -kv[1]["ms"])[:top]:
        ms = r["ms"] / iters
        per_call_s = r["ms"] / r["n"] / 1e3
        bw = r["bytes"] / per_call_s / 1e9
        mfu = r["flops"] / per_call_s / 1e12 / PEAK_TFLOPS * 100
        print(f"{ms:7.3f} ms x{r['n'] // iters:3d} {r['cat'][:16]:16s} "
              f"bw={bw:6.0f}GB/s mfu={mfu:5.1f}% {name[:26]:26s} "
              f"{r['ln'][:66]}")


def _union_ms(iv):
    """Total length (ms) of the union of [t0, t1) microsecond intervals."""
    tot, cur0, cur1 = 0.0, None, None
    for t0, t1 in sorted(iv):
        if cur1 is None or t0 > cur1:
            if cur1 is not None:
                tot += cur1 - cur0
            cur0, cur1 = t0, t1
        else:
            cur1 = max(cur1, t1)
    if cur1 is not None:
        tot += cur1 - cur0
    return tot / 1e3


def report_gaps(trace_dir: str, iters: int = 10) -> None:
    """Wall-vs-trace decomposition (VERDICT r4 #4): where does the device
    idle sit?  From the trace timestamps computes, over the traced steps:

      - per-step span (first op start -> last op end within each jit step)
      - busy = union of op-event intervals inside the span
      - intra-step idle = span - busy (fusion-boundary bubbles)
      - inter-step gap = next step's first op start - this step's last op
        end (host dispatch / queue drain not overlapped by chaining)

    The chained-protocol wall number ~= span + inter-gap + tunnel jitter;
    the roofline tables above report only `busy`.
    """
    p = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(p) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {q for q, n in pids.items() if "TPU" in n}
    # step extents: the jit_* module spans (one per dispatched step program)
    steps = sorted((e["ts"], e["ts"] + e.get("dur", 0), e["name"].split("(")[0])
                   for e in ev if e.get("ph") == "X" and e["pid"] in dev
                   and e["name"].startswith("jit_") and e.get("dur", 0) > 1e3)
    ops = [(e["ts"], e["ts"] + e.get("dur", 0)) for e in ev
           if e.get("ph") == "X" and e["pid"] in dev
           and not e["name"].startswith("jit_") and e.get("dur", 0) > 0]
    per_step = []
    for i, (s0, s1, name) in enumerate(steps):
        inside = [(a, b) for a, b in ops if s0 <= a < s1]
        if not inside:
            continue
        first = min(a for a, _ in inside)
        last = max(b for _, b in inside)
        busy = _union_ms(inside)
        span = (last - first) / 1e3
        gap_next = (steps[i + 1][0] - s1) / 1e3 if i + 1 < len(steps) else None
        per_step.append((name, span, busy, span - busy, gap_next))
    print(f"{len(per_step)} step spans; per-step (ms):")
    print(f"{'step':28s} {'span':>8s} {'busy':>8s} {'intra-idle':>10s} "
          f"{'gap->next':>9s}")
    for name, span, busy, idle, gap in per_step:
        g = f"{gap:9.2f}" if gap is not None else "        -"
        print(f"{name[:28]:28s} {span:8.2f} {busy:8.2f} {idle:10.2f} {g}")
    if per_step:
        import statistics as st
        spans = [s for _, s, _, _, _ in per_step]
        busys = [b for _, _, b, _, _ in per_step]
        idles = [i for _, _, _, i, _ in per_step]
        gaps = [g for *_, g in per_step if g is not None]
        print(f"\nmedians: span={st.median(spans):.2f}  "
              f"busy={st.median(busys):.2f}  "
              f"intra-idle={st.median(idles):.2f}  "
              f"inter-gap={st.median(gaps) if gaps else 0:.2f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--jnp-attn", action="store_true",
                    help="force the XLA attention path (no Pallas kernel)")
    ap.add_argument("--fcos", action="store_true",
                    help="trace the rotated-FCOS bench workload instead")
    ap.add_argument("--train", action="store_true",
                    help="trace the RPN train step (train.sh config: swin_s "
                         "OBB 160^3 batch 2) instead of the eval forward")
    ap.add_argument("--backbone", default="swin_s",
                    help="anchor-RPN backbone to trace (e.g. resnet)")
    ap.add_argument("--batch", type=int, default=1,
                    help="eval-forward batch size (the serving bench uses 4)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--unit", default="",
                    help="restrict the table to one compile unit, e.g. "
                         "jit_fwd_stages")
    ap.add_argument("--dir", default=None)
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--gaps", action="store_true",
                    help="also print the wall-vs-trace decomposition "
                         "(per-step span/busy/idle/inter-step gap)")
    args = ap.parse_args()
    d = args.dir or ("/tmp/trace_train" if args.train else
                     "/tmp/trace_fcos" if args.fcos else
                     "/tmp/trace_fwd_jnp" if args.jnp_attn else
                     f"/tmp/trace_fwd_{args.backbone}" if
                     args.backbone != "swin_s" else "/tmp/trace_fwd")
    if args.batch != 1:
        d += f"_b{args.batch}"
    if not args.report_only:
        if args.train:
            capture_train(d)
        else:
            capture(d, args.jnp_attn, fcos=args.fcos, backbone=args.backbone,
                    batch=args.batch)
    report(d, args.top, unit=args.unit)
    if args.gaps:
        print()
        report_gaps(d)
