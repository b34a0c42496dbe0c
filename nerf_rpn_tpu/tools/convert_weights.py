"""Reference (torch) checkpoint -> flax params converter.

The released NeRF-RPN weights are torch state dicts
``{epoch, backbone_state_dict, rpn_head_state_dict|fcos_state_dict,
train_args}`` (reference ``run_rpn.py:294-300``); this module maps them onto
this framework's flax parameter / batch-stats trees so the pretrained models
evaluate natively on TPU (SURVEY 5.4: the conversion tool is the
acceptance-gate for eval parity).

Layout rules:
- Conv3d weight (out, in, kx, ky, kz) -> flax kernel (kx, ky, kz, in, out).
- Linear weight (out, in) -> flax kernel (in, out).
- BatchNorm3d weight/bias -> scale/bias; running stats -> batch_stats.
- LayerNorm/GroupNorm weight/bias -> scale/bias.
- RPN head cls/bbox output channels are permuted from the reference's
  ``set()``-ordered anchor permutations to this framework's insertion-order
  dedup (``models/anchors.py``) — tuple hashing is unsalted in CPython, so
  the reference's set order is reproducible here.

Usage: ``python -m nerf_rpn_tpu.tools.convert_weights --checkpoint x.pt
--backbone_type swin_s --out params.msgpack [--fcos] [--rotated]``.
"""

from __future__ import annotations

import argparse
from itertools import permutations

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _np(t) -> np.ndarray:
    return np.asarray(t)


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _conv_p(sd, prefix, bias=True):
    p = {"kernel": _conv(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _dense(sd, prefix, bias=True):
    p = {"kernel": _linear(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


# ---------------------------------------------------------------------------
# Anchor-order permutation
# ---------------------------------------------------------------------------


def anchor_permutation(ratios) -> np.ndarray:
    """perm[j] = index in the REFERENCE anchor order of our j-th anchor.

    The reference dedups each ratio triple via ``set(permutations(r))`` then
    concatenates across triples with scales-minor ordering matching ours
    (``anchor.py:59-68``); we dedup in insertion order.  Number hashing is
    deterministic, so the set order reproduces here.
    """
    ref_perms, ours = [], []
    for r in ratios:
        ref_perms.extend(set(permutations(r)))
        ours.extend(dict.fromkeys(permutations(r)))
    # reference dedups across triples too (cur_ratios is one set across the
    # level, anchor.py:40-46) — but generate_anchors concatenates per-triple
    # sets; replicate the per-triple set order used by generate_anchors.
    index_of = {}
    for i, p in enumerate(ref_perms):
        index_of.setdefault(p, i)
    return np.asarray([index_of[p] for p in ours], np.int64)


def _permute_out_channels(w_oihw: np.ndarray, perm: np.ndarray, group: int):
    """Reorder conv output channels grouped per anchor (group = channels per
    anchor)."""
    out = w_oihw.reshape(len(perm), group, *w_oihw.shape[1:])
    return out[perm].reshape(w_oihw.shape)


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------


def convert_resnet_fpn256(sd: dict, layers=(3, 4, 6, 3)):
    """reference ``ResNet_FPN_256`` state dict -> (params, batch_stats)."""
    params, stats = {}, {}
    params["stem_conv"] = _conv_p(sd, "conv1", bias=False)
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    n = len(layers)
    for i, depth in enumerate(layers):
        for j in range(depth):
            base = f"layers.{i}.{j}"
            name = f"stage{i}_block{j}"
            p, s = {}, {}
            for k in (1, 2, 3):
                p[f"conv{k}"] = _conv_p(sd, f"{base}.conv{k}", bias=False)
                p[f"bn{k}"], s[f"bn{k}"] = _bn(sd, f"{base}.bn{k}")
            if f"{base}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv_p(sd, f"{base}.downsample.0", bias=False)
                p["downsample_bn"], s["downsample_bn"] = _bn(sd, f"{base}.downsample.1")
            params[name] = p
            stats[name] = s
    # reference latlayers[k] serves level n-1-k (built top-down,
    # feature_extractor.py:179-185); smooths[i] serves level n-2-i
    for k in range(n):
        params[f"lateral_{n - 1 - k}"] = _conv_p(sd, f"latlayers.{k}")
    for i in range(n - 1):
        params[f"smooth_{n - 2 - i}"] = _conv_p(sd, f"smooths.{i}")
    return params, stats


def convert_fpn_neck(sd: dict, prefix: str, n: int):
    params = {}
    for i in range(n):
        params[f"lateral_{i}"] = _conv_p(sd, f"{prefix}.lateral_convs.{i}")
        params[f"output_{i}"] = _conv_p(sd, f"{prefix}.fpn_convs.{i}")
    return params


def convert_vgg_fpn(sd: dict, cfg: str = "AF", input_size: int = 160,
                    conv_at_start: bool = False, batch_norm: bool = True):
    """reference ``VGG_FPN`` state dict -> (params, batch_stats).

    The torch module packs the stem into ``layers.{0..3}`` and each pyramid
    stage into a nested Sequential ``layers.{4+f}.{i}``.
    """
    from nerf_rpn_tpu.models.vgg import VGG_CFGS

    params, stats = {}, {}
    stem_len = 4 if input_size >= 160 else 3
    params["stem_conv"] = _conv_p(sd, "layers.0")
    if batch_norm:
        params["stem_bn"], stats["stem_bn"] = _bn(sd, "layers.1")

    li = 0           # our layer counter
    block = stem_len  # torch child index within `layers`
    inner = 0        # index within the nested Sequential
    for v in VGG_CFGS[cfg]:
        if v == "M":
            inner += 1
        elif v == "F":
            block += 1
            inner = 0
        else:
            name = f"layer{li}"
            params[f"{name}_conv"] = _conv_p(sd, f"layers.{block}.{inner}")
            if batch_norm:
                params[f"{name}_bn"], stats[f"{name}_bn"] = _bn(
                    sd, f"layers.{block}.{inner + 1}")
                inner += 3
            else:
                inner += 2
            li += 1

    if conv_at_start:
        for our, ref in (("start0", "starting_layers.0"), ("start1", "starting_layers.3"),
                         ("ds0", "ds_layers.0"), ("ds1", "ds_layers.3"),
                         ("ds2", "ds_layers.6")):
            params[f"{our}_conv"] = _conv_p(sd, ref)
        for our, ref in (("start0", "starting_layers.1"), ("start1", "starting_layers.4"),
                         ("ds0", "ds_layers.1"), ("ds1", "ds_layers.4"),
                         ("ds2", "ds_layers.7")):
            params[f"{our}_bn"], stats[f"{our}_bn"] = _bn(sd, ref)

    params["fpn_neck"] = convert_fpn_neck(sd, "fpn_neck", 4)
    return params, stats


def convert_swin_fpn(sd: dict, depths=(2, 2, 18, 2)):
    """reference ``SwinTransformer_FPN`` state dict -> (params, {})."""
    params = {}
    params["patch_embed"] = _conv_p(sd, "patch_partition.0")
    params["patch_norm"] = _ln(sd, "patch_partition.2")
    for i_stage, depth in enumerate(depths):
        # torch packs [PatchMerging?] + blocks into a Sequential
        off = 0
        if i_stage > 0:
            base = f"stages.{i_stage}.0"
            params[f"merge_{i_stage}"] = {
                "norm": _ln(sd, f"{base}.norm"),
                "reduction": _dense(sd, f"{base}.reduction", bias=False),
            }
            off = 1
        for j in range(depth):
            base = f"stages.{i_stage}.{j + off}"
            blk = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{base}.attn.qkv"),
                    "proj": _dense(sd, f"{base}.attn.proj"),
                    "relative_position_bias_table": _np(
                        sd[f"{base}.attn.relative_position_bias_table"]
                    ),
                },
                "mlp_fc1": _dense(sd, f"{base}.mlp.0"),
                "mlp_fc2": _dense(sd, f"{base}.mlp.3"),
            }
            params[f"stage{i_stage}_block{j}"] = blk
    params["fpn_neck"] = convert_fpn_neck(sd, "fpn_neck", len(depths))
    return params, {}


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def convert_rpn_head(sd: dict, conv_depth: int, ratios, rotated: bool):
    params = {}
    for d in range(conv_depth):
        params[f"tower_{d}"] = _conv_p(sd, f"conv.{2 * d}")
    perm = anchor_permutation(ratios)
    reg = 8 if rotated else 6
    cls = _conv_p(sd, "cls_logits")
    bbox = _conv_p(sd, "bbox_pred")
    # permute anchors: torch layout is (A[*G], in, k, k, k) on axis 0
    cls_w = _permute_out_channels(np.asarray(sd["cls_logits.weight"]), perm, 1)
    bbox_w = _permute_out_channels(np.asarray(sd["bbox_pred.weight"]), perm, reg)
    cls["kernel"] = _conv(cls_w)
    bbox["kernel"] = _conv(bbox_w)
    cls["bias"] = _np(sd["cls_logits.bias"]).reshape(len(perm), 1)[perm].reshape(-1)
    bbox["bias"] = _np(sd["bbox_pred.bias"]).reshape(len(perm), reg)[perm].reshape(-1)
    params["cls_logits"] = cls
    params["bbox_pred"] = bbox
    return params


def convert_fcos_head(sd: dict, num_convs: int, num_levels: int = 4):
    params = {}
    for prefix in ("cls_tower", "bbox_tower"):
        for d in range(num_convs):
            params[f"{prefix}_{d}_conv"] = _conv_p(sd, f"{prefix}.{3 * d}")
            gn = f"{prefix}.{3 * d + 1}"
            params[f"{prefix}_{d}_gn"] = {
                "scale": _np(sd[f"{gn}.weight"]),
                "bias": _np(sd[f"{gn}.bias"]),
            }
    for name in ("cls_logits", "bbox_pred", "centerness"):
        params[name] = _conv_p(sd, name)
    for lvl in range(num_levels):
        params[f"scale_{lvl}"] = {"scale": _np(sd[f"scales.{lvl}.scale"]).reshape(())}
    return params


# ---------------------------------------------------------------------------
# Full checkpoints
# ---------------------------------------------------------------------------


def convert_backbone(sd: dict, backbone_type: str, **kw):
    if backbone_type == "resnet":
        return convert_resnet_fpn256(sd, kw.get("layers", (3, 4, 6, 3)))
    if backbone_type.startswith("vgg"):
        return convert_vgg_fpn(sd, cfg=backbone_type.split("_")[1], **{
            k: v for k, v in kw.items() if k in ("input_size", "conv_at_start",
                                                 "batch_norm")})
    if backbone_type.startswith("swin"):
        from nerf_rpn_tpu.models.swin import SWIN_VARIANTS

        depths = SWIN_VARIANTS[backbone_type]["depths"]
        return convert_swin_fpn(sd, depths)
    raise ValueError(backbone_type)


def convert_rpn_checkpoint(ckpt: dict, backbone_type: str, conv_depth: int = 4,
                           rotated: bool = False, ratios=None, **kw):
    """Full reference anchor-RPN checkpoint -> {params, batch_stats}."""
    from nerf_rpn_tpu.models.anchors import DEFAULT_ASPECT_RATIOS

    ratios = ratios or DEFAULT_ASPECT_RATIOS[0]
    bb_params, bb_stats = convert_backbone(
        ckpt["backbone_state_dict"], backbone_type, **kw)
    head_params = convert_rpn_head(
        ckpt["rpn_head_state_dict"], conv_depth, ratios, rotated)
    return {
        "params": {"backbone": bb_params, "rpn_head": head_params},
        "batch_stats": {"backbone": bb_stats} if bb_stats else {},
    }


def convert_fcos_checkpoint(ckpt: dict, backbone_type: str, num_convs: int = 4,
                            **kw):
    """Full reference FCOS checkpoint -> {params, batch_stats}.

    The fcos_state_dict holds the FCOSModule: head weights under ``head.*``.
    """
    bb_params, bb_stats = convert_backbone(
        ckpt["backbone_state_dict"], backbone_type, **kw)
    head_sd = {
        k[len("head."):]: v
        for k, v in ckpt["fcos_state_dict"].items()
        if k.startswith("head.")
    }
    head_params = convert_fcos_head(head_sd, num_convs)
    return {
        "params": {"backbone": bb_params, "fcos_head": head_params},
        "batch_stats": {"backbone": bb_stats} if bb_stats else {},
    }


def load_torch_checkpoint(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return {
        k: ({kk: vv.numpy() if hasattr(vv, "numpy") else vv
             for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in ckpt.items()
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert torch NeRF-RPN weights to flax.")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--backbone_type", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--fcos", action="store_true")
    p.add_argument("--rotated", action="store_true")
    p.add_argument("--conv_depth", type=int, default=4)
    args = p.parse_args(argv)

    ckpt = load_torch_checkpoint(args.checkpoint)
    if args.fcos:
        variables = convert_fcos_checkpoint(ckpt, args.backbone_type,
                                            num_convs=args.conv_depth)
    else:
        variables = convert_rpn_checkpoint(ckpt, args.backbone_type,
                                           conv_depth=args.conv_depth,
                                           rotated=args.rotated)
    from flax.serialization import msgpack_serialize

    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(variables))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
