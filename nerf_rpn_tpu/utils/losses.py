"""Loss primitives shared by the RPN / FCOS / RCNN heads.

Mask-weighted versions of: smooth L1 (beta form, matching
``torch.nn.functional.smooth_l1_loss(beta=...)`` used at reference
``model/rpn.py:400-409``), binary cross-entropy with logits
(``rpn.py:419``), sigmoid focal loss (FCOS cls, reference
``fcos/loss.py:538-542`` via torchvision), and the axis-aligned 3D IoU loss
family (``fcos/loss.py:77-132``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """Elementwise smooth-L1 (Huber/beta form). beta -> 0 degrades to L1."""
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy on logits (numerically stable)."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Elementwise sigmoid focal loss (RetinaNet form, torchvision parity)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def _ltf_rbb_inter_union(pred: jax.Array, target: jax.Array):
    """Intersection/union of boxes given as distances (l, t, f, r, b, ba)
    from a shared location — the FCOS regression parameterisation."""
    pl, pt, pf, pr, pb, pba = (pred[..., i] for i in range(6))
    tl, tt, tf, tr, tb, tba = (target[..., i] for i in range(6))
    p_vol = (pl + pr) * (pt + pb) * (pf + pba)
    t_vol = (tl + tr) * (tt + tb) * (tf + tba)
    iw = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    ih = jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
    idp = jnp.minimum(pf, tf) + jnp.minimum(pba, tba)
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0) * jnp.clip(idp, 0)
    union = p_vol + t_vol - inter
    return inter, union, p_vol, t_vol


def iou_loss_aabb(
    pred: jax.Array,
    target: jax.Array,
    loss_type: str = "iou",
    eps: float = 1e-7,
) -> jax.Array:
    """FCOS-style IoU loss on distance-encoded AABBs (..., 6).

    loss_type: 'iou' (-log iou), 'linear_iou' (1 - iou) or 'giou'.
    """
    inter, union, p_vol, t_vol = _ltf_rbb_inter_union(pred, target)
    iou = (inter + eps) / (union + eps)
    if loss_type == "iou":
        return -jnp.log(iou)
    if loss_type == "linear_iou":
        return 1.0 - iou
    if loss_type == "giou":
        pl, pt, pf, pr, pb, pba = (pred[..., i] for i in range(6))
        tl, tt, tf, tr, tb, tba = (target[..., i] for i in range(6))
        cw = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
        ch = jnp.maximum(pt, tt) + jnp.maximum(pb, tb)
        cd = jnp.maximum(pf, tf) + jnp.maximum(pba, tba)
        c_vol = cw * ch * cd + eps
        giou = iou - (c_vol - union) / c_vol
        return 1.0 - giou
    raise ValueError(f"unknown iou loss type {loss_type}")


def masked_mean(values: jax.Array, mask: jax.Array, denom: jax.Array | None = None):
    """sum(values * mask) / denom (denom defaults to sum(mask), min 1)."""
    maskf = mask.astype(values.dtype)
    total = jnp.sum(values * maskf)
    if denom is None:
        denom = jnp.maximum(jnp.sum(maskf), 1.0)
    return total / denom
