"""Backbone / FPN / head shape and sanity tests (tiny grids for speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_rpn_tpu.models.fpn import FPN, upsample_nearest
from nerf_rpn_tpu.models.resnet import ResNetFPN256, ResNetSimplified
from nerf_rpn_tpu.models.vgg import VGGFPN
from nerf_rpn_tpu.models.swin import SwinFPN, _relative_position_index, _shift_attn_mask
from nerf_rpn_tpu.models.heads import RPNHead3D, FCOSHead3D
from nerf_rpn_tpu.models.anchors import (
    base_anchors,
    anchors_per_level,
    grid_anchors,
    level_strides,
    padding_valid_mask,
    DEFAULT_ANCHOR_SIZES,
    DEFAULT_ASPECT_RATIOS,
)


def test_upsample_nearest_2x_exact():
    x = jnp.arange(2 * 2 * 2 * 2 * 3, dtype=jnp.float32).reshape(2, 2, 2, 2, 3)
    y = upsample_nearest(x, (4, 4, 4))
    assert y.shape == (2, 4, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(y[:, ::2, ::2, ::2]), np.asarray(x))
    np.testing.assert_allclose(np.asarray(y[:, 1::2, 1::2, 1::2]), np.asarray(x))


def test_fpn_shapes():
    feats = [
        jnp.zeros((1, 16, 16, 16, 8)),
        jnp.zeros((1, 8, 8, 8, 16)),
        jnp.zeros((1, 4, 4, 4, 32)),
        jnp.zeros((1, 2, 2, 2, 64)),
    ]
    fpn = FPN(in_channels=(8, 16, 32, 64), out_channels=24, num_outs=4)
    params = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(params, feats)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16, 24),
        (1, 8, 8, 8, 24),
        (1, 4, 4, 4, 24),
        (1, 2, 2, 2, 24),
    ]


def test_resnet_fpn_pyramid_strides():
    x = jnp.zeros((1, 32, 32, 32, 4))
    model = ResNetFPN256(layers=(1, 1, 1, 1), is_max_pool=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    # stem /2, maxpool /2 -> stage0 at /4, then /8, /16, /32
    assert [o.shape for o in outs] == [
        (1, 8, 8, 8, 256),
        (1, 4, 4, 4, 256),
        (1, 2, 2, 2, 256),
        (1, 1, 1, 1, 256),
    ]


def test_resnet_train_updates_batch_stats():
    x = jnp.ones((1, 16, 16, 16, 4))
    model = ResNetFPN256(layers=(1, 1, 1, 1), is_max_pool=False)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    assert len(outs) == 4


def test_resnet_simplified():
    x = jnp.zeros((1, 8, 8, 8, 4))
    model = ResNetSimplified(out_channels=16, num_residuals=1)
    variables = model.init(jax.random.PRNGKey(0), x)
    (out,) = model.apply(variables, x)
    assert out.shape == (1, 8, 8, 8, 16)


def test_vgg_fpn_small_input():
    """input_size < 160 -> stride-1 stem, pyramid /1, /2, /4, /8."""
    x = jnp.zeros((1, 16, 16, 16, 4))
    model = VGGFPN(cfg="AF", input_size=16)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16, 256),
        (1, 8, 8, 8, 256),
        (1, 4, 4, 4, 256),
        (1, 2, 2, 2, 256),
    ]


def test_vgg_fpn_large_input_strides():
    """input_size >= 160 -> stride-4 stem; use a 32^3 probe with input_size
    declared 160 to keep the test fast."""
    x = jnp.zeros((1, 32, 32, 32, 4))
    model = VGGFPN(cfg="AF", input_size=160, conv_at_start=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 8, 256),
        (1, 4, 4, 4, 256),
        (1, 2, 2, 2, 256),
        (1, 1, 1, 1, 256),
    ]


def test_swin_fpn_shapes():
    x = jnp.zeros((1, 32, 32, 32, 4))
    model = SwinFPN(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 8, 256),
        (1, 4, 4, 4, 256),
        (1, 2, 2, 2, 256),
        (1, 1, 1, 1, 256),
    ]


def test_swin_shifted_blocks_differ():
    """Shifted (odd) blocks must change the result vs unshifted-only."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 4))
    m2 = SwinFPN(embed_dim=8, depths=(2,), num_heads=(2,), patch_size=(2, 2, 2),
                 window=(2, 2, 2))
    v2 = m2.init(jax.random.PRNGKey(0), x)
    outs = m2.apply(v2, x)
    assert outs[0].shape == (1, 4, 4, 4, 256)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_relative_position_index_table():
    idx = _relative_position_index((2, 2, 2))
    assert idx.shape == (64,)
    assert idx.min() >= 0 and idx.max() < 27
    # self-pairs all map to the central entry
    self_idx = idx.reshape(8, 8).diagonal()
    assert len(set(self_idx.tolist())) == 1


def test_shift_attn_mask():
    mask = _shift_attn_mask((4, 4, 4), (2, 2, 2), (1, 1, 1))
    assert mask.shape == (8, 8, 8)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    assert _shift_attn_mask((4, 4, 4), (2, 2, 2), (0, 0, 0)) is None


def test_rpn_head():
    feats = [jnp.zeros((2, 8, 8, 8, 32)), jnp.zeros((2, 4, 4, 4, 32))]
    head = RPNHead3D(in_channels=32, num_anchors=13, conv_depth=2, rotate=True)
    variables = head.init(jax.random.PRNGKey(0), feats)
    logits, deltas = head.apply(variables, feats)
    assert logits[0].shape == (2, 8, 8, 8, 13)
    assert deltas[0].shape == (2, 8, 8, 8, 13 * 8)
    assert logits[1].shape == (2, 4, 4, 4, 13)


def test_fcos_head():
    feats = [jnp.zeros((1, 8, 8, 8, 32)), jnp.zeros((1, 4, 4, 4, 32))]
    head = FCOSHead3D(in_channels=32, rotate=False, fpn_strides=(4, 8))
    variables = head.init(jax.random.PRNGKey(0), feats)
    cls, reg, ctr = head.apply(variables, feats)
    assert cls[0].shape == (1, 8, 8, 8, 1)
    assert reg[0].shape == (1, 8, 8, 8, 6)
    assert ctr[0].shape == (1, 8, 8, 8, 1)
    # eval mode: reg distances are relu'd and stride-scaled -> non-negative
    assert np.asarray(reg[0]).min() >= 0
    # focal bias init: cls sigmoid ~ prior_prob
    p = jax.nn.sigmoid(np.asarray(cls[0])).mean()
    assert abs(p - 0.01) < 0.005


def test_fcos_head_folded_tower_matches_unfolded(monkeypatch):
    """The batch-folded tower (fold_batch_z: scenes into z with re-zeroed
    gaps, one fold/unfold per level) must reproduce the per-scene tower
    to float roundoff — the only difference is the GN stat reduce order."""
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(2, 12, 12, 12, 32)), jnp.float32),
             jnp.asarray(rng.normal(size=(2, 6, 6, 10, 32)), jnp.float32)]
    head = FCOSHead3D(in_channels=32, num_levels=2, num_convs=2, rotate=True,
                      fpn_strides=(4, 8))
    variables = head.init(jax.random.PRNGKey(0), feats)
    monkeypatch.setenv("NERF_RPN_TPU_FCOS_FOLD_TOWER", "1")
    folded = head.apply(variables, feats, train=True)
    monkeypatch.setenv("NERF_RPN_TPU_FCOS_FOLD_TOWER", "0")
    plain = head.apply(variables, feats, train=True)
    for xs, ys in zip(folded, plain):
        for x, y in zip(xs, ys):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-5, rtol=1e-4)


def test_anchor_counts_default_config():
    """Default config must produce 13 anchors per location (SURVEY 2.4)."""
    assert anchors_per_level(DEFAULT_ANCHOR_SIZES[0], DEFAULT_ASPECT_RATIOS[0]) == 13
    base = base_anchors(DEFAULT_ANCHOR_SIZES[0], DEFAULT_ASPECT_RATIOS[0])
    assert base.shape == (13, 6)
    # all zero-centred
    np.testing.assert_allclose(base[:, :3], -base[:, 3:])


def test_grid_anchors():
    a = grid_anchors((2, 2, 2), (4, 4, 4), (8.0,), (((1.0, 1.0, 1.0),),))
    assert a.shape == (8, 6)
    # first anchor centred at 0, size 8
    np.testing.assert_allclose(a[0], [-4, -4, -4, 4, 4, 4])
    # last anchor centred at (4, 4, 4)
    np.testing.assert_allclose(a[-1], [0, 0, 0, 8, 8, 8])


def test_level_strides_and_padding_mask():
    strides = level_strides((64, 64, 64), [(16, 16, 16), (8, 8, 8)])
    assert strides == [(4, 4, 4), (8, 8, 8)]
    mask = padding_valid_mask((4, 4, 4), (4, 4, 4), (9, 16, 16), num_anchors=2)
    m = mask.reshape(4, 4, 4, 2)
    assert m[:3].all() and not m[3:].any()  # ceil(9/4)=3 valid cells in x


def test_swin_staged_apply_matches_monolithic(rng):
    """The stage-wise compile units (embed | stages | neck) must reproduce
    the monolithic forward exactly — inference drivers jit them separately
    so the Pallas attention kernel never shares a program with convs."""
    m = SwinFPN(embed_dim=16, depths=(1, 1), num_heads=(2, 2), out_channels=16)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    full = m.apply(v, x)
    tokens = m.apply(v, x, stage="embed")
    feats = m.apply(v, tokens, stage="stages")
    pyr = m.apply(v, feats, stage="neck")
    assert len(full) == len(pyr)
    for a, b in zip(full, pyr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swin_eval_step_split_units_match_model(rng):
    """make_rpn_eval_step's split Swin forward == NeRFRPN.apply outputs."""
    from flax.core import FrozenDict

    from nerf_rpn_tpu.models import rpn as rpn_lib
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from nerf_rpn_tpu.train.steps import make_rpn_eval_step

    shape = (16, 16, 16)
    model = NeRFRPN(backbone_type="swin_t", resolution=16, conv_depth=1)
    cfg = RPNConfig(rotated=False, pre_nms_top_n=32, post_nms_top_n=16)
    grids = jnp.asarray(rng.normal(size=(1, *shape, 4)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), grids)
    tx, _ = make_optimizer(1e-3, 10)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=None, tx=tx)
    eval_step = make_rpn_eval_step(model, cfg, shape)
    assert len(eval_step.forward_units) == 3  # swin => split units
    feats, obj_l, dl_l, vox = eval_step.forward(state, grids)

    ref_feats, ref_logits, ref_deltas = model.apply(variables, grids,
                                                    train=False)
    # different compile units => different XLA fusion/accumulation order;
    # agreement is to f32 round-off, not bit-exact
    tol = dict(rtol=3e-5, atol=3e-5)
    for got, ref in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)
    ref_obj, ref_dl = rpn_lib.flatten_head_outputs(
        ref_logits[:4], ref_deltas[:4], cfg.delta_dim)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(obj_l, 1)), np.asarray(ref_obj), **tol)
    # deltas cross the boundary in the head's native (B, V, A*D) layout
    # (voxel-major, anchor-then-coord minor) — flatten for comparison
    dl_flat = jnp.concatenate(
        [d.reshape(d.shape[0], -1, cfg.delta_dim) for d in dl_l], 1)
    np.testing.assert_allclose(
        np.asarray(dl_flat), np.asarray(ref_dl), **tol)


def test_swin_train_step_stochastic_depth_rng(rng):
    """Swin training needs a "dropout" rng for stochastic depth — the train
    steps must plumb it (regression: InvalidRngError in run_rpn --backbone
    swin_* --mode train)."""
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.state import create_train_state, make_optimizer
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    shape = (16, 16, 16)
    model = NeRFRPN(backbone_type="swin_t", resolution=16, conv_depth=1)
    cfg = RPNConfig(rotated=False, pre_nms_top_n=32, post_nms_top_n=16,
                    batch_size_per_mesh=8)
    tx, _ = make_optimizer(1e-3, 10)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, *shape, 4)), tx)
    batch = {
        "grids": jnp.asarray(rng.normal(size=(1, *shape, 4)).astype(np.float32)),
        "ori_sizes": jnp.full((1, 3), 16, jnp.int32),
        "gt_boxes": jnp.asarray([[[2, 2, 2, 9, 9, 9]]], jnp.float32),
        "gt_mask": jnp.ones((1, 1), bool),
    }
    train_step, _ = make_rpn_train_step(model, cfg, shape, (4, 8))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_swin_fcos_eval_step_split_units_match_model(rng):
    """make_fcos_eval_step's split Swin forward == FCOSOverNeRF.apply."""
    from flax.core import FrozenDict

    from nerf_rpn_tpu.models import fcos as fcos_lib
    from nerf_rpn_tpu.models.fcos import FCOSConfig
    from nerf_rpn_tpu.models.nerf_rpn import FCOSOverNeRF
    from nerf_rpn_tpu.train.state import TrainState, make_optimizer
    from nerf_rpn_tpu.train.steps import make_fcos_eval_step

    shape = (16, 16, 16)
    model = FCOSOverNeRF(backbone_type="swin_t", resolution=16, num_convs=1)
    cfg = FCOSConfig(pre_nms_top_n=32, fpn_post_nms_top_n=16)
    grids = jnp.asarray(rng.normal(size=(1, *shape, 4)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), grids)
    tx, _ = make_optimizer(1e-3, 10)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=None, tx=tx)
    eval_step = make_fcos_eval_step(model, cfg, shape)
    assert len(eval_step.forward_units) == 3
    cls_f, reg_f, ctr_f, vox = eval_step.forward(state, grids)

    _, rc, rr, rt = model.apply(variables, grids, train=False)
    tol = dict(rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(cls_f), np.asarray(fcos_lib.flatten_fcos_outputs(rc, 1)),
        **tol)
    np.testing.assert_allclose(
        np.asarray(reg_f),
        np.asarray(fcos_lib.flatten_fcos_outputs(rr, cfg.reg_dim)), **tol)
    np.testing.assert_allclose(
        np.asarray(ctr_f), np.asarray(fcos_lib.flatten_fcos_outputs(rt, 1)),
        **tol)


def test_stem_conv_unfold_matches_plain(rng):
    """StemConv3D's z-unfolded formulation == the plain 7^3/2 conv (it is
    the C_in=4 lane fix for the resnet/vgg stems; resnet bench forward
    went 45 -> 33 ms/scene)."""
    from nerf_rpn_tpu.models.resnet import StemConv3D

    for shape, use_bias in [((1, 20, 18, 16, 4), False),  # x/y/z s2d path
                            ((1, 16, 16, 15, 4), True),   # odd z fallback
                            ((1, 14, 9, 12, 4), True),    # odd y: quadshift
                            ((2, 8, 12, 10, 3), True)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        stem = StemConv3D(8, use_bias=use_bias)
        v = stem.init(jax.random.PRNGKey(0), x)
        y = stem.apply(v, x)
        ref = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], window_strides=(2, 2, 2),
            padding=((3, 3),) * 3,
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))
        if use_bias:
            ref = ref + v["params"]["bias"]
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_recorded_grad_norm_matches_global_norm():
    """clip_by_global_norm_recorded is bit-neutral vs optax's clip and
    records the pre-clip norm (reused by the train steps' grad_norm
    metric instead of a second full reduction over the grads)."""
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_rpn_tpu.train.state import (
        clip_by_global_norm_recorded,
        recorded_grad_norm,
    )

    grads = {
        "a": jnp.asarray([[3.0, -4.0], [1.0, 2.0]]),
        "b": jnp.asarray([10.0, -7.0]),
    }
    params = jax.tree.map(jnp.zeros_like, grads)
    for max_norm in (0.1, 1e6):  # triggered and untriggered branches
        ours = clip_by_global_norm_recorded(max_norm)
        ref = optax.clip_by_global_norm(max_norm)
        ou, os_ = ours.update(grads, ours.init(params), params)
        ru, _ = ref.update(grads, ref.init(params), params)
        for k in grads:
            assert (ou[k] == ru[k]).all(), (max_norm, k)
        import numpy as np

        np.testing.assert_allclose(
            recorded_grad_norm(os_), optax.global_norm(grads), rtol=1e-6)
    # multi_transform nesting still findable
    tx = optax.multi_transform(
        {"t": optax.chain(clip_by_global_norm_recorded(0.1),
                          optax.adamw(1e-3)),
         "f": optax.set_to_zero()},
        {"a": "t", "b": "f"},
    )
    st = tx.init(params)
    _, st = tx.update(grads, st, params)
    assert recorded_grad_norm(st) is not None
