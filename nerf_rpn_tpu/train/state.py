"""Train state, optimizer and schedule factories.

Parity target: reference training setup (``run_rpn.py:345-349, 390``):
AdamW (wd 0.01) + OneCycleLR(max_lr, total_steps) + global-norm gradient
clipping at 0.1.  ``optax.cosine_onecycle_schedule`` matches torch
OneCycleLR's cosine shape and default div factors (25 / 1e4, pct_start 0.3).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class GradNormClipState(NamedTuple):
    """State of :func:`clip_by_global_norm_recorded` — carries the
    pre-clip gradient norm so the train step's ``grad_norm`` metric reads
    it instead of re-reducing every gradient tensor (a full extra pass
    over ~200 MB of f32 grads per step at swin_s scale)."""

    grad_norm: jax.Array


def clip_by_global_norm_recorded(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` with the computed norm kept in state.

    The update arithmetic mirrors optax exactly (``jnp.where(norm < max,
    t, (t / norm) * max)``), so swapping this in is bit-neutral."""

    def init_fn(params):
        del params
        return GradNormClipState(jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        trigger = g_norm < max_norm
        updates = jax.tree.map(
            lambda t: jnp.where(trigger, t, (t / g_norm.astype(t.dtype))
                                * max_norm),
            updates,
        )
        return updates, GradNormClipState(g_norm.astype(jnp.float32))

    return optax.GradientTransformation(init_fn, update_fn)


def recorded_grad_norm(opt_state) -> jax.Array | None:
    """The pre-clip grad norm recorded by the last update, or ``None`` if
    the optimizer has no recording clip (works through ``multi_transform``
    wrappers — the state is found by pytree search)."""
    leaves = jax.tree.leaves(
        opt_state, is_leaf=lambda n: isinstance(n, GradNormClipState))
    norms = [l.grad_norm for l in leaves if isinstance(l, GradNormClipState)]
    return norms[0] if norms else None


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt,
        )


def make_optimizer(
    lr: float,
    total_steps: int,
    weight_decay: float = 0.01,
    clip_grad_norm: float = 0.1,
    pct_start: float = 0.3,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    # transition_steps >= 4: below that the warmup phase rounds to zero
    # steps and optax's onecycle divides 0/0 -> NaN lr, which NaNs every
    # parameter on the first AdamW update (bit us on 1-epoch smoke runs)
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4),
        peak_value=lr,
        pct_start=pct_start,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    tx = optax.chain(
        clip_by_global_norm_recorded(clip_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    return tx, schedule


def create_train_state(model, rng, sample_input, tx) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
