"""Optimizer + LR schedules (optax) — counterpart of
``tools/train_utils/optimization/`` (fastai OptimWrapper + OneCycle).

Reference semantics reproduced (SURVEY.md §2.5):
* ``adam_onecycle``: Adam with scheduled beta1 ("momentum" writes beta1,
  ``fastai_optim.py:181-187``), beta2=0.99, decoupled (true) weight decay
  applied to ALL params including BatchNorm (``bn_wd=True``,
  ``fastai_optim.py:135-152``).
* OneCycle: cosine low->max over the first PCT_START of total steps, then
  max -> low/1e4; momentum anneals max->min->max in mirror phases
  (``learning_schedules_fastai.py:53-77``).  The schedule is stepped by
  global iteration before each forward (``train_utils.py:34``).
* grad-clip by global norm (GRAD_NORM_CLIP) before the step.
* ``adam``/``sgd`` + LambdaLR decay-steps alternatives kept for config
  parity (optimization/__init__.py:12-18, 39-48).
"""

import numpy as np

import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


# float dtype for schedule math: f32 normally, f64 under jax_enable_x64
# (the training-trajectory twin pins the schedule against the reference's
# float64 numpy formula)
def _fdtype():
    return jnp.result_type(float)


def one_cycle_schedules(total_steps, lr_max, moms, div_factor, pct_start):
    """Returns (lr_schedule, mom_schedule) callables over the global step."""
    a1 = int(total_steps * pct_start)
    low_lr = lr_max / div_factor

    def lr_fn(step):
        step = jnp.asarray(step, _fdtype())
        p1 = jnp.clip(step / max(a1, 1), 0.0, 1.0)
        p2 = jnp.clip((step - a1) / max(total_steps - a1, 1), 0.0, 1.0)
        lr1 = annealing_cos(low_lr, lr_max, p1)
        lr2 = annealing_cos(lr_max, low_lr / 1e4, p2)
        return jnp.where(step < a1, lr1, lr2)

    def mom_fn(step):
        step = jnp.asarray(step, _fdtype())
        p1 = jnp.clip(step / max(a1, 1), 0.0, 1.0)
        p2 = jnp.clip((step - a1) / max(total_steps - a1, 1), 0.0, 1.0)
        m1 = annealing_cos(moms[0], moms[1], p1)
        m2 = annealing_cos(moms[1], moms[0], p2)
        return jnp.where(step < a1, m1, m2)

    return lr_fn, mom_fn


def decay_steps_schedule(total_iters_each_epoch, decay_step_list, lr, lr_decay,
                         lr_clip):
    """LambdaLR over epochs -> per-step multiplier (optimization/__init__.py:40-47)."""
    decay_steps = [x * total_iters_each_epoch for x in decay_step_list]

    def fn(step):
        cur = jnp.ones((), _fdtype())
        for ds in decay_steps:
            cur = jnp.where(step >= ds, cur * lr_decay, cur)
        return lr * jnp.maximum(cur, lr_clip / lr)

    return fn


def build_optimizer_and_schedule(optim_cfg, total_iters_each_epoch, total_epochs):
    """Returns (optax transform, lr_schedule_fn) — the transform consumes
    the schedule internally; lr_schedule_fn is exposed for logging."""
    total_steps = total_iters_each_epoch * total_epochs
    name = optim_cfg.OPTIMIZER

    if name == "adam_onecycle":
        lr_fn, mom_fn = one_cycle_schedules(
            total_steps,
            optim_cfg.LR,
            list(optim_cfg.MOMS),
            optim_cfg.DIV_FACTOR,
            optim_cfg.PCT_START,
        )
        tx = optax.chain(
            optax.clip_by_global_norm(optim_cfg.GRAD_NORM_CLIP),
            optax.inject_hyperparams(
                lambda b1: optax.scale_by_adam(b1=b1, b2=0.99, eps=1e-8)
            )(b1=mom_fn),
            optax.add_decayed_weights(optim_cfg.WEIGHT_DECAY),  # bn_wd=True: all params
            optax.inject_hyperparams(optax.scale_by_learning_rate)(
                learning_rate=lr_fn
            ),
        )
        return tx, lr_fn
    if name == "adam":
        lr_fn = decay_steps_schedule(
            total_iters_each_epoch, optim_cfg.DECAY_STEP_LIST, optim_cfg.LR,
            optim_cfg.LR_DECAY, optim_cfg.LR_CLIP,
        )
        tx = optax.chain(
            optax.clip_by_global_norm(optim_cfg.GRAD_NORM_CLIP),
            optax.scale_by_adam(),
            optax.add_decayed_weights(optim_cfg.WEIGHT_DECAY),
            optax.inject_hyperparams(optax.scale_by_learning_rate)(
                learning_rate=lr_fn
            ),
        )
        return tx, lr_fn
    if name == "sgd":
        lr_fn = decay_steps_schedule(
            total_iters_each_epoch, optim_cfg.DECAY_STEP_LIST, optim_cfg.LR,
            optim_cfg.LR_DECAY, optim_cfg.LR_CLIP,
        )
        tx = optax.chain(
            optax.clip_by_global_norm(optim_cfg.GRAD_NORM_CLIP),
            optax.trace(decay=optim_cfg.MOMENTUM),
            optax.add_decayed_weights(optim_cfg.WEIGHT_DECAY),
            optax.inject_hyperparams(optax.scale_by_learning_rate)(
                learning_rate=lr_fn
            ),
        )
        return tx, lr_fn
    raise NotImplementedError(name)
