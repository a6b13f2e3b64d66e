"""Optimizer + schedules + EMA, as pure pytree transforms.

Mirrors the reference training recipe
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/engine/trainer.py:885`
build_optimizer, `:233` _setup_scheduler, warmup interpolation in `_do_train`,
`utils/torch_utils.py:722` ModelEMA):

* SGD + Nesterov momentum with three parameter groups — conv/dense kernels
  (weight-decayed), norm scales & 1-D params (no decay), biases (no decay,
  separate warmup start at ``warmup_bias_lr``).
* Linear (or cosine) epoch LR decay lr0 -> lr0*lrf; per-iteration linear
  warmup of lr (0 or warmup_bias_lr -> lr) and momentum
  (warmup_momentum -> momentum) over the first ``warmup_epochs``.
* EMA with the reference's ramped decay d = decay*(1 - exp(-step/tau)).

Implemented as hand-rolled jnp tree ops (not optax chains) so the
per-iteration lr/momentum scalars can be fed straight into the jitted train
step without rebuilding any optimizer state.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = Any


def _leaf_name(path) -> str:
    last = path[-1]
    return getattr(last, "key", getattr(last, "name", str(last)))


def param_groups(params: Params) -> Params:
    """0 = decayed kernels, 1 = other (norm scales, gates, mtl vars), 2 = biases."""

    def tag(path, leaf):
        name = _leaf_name(path)
        if name == "bias":
            return 2
        if name == "kernel" and leaf.ndim > 1:
            return 0
        return 1

    return jax.tree_util.tree_map_with_path(tag, params)


def init_momentum(params: Params) -> Params:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def clip_by_global_norm(grads: Params, max_norm: float) -> Params:
    """Global-norm gradient clipping (reference engine/trainer.py:713,
    clip_grad_norm_ max_norm=10.0). Essential: BN backward through
    low-variance activations can produce huge early-layer gradients."""
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree_util.tree_leaves(grads))
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads)


def sgd_update(
    params: Params,
    grads: Params,
    momentum_buf: Params,
    groups: Params,
    lr: jax.Array,
    lr_bias: jax.Array,
    momentum: jax.Array,
    weight_decay: float,
    nesterov: bool = True,
    max_grad_norm: float = 10.0,
):
    """One SGD step over the whole tree; returns (new_params, new_buf)."""
    if max_grad_norm and max_grad_norm > 0:
        grads = clip_by_global_norm(grads, max_grad_norm)

    def upd(g_tag, p, g, buf):
        g = g + jnp.where(g_tag == 0, weight_decay, 0.0) * p
        buf = momentum * buf + g
        d = g + momentum * buf if nesterov else buf
        step_lr = jnp.where(g_tag == 2, lr_bias, lr)
        return p - step_lr * d, buf

    out = jax.tree_util.tree_map(upd, groups, params, grads, momentum_buf)
    new_params = jax.tree_util.tree_map(lambda x: x[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_buf = jax.tree_util.tree_map(lambda x: x[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, new_buf


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Per-iteration lr/momentum schedule (host-side, returns python floats)."""

    lr0: float
    lrf: float
    momentum: float
    warmup_epochs: float
    warmup_momentum: float
    warmup_bias_lr: float
    epochs: int
    steps_per_epoch: int
    cos_lr: bool = False

    def epoch_lr_factor(self, epoch: int) -> float:
        x = epoch / max(1, self.epochs)
        if self.cos_lr:
            return (1 - self.lrf) * 0.5 * (1 + math.cos(math.pi * x)) + self.lrf
        return max(1 - x, 0) * (1.0 - self.lrf) + self.lrf

    def at(self, step: int) -> tuple[float, float, float]:
        """(lr, lr_bias, momentum) for global iteration ``step``."""
        epoch = step // max(1, self.steps_per_epoch)
        base = self.lr0 * self.epoch_lr_factor(epoch)
        nw = max(round(self.warmup_epochs * self.steps_per_epoch), 100)
        if step < nw:
            t = step / nw
            lr = t * base
            lr_bias = self.warmup_bias_lr + t * (base - self.warmup_bias_lr)
            mom = self.warmup_momentum + t * (self.momentum - self.warmup_momentum)
        else:
            lr = lr_bias = base
            mom = self.momentum
        return lr, lr_bias, mom


def ema_update(ema: Params, params: Params, step: jax.Array, decay: float, tau: float):
    """Ramped EMA (reference ModelEMA torch_utils.py:722)."""
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema, params)
