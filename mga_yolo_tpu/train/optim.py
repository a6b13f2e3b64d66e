"""Optimizer factory + schedules + EMA, as pure pytree transforms.

Mirrors the reference training recipe
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/engine/trainer.py:885`
build_optimizer, `:233` _setup_scheduler, warmup interpolation in `_do_train`,
`utils/torch_utils.py:722` ModelEMA):

* Optimizer factory: SGD (Nesterov), Adam-family (Adam/Adamax/NAdam/RAdam ->
  Adam; AdamW decoupled decay), RMSProp, and ``auto`` — the reference's
  auto rule picks SGD(lr 0.01, m 0.9) when total iterations > 10k else
  AdamW(lr = 0.002*5/(4+nc), m 0.9) and forces warmup_bias_lr to 0
  (`engine/trainer.py:905-913`).
* Three parameter groups — conv/dense kernels (weight-decayed), norm scales
  & 1-D params (no decay), biases (no decay, separate warmup start at
  ``warmup_bias_lr``).
* Linear (or cosine) epoch LR decay lr0 -> lr0*lrf; per-iteration linear
  warmup of lr (0 or warmup_bias_lr -> lr) and momentum
  (warmup_momentum -> momentum) over the first ``warmup_epochs``.
* EMA with the reference's ramped decay d = decay*(1 - exp(-updates/tau)),
  counted in *optimizer* steps (reference ModelEMA.update is called once per
  optimizer step, `engine/trainer.py:717`), not micro-batches.

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

_ADAM_FAMILY = {"adam", "adamax", "nadam", "radam"}
_KNOWN = _ADAM_FAMILY | {"adamw", "rmsprop", "sgd"}


@dataclasses.dataclass(frozen=True)
class OptSpec:
    """Resolved optimizer choice (after the reference's 'auto' rule)."""

    name: str            # canonical: sgd | adam | adamw | rmsprop
    lr0: float
    momentum: float      # SGD momentum / Adam beta1 / RMSProp momentum
    warmup_bias_lr: float
    auto_selected: bool = False


def resolve_optimizer(
    name: str,
    nc: int,
    iterations: float,
    lr0: float,
    momentum: float,
    warmup_bias_lr: float,
) -> OptSpec:
    """Reference build_optimizer name resolution incl. the 'auto' rule
    (engine/trainer.py:904-913): iterations = ceil(n_images/max(batch,nbs))*epochs."""
    n = name.lower()
    if n == "auto":
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        if iterations > 10000:
            return OptSpec("sgd", 0.01, 0.9, 0.0, auto_selected=True)
        return OptSpec("adamw", lr_fit, 0.9, 0.0, auto_selected=True)
    if n not in _KNOWN:
        raise ValueError(f"unknown optimizer {name!r}; choose from auto|SGD|Adam|AdamW|Adamax|NAdam|RAdam|RMSProp")
    canonical = "adam" if n in _ADAM_FAMILY else n
    return OptSpec(canonical, lr0, momentum, warmup_bias_lr)


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


def init_opt_state(opt_name: str, params: Params) -> dict:
    """Slot buffers per optimizer (structure must be static for jit)."""
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    if opt_name == "sgd":
        return {"m": zeros()}
    if opt_name in ("adam", "adamw"):
        return {"m": zeros(), "v": zeros()}
    if opt_name == "rmsprop":
        return {"m": zeros(), "sq": zeros()}
    raise ValueError(opt_name)


def clip_by_global_norm(grads: Params, max_norm: float) -> Params:
    """Global-norm gradient clipping (reference engine/trainer.py:713,
    clip_grad_norm_ max_norm=10.0). Essential: BN backward through
    low-variance activations can produce huge early-layer gradients."""
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree_util.tree_leaves(grads))
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads)


def _split_pair(out):
    isleaf = lambda x: isinstance(x, tuple)
    a = jax.tree_util.tree_map(lambda x: x[0], out, is_leaf=isleaf)
    b = jax.tree_util.tree_map(lambda x: x[1], out, is_leaf=isleaf)
    return a, b


def make_update_fn(opt_name: str, weight_decay: float, nesterov: bool = True):
    """Build ``update(params, grads, opt_state, groups, lr, lr_bias, momentum,
    opt_step) -> (new_params, new_opt_state)`` for the chosen optimizer.

    Decay convention matches torch: SGD/Adam/RMSProp fold L2 into the
    gradient of group-0 params; AdamW decays decoupled (p *= 1 - lr*wd).
    ``opt_step`` is the 1-based optimizer-step count (Adam bias correction).
    """

    if opt_name == "sgd":

        def update(params, grads, opt_state, groups, lr, lr_bias, momentum, opt_step):
            def upd(tag, p, g, buf):
                g = g + jnp.where(tag == 0, weight_decay, 0.0) * p
                buf = momentum * buf + g
                d = g + momentum * buf if nesterov else buf
                step_lr = jnp.where(tag == 2, lr_bias, lr)
                return p - step_lr * d, buf

            out = jax.tree_util.tree_map(upd, groups, params, grads, opt_state["m"])
            new_params, new_m = _split_pair(out)
            return new_params, {"m": new_m}

    elif opt_name in ("adam", "adamw"):
        beta2, eps = 0.999, 1e-8
        decoupled = opt_name == "adamw"

        def update(params, grads, opt_state, groups, lr, lr_bias, momentum, opt_step):
            b1 = momentum
            t = opt_step.astype(jnp.float32)
            bc1 = 1.0 - jnp.power(b1, t)
            bc2 = 1.0 - beta2 ** t

            def upd(tag, p, g, m, v):
                if not decoupled:
                    g = g + jnp.where(tag == 0, weight_decay, 0.0) * p
                m = b1 * m + (1.0 - b1) * g
                v = beta2 * v + (1.0 - beta2) * jnp.square(g)
                step_lr = jnp.where(tag == 2, lr_bias, lr)
                if decoupled:
                    p = p * (1.0 - step_lr * jnp.where(tag == 0, weight_decay, 0.0))
                new_p = p - step_lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                return new_p, m, v

            out = jax.tree_util.tree_map(upd, groups, params, grads, opt_state["m"], opt_state["v"])
            isleaf = lambda x: isinstance(x, tuple)
            new_params = jax.tree_util.tree_map(lambda x: x[0], out, is_leaf=isleaf)
            new_m = jax.tree_util.tree_map(lambda x: x[1], out, is_leaf=isleaf)
            new_v = jax.tree_util.tree_map(lambda x: x[2], out, is_leaf=isleaf)
            return new_params, {"m": new_m, "v": new_v}

    elif opt_name == "rmsprop":
        alpha, eps = 0.99, 1e-8

        def update(params, grads, opt_state, groups, lr, lr_bias, momentum, opt_step):
            def upd(tag, p, g, m, sq):
                g = g + jnp.where(tag == 0, weight_decay, 0.0) * p
                sq = alpha * sq + (1.0 - alpha) * jnp.square(g)
                m = momentum * m + g / (jnp.sqrt(sq) + eps)
                step_lr = jnp.where(tag == 2, lr_bias, lr)
                return p - step_lr * m, m, sq

            out = jax.tree_util.tree_map(upd, groups, params, grads, opt_state["m"], opt_state["sq"])
            isleaf = lambda x: isinstance(x, tuple)
            new_params = jax.tree_util.tree_map(lambda x: x[0], out, is_leaf=isleaf)
            new_m = jax.tree_util.tree_map(lambda x: x[1], out, is_leaf=isleaf)
            new_sq = jax.tree_util.tree_map(lambda x: x[2], out, is_leaf=isleaf)
            return new_params, {"m": new_m, "sq": new_sq}

    else:
        raise ValueError(opt_name)

    return update


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
    """One SGD step over the whole tree (kept for direct use in tests);
    returns (new_params, new_buf)."""
    if max_grad_norm and max_grad_norm > 0:
        grads = clip_by_global_norm(grads, max_grad_norm)
    fn = make_update_fn("sgd", weight_decay, nesterov)
    new_params, new_state = fn(
        params, grads, {"m": momentum_buf}, groups, lr, lr_bias, momentum,
        jnp.ones((), jnp.int32),
    )
    return new_params, new_state["m"]


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

    @property
    def warmup_steps(self) -> int:
        return max(round(self.warmup_epochs * self.steps_per_epoch), 100)

    def at(self, step: int) -> tuple[float, float, float]:
        """(lr, lr_bias, momentum) for global iteration ``step``."""
        epoch = step // max(1, self.steps_per_epoch)
        base = self.lr0 * self.epoch_lr_factor(epoch)
        nw = self.warmup_steps
        if step < nw:
            t = step / nw
            lr = t * base
            lr_bias = self.warmup_bias_lr + t * (base - self.warmup_bias_lr)
            mom = self.warmup_momentum + t * (self.momentum - self.warmup_momentum)
        else:
            lr = lr_bias = base
            mom = self.momentum
        return lr, lr_bias, mom


def ema_update(ema: Params, params: Params, updates: jax.Array, decay: float, tau: float):
    """Ramped EMA (reference ModelEMA torch_utils.py:722). ``updates`` is the
    optimizer-step count, incremented once per apply (not per micro-batch)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema, params)


# ------------------------------------------------------------- flat buffers
#
# The per-leaf tree_map update above lowers to hundreds of tiny HLOs (one
# fused kernel per tensor for clip, SGD and EMA each); on TPU every HLO
# carries a fixed dispatch cost, so the measured opt+EMA segment of the
# train step was ~12 ms @ b128 for ~36 MB of traffic — two orders of
# magnitude over the HBM speed-of-light (tools/scripts/bench_step_parts.py,
# BASELINE.md round-3 matrix). The flat path concatenates gradients once and
# does all update math on single (N,) vectors — measured 3.5x faster
# standalone (tools/scripts/bench_opt_fuse.py) and element-for-element
# IDENTICAL math (concat/slice reorder nothing; tests/test_optim_parity.py
# pins bit-equality vs the tree path). Momentum/EMA buffers live flat inside
# TrainState; checkpoint.py unflattens at save so the on-disk format is
# unchanged. No reference equivalent — torch applies per-tensor updates
# (engine/trainer.py:713-717); this is a TPU-specific dispatch optimization.


class FlatMeta:
    """Static flatten/unflatten recipe for one pytree structure."""

    __slots__ = ("treedef", "shapes", "sizes", "offsets", "dtypes", "total")

    def __init__(self, tree):
        import numpy as np

        leaves, self.treedef = jax.tree_util.tree_flatten(tree)
        self.shapes = tuple(tuple(l.shape) for l in leaves)
        self.dtypes = tuple(l.dtype for l in leaves)
        self.sizes = tuple(int(np.prod(s)) if s else 1 for s in self.shapes)
        self.offsets = tuple(int(o) for o in np.cumsum((0,) + self.sizes[:-1]))
        self.total = int(sum(self.sizes))

    def unflatten(self, flat: jax.Array):
        parts = [
            flat[o : o + s].astype(dt).reshape(shape)
            for o, s, dt, shape in zip(self.offsets, self.sizes, self.dtypes, self.shapes)
        ]
        return jax.tree_util.tree_unflatten(self.treedef, parts)


def flatten_tree(tree, dtype=jnp.float32) -> jax.Array:
    """Concat all leaves (tree_leaves order) into one 1-D ``dtype`` vector."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((0,), dtype)
    return jnp.concatenate([jnp.ravel(l).astype(dtype) for l in leaves])


def flat_group_tags(params: Params) -> jax.Array:
    """Per-element group tags (uint8, :func:`param_groups` semantics) aligned
    with :func:`flatten_tree` order. Built host-side at trace time — it is a
    pure function of the (static) tree structure, embedded as a ~3 MB
    constant."""
    import numpy as np

    meta = FlatMeta(params)
    tag_leaves = jax.tree_util.tree_leaves(param_groups(params))
    return jnp.asarray(
        np.concatenate(
            [np.full(s, t, np.uint8) for s, t in zip(meta.sizes, tag_leaves)]
        )
        if meta.sizes
        else np.zeros((0,), np.uint8)
    )


def clip_by_global_norm_flat(flat_g: jax.Array, max_norm: float) -> jax.Array:
    sq = jnp.sum(jnp.square(flat_g.astype(jnp.float32)))
    scale = jnp.minimum(1.0, max_norm / (jnp.sqrt(sq) + 1e-6))
    return flat_g * scale.astype(flat_g.dtype)


def init_flat_opt_state(opt_name: str, total: int) -> dict:
    zeros = lambda: jnp.zeros((total,), jnp.float32)
    if opt_name == "sgd":
        return {"m": zeros()}
    if opt_name in ("adam", "adamw"):
        return {"m": zeros(), "v": zeros()}
    if opt_name == "rmsprop":
        return {"m": zeros(), "sq": zeros()}
    raise ValueError(opt_name)


def make_flat_update_fn(opt_name: str, weight_decay: float, nesterov: bool = True):
    """Flat-vector twin of :func:`make_update_fn`:
    ``update(flat_p, flat_g, opt_state, tags, lr, lr_bias, momentum, opt_step)
    -> (new_flat_p, new_opt_state)``. Same math, same decay conventions."""

    if opt_name == "sgd":

        def update(flat_p, flat_g, opt_state, tags, lr, lr_bias, momentum, opt_step):
            g = flat_g + jnp.where(tags == 0, weight_decay, 0.0) * flat_p
            buf = momentum * opt_state["m"] + g
            d = g + momentum * buf if nesterov else buf
            step_lr = jnp.where(tags == 2, lr_bias, lr)
            return flat_p - step_lr * d, {"m": buf}

    elif opt_name in ("adam", "adamw"):
        beta2, eps = 0.999, 1e-8
        decoupled = opt_name == "adamw"

        def update(flat_p, flat_g, opt_state, tags, lr, lr_bias, momentum, opt_step):
            b1 = momentum
            t = opt_step.astype(jnp.float32)
            bc1 = 1.0 - jnp.power(b1, t)
            bc2 = 1.0 - beta2 ** t
            g = flat_g
            if not decoupled:
                g = g + jnp.where(tags == 0, weight_decay, 0.0) * flat_p
            m = b1 * opt_state["m"] + (1.0 - b1) * g
            v = beta2 * opt_state["v"] + (1.0 - beta2) * jnp.square(g)
            step_lr = jnp.where(tags == 2, lr_bias, lr)
            p = flat_p
            if decoupled:
                p = p * (1.0 - step_lr * jnp.where(tags == 0, weight_decay, 0.0))
            new_p = p - step_lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            return new_p, {"m": m, "v": v}

    elif opt_name == "rmsprop":
        alpha, eps = 0.99, 1e-8

        def update(flat_p, flat_g, opt_state, tags, lr, lr_bias, momentum, opt_step):
            g = flat_g + jnp.where(tags == 0, weight_decay, 0.0) * flat_p
            sq = alpha * opt_state["sq"] + (1.0 - alpha) * jnp.square(g)
            m = momentum * opt_state["m"] + g / (jnp.sqrt(sq) + eps)
            step_lr = jnp.where(tags == 2, lr_bias, lr)
            return flat_p - step_lr * m, {"m": m, "sq": sq}

    else:
        raise ValueError(opt_name)

    return update


def ema_update_flat(ema_flat: jax.Array, new_flat: jax.Array, updates: jax.Array,
                    decay: float, tau: float) -> jax.Array:
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return ema_flat * d + new_flat * (1.0 - d)
