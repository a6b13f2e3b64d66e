"""Train state pytree + jitted train/eval step builders with mesh sharding.

The train step is one pure function ``(state, batch, lr, lr_bias, momentum)
-> (state, metrics)`` jitted with ``donate_argnums=0`` over a 1-D
``Mesh(('data',))``: the batch is sharded along ``data``, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI automatically —
the TPU-native replacement for the reference's DDP subprocess machinery
(SURVEY.md §5.8, reference `engine/trainer.py:209-252`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mga_yolo_tpu.losses import mga_loss
from mga_yolo_tpu.losses.detection import DetLossConfig
from mga_yolo_tpu.losses.segmentation import SegLossConfig
from mga_yolo_tpu.train import optim


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    momentum_buf: Any
    ema_params: Any
    ema_batch_stats: Any
    groups: Any = struct.field(pytree_node=True)
    accum_grads: Any = None  # gradient accumulation buffer (None when accumulate == 1)


def create_train_state(model, rng, imgsz: int, batch: int = 1) -> TrainState:
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    # jit the init: an eager init compiles every op separately (minutes on CPU)
    variables = jax.jit(partial(model.init, train=False))(rng, x)
    params = dict(variables["params"])
    params["mtl_log_vars"] = jnp.zeros((2,), jnp.float32)  # Kendall s_det, s_seg
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        momentum_buf=optim.init_momentum(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        groups=optim.param_groups(params),
        accum_grads=None,
    )


def normalize_images(images: jax.Array) -> jax.Array:
    """uint8 BGR -> float32 [0,1] on device (reference preprocess_batch /255)."""
    return images.astype(jnp.float32) / 255.0


def _cast_floating(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def make_train_step(
    model,
    strides: Sequence[int],
    nc: int,
    det_cfg: DetLossConfig,
    seg_cfg: SegLossConfig,
    weight_decay: float,
    ema_decay: float,
    ema_tau: float,
    accumulate: int = 1,
    compute_dtype=jnp.float32,
) -> Callable:
    """Build the pure train-step function (to be jitted by the caller).

    Mixed precision (``compute_dtype=bfloat16``): master params stay float32;
    a bf16 copy feeds the forward (the cast is fused by XLA), losses are
    computed in float32 (mga_loss casts at entry), and gradients flow back to
    the float32 masters — the TPU equivalent of the reference's
    autocast+GradScaler AMP (reference trainer.py `_do_train`); no loss
    scaling is needed since bf16 shares float32's exponent range.
    """

    def loss_fn(params, batch_stats, batch, rng):
        images = normalize_images(batch["image"]).astype(compute_dtype)
        fwd_params = {k: v for k, v in params.items() if k != "mtl_log_vars"}
        if compute_dtype != jnp.float32:
            fwd_params = _cast_floating(fwd_params, compute_dtype)
        model_vars = {"params": fwd_params}
        if batch_stats:
            model_vars["batch_stats"] = batch_stats
        out, mutated = model.apply(
            model_vars,
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"gater": rng, "dropout": rng},
        )
        loss_batch = {
            "gt_labels": batch["gt_labels"],
            "gt_bboxes": batch["gt_boxes"],
            "mask_gt": batch["mask_gt"],
            "masks": batch["masks"],
        }
        total, items, logs = mga_loss(
            out, loss_batch, strides, nc, params["mtl_log_vars"], det_cfg, seg_cfg
        )
        # running stats stay float32 masters regardless of compute dtype
        new_bs = _cast_floating(mutated.get("batch_stats", {}), jnp.float32)
        return total, (new_bs, items, logs)

    def apply_update(state, grads, new_bs, lr, lr_bias, momentum, step):
        new_params, new_buf = optim.sgd_update(
            state.params, grads, state.momentum_buf, state.groups,
            lr, lr_bias, momentum, weight_decay,
        )
        ema_params = optim.ema_update(state.ema_params, new_params, step, ema_decay, ema_tau)
        ema_bs = (
            optim.ema_update(state.ema_batch_stats, new_bs, step, ema_decay, ema_tau)
            if new_bs
            else state.ema_batch_stats
        )
        return new_params, new_buf, ema_params, ema_bs

    def train_step(state: TrainState, batch, lr, lr_bias, momentum, rng):
        (total, (new_bs, items, logs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        step = state.step + 1

        if accumulate <= 1:
            new_params, new_buf, ema_params, ema_bs = apply_update(
                state, grads, new_bs, lr, lr_bias, momentum, step
            )
            new_state = state.replace(
                step=step,
                params=new_params,
                batch_stats=new_bs if new_bs else state.batch_stats,
                momentum_buf=new_buf,
                ema_params=ema_params,
                ema_batch_stats=ema_bs,
            )
        else:
            # gradient accumulation to the nominal batch size (reference
            # trainer accumulate = nbs/batch, engine/trainer.py:312+);
            # BN stats still update every micro-step like torch
            acc0 = state.accum_grads
            if acc0 is None:
                acc0 = jax.tree_util.tree_map(jnp.zeros_like, grads)
            acc = jax.tree_util.tree_map(jnp.add, acc0, grads)
            do_apply = (step % accumulate) == 0

            def yes(_):
                eff = jax.tree_util.tree_map(lambda a: a / accumulate, acc)
                new_params, new_buf, ema_params, ema_bs = apply_update(
                    state, eff, new_bs, lr, lr_bias, momentum, step
                )
                zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
                return new_params, new_buf, ema_params, ema_bs, zeros

            def no(_):
                ema_bs = state.ema_batch_stats
                return state.params, state.momentum_buf, state.ema_params, ema_bs, acc

            new_params, new_buf, ema_params, ema_bs, new_acc = jax.lax.cond(
                do_apply, yes, no, None
            )
            new_state = state.replace(
                step=step,
                params=new_params,
                batch_stats=new_bs if new_bs else state.batch_stats,
                momentum_buf=new_buf,
                ema_params=ema_params,
                ema_batch_stats=ema_bs,
                accum_grads=new_acc,
            )
        metrics = {"loss": total, "items": items, **logs}
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    strides: Sequence[int],
    nc: int,
    det_cfg: DetLossConfig,
    seg_cfg: SegLossConfig,
    compute_dtype=jnp.float32,
    nms_on_device: bool = True,
    nms_conf: float = 0.001,
    nms_iou: float = 0.7,
    max_det: int = 300,
) -> Callable:
    """Eval step on EMA weights: decoded predictions + val loss items.

    With ``nms_on_device`` the fixed-shape NMS (`ops/nms.py nms_jax`) runs in
    the same jitted program — the O(k^2) suppression is VPU work instead of a
    host python loop (the reference offloads to torchvision's C++ NMS;
    measured host NMS here was ~170 ms/img at conf 0.001 on the 1-core host).
    """

    def eval_step(state: TrainState, batch):
        images = normalize_images(batch["image"]).astype(compute_dtype)
        ema = {k: v for k, v in state.ema_params.items() if k != "mtl_log_vars"}
        if compute_dtype != jnp.float32:
            ema = _cast_floating(ema, compute_dtype)
        model_vars = {"params": ema}
        if state.ema_batch_stats:
            model_vars["batch_stats"] = state.ema_batch_stats
        out = model.apply(model_vars, images, train=False)
        decoded, raw = out["det"]
        decoded = decoded.astype(jnp.float32)
        loss_batch = {
            "gt_labels": batch["gt_labels"],
            "gt_bboxes": batch["gt_boxes"],
            "mask_gt": batch["mask_gt"],
            "masks": batch["masks"],
        }
        _, items, _ = mga_loss(
            {"det": raw, "seg": out["seg"]},
            loss_batch,
            strides,
            nc,
            state.ema_params["mtl_log_vars"],
            det_cfg,
            seg_cfg,
        )
        result = {"decoded": decoded, "seg": out["seg"], "items": items}
        if "taps" in out:
            result["taps"] = out["taps"]
        if nms_on_device:
            from mga_yolo_tpu.ops.nms import nms_jax

            boxes, scores, cls = nms_jax(
                decoded, conf_thres=nms_conf, iou_thres=nms_iou, max_det=max_det
            )
            result["dets"] = jnp.concatenate(
                [boxes, scores[..., None], cls[..., None]], axis=-1
            )  # (B, max_det, 6)
        return result

    return eval_step


def data_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def shard_batch_specs(mesh: Mesh):
    """(replicated_spec, batch_sharded_spec) NamedShardings."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def jit_train_step(train_step, mesh: Mesh):
    repl, data_sh = shard_batch_specs(mesh)
    batch_shardings = {
        "image": data_sh,
        "gt_boxes": data_sh,
        "gt_labels": data_sh,
        "mask_gt": data_sh,
        "masks": [data_sh, data_sh, data_sh],
    }
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_shardings, None, None, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def jit_eval_step(eval_step, mesh: Mesh):
    repl, data_sh = shard_batch_specs(mesh)
    batch_shardings = {
        "image": data_sh,
        "gt_boxes": data_sh,
        "gt_labels": data_sh,
        "mask_gt": data_sh,
        "masks": [data_sh, data_sh, data_sh],
    }
    return jax.jit(eval_step, in_shardings=(repl, batch_shardings), out_shardings=repl)
