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
    step: jax.Array          # micro-batch counter (increments every train_step)
    opt_step: jax.Array      # optimizer-step counter (increments on each apply)
    last_apply: jax.Array    # micro-step of the last optimizer apply
    params: Any
    batch_stats: Any
    opt_state: Any           # optimizer slot buffers ({"m"[, "v"|"sq"]} FLAT (N,) vectors)
    ema_params: Any          # FLAT (N,) float32, flatten_tree(params) order
    ema_batch_stats: Any     # FLAT (K,) float32 or None (no BN stats)
    groups: Any = struct.field(pytree_node=True)
    accum_grads: Any = None  # FLAT gradient accumulation buffer (None when accumulate == 1)


def create_train_state(model, rng, imgsz: int, batch: int = 1, opt_name: str = "sgd") -> TrainState:
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    # jit the init: an eager init compiles every op separately (minutes on CPU)
    variables = jax.jit(partial(model.init, train=False))(rng, x)
    params = dict(variables["params"])
    params["mtl_log_vars"] = jnp.zeros((2,), jnp.float32)  # Kendall s_det, s_seg
    batch_stats = variables.get("batch_stats", {})
    # momentum/EMA buffers are stored FLAT (single (N,) vectors): the per-leaf
    # update lowers to hundreds of tiny HLOs whose fixed dispatch cost was
    # ~12 ms/step @ b128 (bench_step_parts.py); flat math is one kernel per
    # op (bench_opt_fuse.py: 3.5x). checkpoint.py unflattens at save so the
    # on-disk format stays structured.
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        opt_step=jnp.zeros((), jnp.int32),
        last_apply=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optim.init_flat_opt_state(opt_name, optim.FlatMeta(params).total),
        ema_params=optim.flatten_tree(params),
        ema_batch_stats=optim.flatten_tree(batch_stats) if batch_stats else None,
        groups=optim.param_groups(params),
        accum_grads=None,
    )


def ema_variables(state: TrainState) -> tuple[dict, dict]:
    """Structured ``(ema_params, ema_batch_stats)`` trees from the flat
    EMA buffers (templates: ``state.params`` / ``state.batch_stats``)."""
    params = optim.FlatMeta(state.params).unflatten(state.ema_params)
    bs = (
        optim.FlatMeta(state.batch_stats).unflatten(state.ema_batch_stats)
        if state.ema_batch_stats is not None and state.batch_stats
        else {}
    )
    return params, bs


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
    opt_name: str = "sgd",
    nesterov: bool = True,
    warmup_steps: int = 0,
    max_grad_norm: float = 10.0,
) -> Callable:
    """Build the pure train-step function (to be jitted by the caller).

    Mixed precision (``compute_dtype=bfloat16``): master params stay float32;
    a bf16 copy feeds the forward (the cast is fused by XLA), losses are
    computed in float32 (mga_loss casts at entry), and gradients flow back to
    the float32 masters — the TPU equivalent of the reference's
    autocast+GradScaler AMP (reference trainer.py `_do_train`); no loss
    scaling is needed since bf16 shares float32's exponent range.

    Gradient accumulation follows the reference's *summed* convention
    (engine/trainer.py:491,713): the v8 loss is already scaled by the
    micro-batch size, so micro-batch gradients are summed (NOT averaged)
    until the apply boundary and the accumulated sum — clipped to global
    norm 10 — is applied, reproducing the nominal-batch (nbs) gradient.
    With ``warmup_steps > 0`` the effective accumulate ramps 1 -> accumulate
    over warmup like the reference (trainer.py:467); the apply condition and
    counters live on-device so no extra host scalars are needed.
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

    update_fn = optim.make_flat_update_fn(opt_name, weight_decay, nesterov)

    def apply_update(state, flat_grads, tags, lr, lr_bias, momentum, opt_step, meta_p):
        # flat-buffer update: one kernel per op instead of one per tensor
        # (optim.py "flat buffers" note; 3.5x measured, bench_opt_fuse.py)
        if max_grad_norm and max_grad_norm > 0:
            flat_grads = optim.clip_by_global_norm_flat(flat_grads, max_grad_norm)
        flat_params = optim.flatten_tree(state.params)
        new_flat, new_opt = update_fn(
            flat_params, flat_grads, state.opt_state, tags,
            lr, lr_bias, momentum, opt_step,
        )
        new_params = meta_p.unflatten(new_flat)
        ema_params = optim.ema_update_flat(state.ema_params, new_flat, opt_step, ema_decay, ema_tau)
        return new_params, new_opt, ema_params

    def ema_bs_update(state, new_bs, opt_step):
        if not new_bs or state.ema_batch_stats is None:
            return state.ema_batch_stats
        return optim.ema_update_flat(
            state.ema_batch_stats, optim.flatten_tree(new_bs), opt_step, ema_decay, ema_tau
        )

    def train_step(state: TrainState, batch, lr, lr_bias, momentum, rng):
        (total, (new_bs, items, logs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        meta_p = optim.FlatMeta(state.params)  # static (trace-time) recipe
        tags = optim.flat_group_tags(state.params)
        flat_grads = optim.flatten_tree(grads)
        step = state.step + 1

        if accumulate <= 1:
            opt_step = state.opt_step + 1
            new_params, new_opt, ema_params = apply_update(
                state, flat_grads, tags, lr, lr_bias, momentum, opt_step, meta_p
            )
            ema_bs = ema_bs_update(state, new_bs, opt_step)
            new_state = state.replace(
                step=step,
                opt_step=opt_step,
                last_apply=step,
                params=new_params,
                batch_stats=new_bs if new_bs else state.batch_stats,
                opt_state=new_opt,
                ema_params=ema_params,
                ema_batch_stats=ema_bs,
            )
        else:
            # gradient accumulation to the nominal batch size (reference
            # trainer accumulate = nbs/batch, engine/trainer.py:399);
            # BN stats still update every micro-step like torch.
            # The buffer is FLAT: one add per micro-step instead of one per
            # tensor.
            acc0 = state.accum_grads
            if acc0 is None:
                acc0 = jnp.zeros_like(flat_grads)
            acc = acc0 + flat_grads
            if warmup_steps > 0:
                # reference ramps accumulate 1 -> nbs/batch over warmup
                # (trainer.py:467 np.interp(ni, [0, nw], [1, nbs/batch]).round())
                t = jnp.clip(step.astype(jnp.float32) / warmup_steps, 0.0, 1.0)
                acc_now = jnp.maximum(1, jnp.round(1.0 + t * (accumulate - 1))).astype(jnp.int32)
            else:
                acc_now = jnp.asarray(accumulate, jnp.int32)
            do_apply = (step - state.last_apply) >= acc_now

            def yes(_):
                opt_step = state.opt_step + 1
                new_params, new_opt, ema_params = apply_update(
                    state, acc, tags, lr, lr_bias, momentum, opt_step, meta_p
                )
                ema_bs = ema_bs_update(state, new_bs, opt_step)
                return new_params, new_opt, ema_params, ema_bs, jnp.zeros_like(acc), opt_step, step

            def no(_):
                return (
                    state.params, state.opt_state, state.ema_params,
                    state.ema_batch_stats, acc, state.opt_step, state.last_apply,
                )

            new_params, new_opt, ema_params, ema_bs, new_acc, opt_step, last_apply = jax.lax.cond(
                do_apply, yes, no, None
            )
            new_state = state.replace(
                step=step,
                opt_step=opt_step,
                last_apply=last_apply,
                params=new_params,
                batch_stats=new_bs if new_bs else state.batch_stats,
                opt_state=new_opt,
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
    nms_multi_label: bool = False,
) -> Callable:
    """Eval step on EMA weights: decoded predictions + val loss items.

    With ``nms_on_device`` the fixed-shape NMS (`ops/nms.py nms_jax`) runs in
    the same jitted program — the O(k^2) suppression is VPU work instead of a
    host python loop (the reference offloads to torchvision's C++ NMS;
    measured host NMS here was ~170 ms/img at conf 0.001 on the 1-core host).
    """

    def eval_step(state: TrainState, batch):
        images = normalize_images(batch["image"]).astype(compute_dtype)
        ema_tree, ema_bs = ema_variables(state)  # unflatten the flat EMA buffers
        ema = {k: v for k, v in ema_tree.items() if k != "mtl_log_vars"}
        if compute_dtype != jnp.float32:
            ema = _cast_floating(ema, compute_dtype)
        model_vars = {"params": ema}
        if ema_bs:
            model_vars["batch_stats"] = ema_bs
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
            ema_tree["mtl_log_vars"],
            det_cfg,
            seg_cfg,
        )
        result = {"decoded": decoded, "seg": out["seg"], "items": items}
        if "taps" in out:
            result["taps"] = out["taps"]
        if nms_on_device:
            from mga_yolo_tpu.ops.nms import nms_jax

            boxes, scores, cls = nms_jax(
                decoded, conf_thres=nms_conf, iou_thres=nms_iou, max_det=max_det,
                multi_label=nms_multi_label,
            )
            result["dets"] = jnp.concatenate(
                [boxes, scores[..., None], cls[..., None]], axis=-1
            )  # (B, max_det, 6)
        return result

    return eval_step


def host_barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Align all processes at a coordination-service barrier (no collectives).

    Used right before the first execution of a multi-process jitted program:
    the CPU Gloo transport gives a collective context ~30 s to rendezvous,
    and accumulated pre-loop host skew (imports, dataset scans, per-host
    compile times) can exceed that — the slow host then kills the whole
    cluster with ``Gloo context initialization failed: DEADLINE_EXCEEDED``.
    This barrier goes through the jax.distributed coordination service (plain
    RPC, generous timeout), so it is safe to call before any program runs.
    The reference has no equivalent (torch DDP's NCCL init has a 3 h timeout,
    `engine/trainer.py:246-252`); TPU pods with heterogeneous host startup
    need the same alignment.
    """
    if jax.process_count() <= 1:
        return
    try:  # private module: a jax upgrade may move it — degrade to no-op
        from jax._src import distributed

        client = distributed.global_state.client
    except (ImportError, AttributeError):
        return
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def host_local_to_global(batch: dict, mesh: Mesh):
    """Move a host batch onto the mesh with the training input shardings.

    Single-process: an async ``jax.device_put`` per leaf — issued one step
    ahead by :func:`prefetch_to_device` it double-buffers H2D under the
    previous step's compute (the VERDICT r2 throughput lever). Multi-host
    SPMD (SURVEY.md §5.8): each host loads its ``1/process_count`` slice of
    the global batch (DataLoader num_shards) and this stitches the shards
    into globally-sharded arrays via ``jax.make_array_from_process_local_data``.
    """
    import numpy as np

    specs = {**_batch_shardings(mesh), **_raw_batch_shardings(mesh)}
    _, default_sh = shard_batch_specs(mesh)

    def to_global(x, sh):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    out = {}
    for k, v in batch.items():
        sh = specs.get(k, default_sh)
        if isinstance(v, list):
            shs = sh if isinstance(sh, list) else [sh] * len(v)
            out[k] = [to_global(x, s) for x, s in zip(v, shs)]
        else:
            out[k] = to_global(v, sh if not isinstance(sh, list) else sh[0])
    return out


def prefetch_to_device(iterator, mesh: Mesh, depth: int = 2):
    """Wrap a host batch iterator with device prefetch: keep up to ``depth``
    batches resident on device ahead of consumption so the H2D copy of batch
    i+1 overlaps with compute of batch i (reference overlaps via dataloader
    worker processes + pinned memory; here via async device_put)."""
    import collections

    buf = collections.deque()
    it = iter(iterator)
    try:
        while len(buf) < depth:
            nxt = dict(next(it))
            nxt.pop("index", None)
            buf.append(host_local_to_global(nxt, mesh))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            nxt = dict(next(it))
            nxt.pop("index", None)
            buf.append(host_local_to_global(nxt, mesh))
        except StopIteration:
            pass


def data_mesh(devices=None, spatial: int = 1) -> Mesh:
    """Device mesh for SPMD training.

    ``spatial=1``: pure data parallelism — ``Mesh((n,), ('data',))``.
    ``spatial=k``: 2-D DP×SP mesh ``Mesh((n//k, k), ('data', 'space'))``:
    the batch is sharded over ``data`` and the image HEIGHT over ``space``.
    Under ``jit`` XLA's GSPMD partitioner inserts the conv halo exchanges
    (ring ``ppermute`` of kernel-overlap rows over ICI) automatically — the
    TPU-native equivalent of hand-written spatial-partition comm. Useful when
    per-chip batch is memory-bound at large imgsz (reference has no analogue;
    DDP can only split the batch).
    """
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    if spatial <= 1:
        return Mesh(devices, ("data",))
    if devices.size % spatial:
        raise ValueError(f"{devices.size} devices not divisible by spatial={spatial}")
    return Mesh(devices.reshape(devices.size // spatial, spatial), ("data", "space"))


def shard_batch_specs(mesh: Mesh):
    """(replicated_spec, batch_sharded_spec) NamedShardings.

    On a DP×SP mesh the batch-sharded spec also splits the row axis (axis 1,
    NHWC) over ``space``; rank<2 leaves (labels, mask_gt weights) only shard
    the batch axis — see :func:`_batch_shardings`.
    """
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P()), NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def _batch_shardings(mesh: Mesh):
    """Per-key input shardings for a train/eval batch on this mesh."""
    if "space" in mesh.axis_names:
        img = NamedSharding(mesh, P("data", "space"))      # NHWC rows over space
        vec = NamedSharding(mesh, P("data"))               # per-image vectors
    else:
        img = vec = NamedSharding(mesh, P("data"))
    return {
        "image": img,
        "gt_boxes": vec,
        "gt_labels": vec,
        "mask_gt": vec,
        "masks": [img, img, img],
    }


def _raw_batch_shardings(mesh: Mesh):
    """Input shardings for a raw device-augmentation batch
    (data/device_augment.py): canvases shard like images, the per-sample
    matrices/gains/flags are tiny batch-dim vectors. Kept separate from
    :func:`_batch_shardings` because the jitted step functions' in_shardings
    pytree must match the train batch structure exactly."""
    if "space" in mesh.axis_names:
        img = NamedSharding(mesh, P("data", "space"))
        vec = NamedSharding(mesh, P("data"))
    else:
        img = vec = NamedSharding(mesh, P("data"))
    return {
        "canvas": img,
        "mask_canvas": img,
        "pboxes": vec,
        "pcls": vec,
        "pvalid": vec,
        "mfwd": vec,
        "minv": vec,
        "ascale": vec,
        "hsv": vec,
        "flips": vec,
    }


def jit_train_step(train_step, mesh: Mesh):
    repl, _ = shard_batch_specs(mesh)
    batch_shardings = _batch_shardings(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_shardings, None, None, None, None),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def jit_eval_step(eval_step, mesh: Mesh):
    repl, _ = shard_batch_specs(mesh)
    batch_shardings = _batch_shardings(mesh)
    return jax.jit(eval_step, in_shardings=(repl, batch_shardings), out_shardings=repl)
