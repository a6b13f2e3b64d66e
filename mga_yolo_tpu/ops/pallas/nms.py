"""Greedy NMS suppression as a Pallas TPU kernel.

The XLA path (`ops/nms.py nms_jax`) materialises the full (B, k, k) IoU
matrix in HBM (k=1024 -> 4 MB/image) and then runs an O(k) ``fori_loop``
reading one column per step. This kernel keeps everything in VMEM: per batch
element it streams the score-sorted candidates once, computing IoU of
candidate i against all candidates on the fly ((1, k) VPU vectors) and
carrying the keep mask in registers — zero HBM traffic beyond the (8, k)
candidate matrix. Semantics identical to the XLA version (class-offset
boxes, score threshold, keep-if-not-suppressed-by-kept-higher-score).

Reference capability: `utils/ops.py:192` non_max_suppression (torchvision C++
NMS on GPU). Benchmarked against nms_jax in tools/scripts/bench_nms.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

from mga_yolo_tpu.ops.boxes import xywh2xyxy


def _suppress_kernel_factory(k: int, iou_thres: float, conf_thres: float):
    def kernel(cand_ref, keep_ref):
        # cand rows: 0..3 = offset x1,y1,x2,y2 (class-separated), 4 = score
        x1 = cand_ref[0, 0:1, :]   # (1, k)
        y1 = cand_ref[0, 1:2, :]
        x2 = cand_ref[0, 2:3, :]
        y2 = cand_ref[0, 3:4, :]
        sc = cand_ref[0, 4:5, :]
        area = (x2 - x1) * (y2 - y1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def body(i, keep):
            # lane-i extraction via masked reduce (Mosaic has no dynamic_slice
            # on the lane dimension); (1,1) scalars broadcast below
            at_i = (col == i).astype(jnp.float32)

            def pick(v):
                return jnp.sum(v * at_i, axis=1, keepdims=True)  # (1,1)

            x1i, y1i, x2i, y2i, sci = pick(x1), pick(y1), pick(x2), pick(y2), pick(sc)
            ai = (x2i - x1i) * (y2i - y1i)
            iw = jnp.clip(jnp.minimum(x2i, x2) - jnp.maximum(x1i, x1), 0.0, None)
            ih = jnp.clip(jnp.minimum(y2i, y2) - jnp.maximum(y1i, y1), 0.0, None)
            inter = iw * ih
            iou = inter / (ai + area - inter + 1e-7)
            sup = (iou > iou_thres) & (keep > 0.5) & (col < i)
            alive = jnp.logical_not(jnp.any(sup)) & (sci[0, 0] > conf_thres)
            return jnp.where(col == i, jnp.where(alive, 1.0, 0.0), keep)

        keep_ref[0] = jax.lax.fori_loop(0, k, body, jnp.zeros((1, k), jnp.float32))

    return kernel


def _suppress_pallas(cand: jax.Array, iou_thres: float, conf_thres: float) -> jax.Array:
    """cand (B, 8, k) float32 -> keep (B, k) float32 in {0,1}."""
    B, _, k = cand.shape
    out = pl.pallas_call(
        _suppress_kernel_factory(k, iou_thres, conf_thres),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 8, k), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, k), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, k), jnp.float32),
    )(cand)
    return out[:, 0, :]


def nms_jax_pallas(
    pred: jax.Array,             # (B, A, 4+nc) decoded: xywh px + class probs
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 1024,
    class_agnostic: bool = False,
    max_wh: float = 7680.0,
    multi_label: bool = False,
):
    """Drop-in for `ops.nms.nms_jax` with the suppression loop in Pallas."""
    b, a, no = pred.shape
    nc = no - 4
    boxes = xywh2xyxy(pred[..., :4]).astype(jnp.float32)
    cls_probs = pred[..., 4:].astype(jnp.float32)
    if multi_label and nc > 1:
        scores = cls_probs.reshape(b, a * nc)
        cls = jnp.tile(jnp.arange(nc, dtype=jnp.float32)[None, None, :], (b, a, 1)).reshape(b, a * nc)
        boxes = jnp.repeat(boxes, nc, axis=1)
        n_cand = a * nc
    else:
        scores = cls_probs.max(-1)
        cls = cls_probs.argmax(-1).astype(jnp.float32)
        n_cand = a
    scores = jnp.where(scores > conf_thres, scores, 0.0)

    k = min(max_nms, n_cand)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls, top_idx, axis=1)
    offset = jnp.where(class_agnostic, 0.0, top_cls * max_wh)[..., None]
    obox = top_boxes + offset

    cand = jnp.concatenate(
        [
            obox.transpose(0, 2, 1),                 # (B, 4, k)
            top_scores[:, None, :],                  # (B, 1, k)
            jnp.zeros((b, 3, k), jnp.float32),       # pad to 8 sublanes
        ],
        axis=1,
    )
    keep = _suppress_pallas(cand, iou_thres, conf_thres) > 0.5

    final_scores = jnp.where(keep, top_scores, 0.0)
    sel_scores, sel = jax.lax.top_k(final_scores, min(max_det, k))
    sel_boxes = jnp.take_along_axis(top_boxes, sel[..., None], axis=1)
    sel_cls = jnp.take_along_axis(top_cls, sel, axis=1)
    sel_cls = jnp.where(sel_scores > 0, sel_cls, -1.0)
    return sel_boxes, sel_scores, sel_cls
