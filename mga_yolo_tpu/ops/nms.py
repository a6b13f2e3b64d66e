"""Non-maximum suppression — TPU fixed-shape jnp version + host numpy version.

Capability port of the reference
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/utils/ops.py:192`
non_max_suppression): confidence filter, best-class selection (or
multi-label), per-class separation via the class-offset trick, greedy IoU
suppression, max_det cap.

TPU formulation (SURVEY.md §7 hard-part 1): all shapes static. Predictions
are pre-cut to the top ``max_nms`` candidates by score, suppression runs as a
sequential scan over the score-sorted candidates against the full IoU matrix
— O(max_nms^2) VPU work with no data-dependent shapes; invalid outputs are
score 0 / class -1 padding.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.ops.boxes import xywh2xyxy


def nms_jax(
    pred: jax.Array,             # (B, A, 4+nc) decoded: xywh px + class probs
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 1024,
    class_agnostic: bool = False,
    max_wh: float = 7680.0,
    multi_label: bool = False,
):
    """Batched fixed-shape NMS.

    Returns (boxes (B, max_det, 4) xyxy, scores (B, max_det), cls (B, max_det))
    with zero-score padding. jit-safe; used by the TPU inference path.

    ``multi_label`` mirrors the reference (`utils/ops.py:266` multi_label
    candidate expansion when nc > 1, standard for mAP): every (anchor, class)
    pair above the confidence threshold becomes a candidate instead of only
    the argmax class. Static-shape formulation: the (A, nc) score matrix is
    flattened to A*nc candidates with the box repeated per class, then top-k
    pre-cut as usual.
    """
    b, a, no = pred.shape
    nc = no - 4
    boxes = xywh2xyxy(pred[..., :4])
    cls_probs = pred[..., 4:]
    if multi_label and nc > 1:
        # (B, A, nc) -> (B, A*nc) candidates: anchor i class j at i*nc+j
        scores = cls_probs.reshape(b, a * nc)
        cls = jnp.tile(jnp.arange(nc, dtype=jnp.float32)[None, None, :], (b, a, 1)).reshape(b, a * nc)
        boxes = jnp.repeat(boxes, nc, axis=1)  # (B, A*nc, 4)
        n_cand = a * nc
    else:
        scores = cls_probs.max(-1)
        cls = cls_probs.argmax(-1).astype(jnp.float32)
        n_cand = a
    valid = scores > conf_thres
    scores = jnp.where(valid, scores, 0.0)

    k = min(max_nms, n_cand)
    top_scores, top_idx = jax.lax.top_k(scores, k)  # (B, k)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls, top_idx, axis=1)

    offset = jnp.where(class_agnostic, 0.0, top_cls * max_wh)[..., None]
    obox = top_boxes + offset

    # pairwise IoU among candidates (class-separated by the offset)
    lt = jnp.maximum(obox[:, :, None, :2], obox[:, None, :, :2])
    rb = jnp.minimum(obox[:, :, None, 2:], obox[:, None, :, 2:])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area = (obox[..., 2:] - obox[..., :2]).prod(-1)
    iou = inter / (area[:, :, None] + area[:, None, :] - inter + 1e-7)

    # sequential greedy suppression over score-sorted candidates
    def body(i, keep):
        # candidate i survives iff not suppressed by any kept higher-score box
        sup = (iou[:, :, i] > iou_thres) & keep & (jnp.arange(k)[None, :] < i)
        alive = ~jnp.any(sup, axis=1) & (top_scores[:, i] > conf_thres)
        return keep.at[:, i].set(alive)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((b, k), bool))

    final_scores = jnp.where(keep, top_scores, 0.0)
    sel_scores, sel = jax.lax.top_k(final_scores, min(max_det, k))
    sel_boxes = jnp.take_along_axis(top_boxes, sel[..., None], axis=1)
    sel_cls = jnp.take_along_axis(top_cls, sel, axis=1)
    sel_cls = jnp.where(sel_scores > 0, sel_cls, -1.0)
    return sel_boxes, sel_scores, sel_cls


def nms_numpy(
    pred: np.ndarray,            # (A, 4+nc) decoded: xywh px + class probs
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    multi_label: bool = False,
    class_agnostic: bool = False,
    max_wh: float = 7680.0,
) -> np.ndarray:
    """Single-image host NMS -> (N, 6) [x1, y1, x2, y2, conf, cls]."""
    nc = pred.shape[-1] - 4
    boxes = np.asarray(xywh2xyxy(jnp.asarray(pred[:, :4])))
    probs = pred[:, 4:]

    if multi_label and nc > 1:
        ii, jj = np.nonzero(probs > conf_thres)
        cand = np.concatenate(
            [boxes[ii], probs[ii, jj][:, None], jj[:, None].astype(np.float32)], 1
        )
    else:
        conf = probs.max(-1)
        cls = probs.argmax(-1).astype(np.float32)
        keep = conf > conf_thres
        cand = np.concatenate(
            [boxes[keep], conf[keep][:, None], cls[keep][:, None]], 1
        )
    if not len(cand):
        return np.zeros((0, 6), np.float32)

    cand = cand[np.argsort(-cand[:, 4])][: 30000]
    off = np.zeros(len(cand)) if class_agnostic else cand[:, 5] * max_wh
    b = cand[:, :4] + off[:, None]
    keep_idx = []
    order = np.arange(len(cand))
    while order.size:
        i = order[0]
        keep_idx.append(i)
        if len(keep_idx) >= max_det or order.size == 1:
            break
        rest = order[1:]
        lt = np.maximum(b[i, :2], b[rest, :2])
        rb = np.minimum(b[i, 2:], b[rest, 2:])
        inter = np.clip(rb - lt, 0, None).prod(-1)
        area_i = (b[i, 2:] - b[i, :2]).prod()
        area_r = (b[rest, 2:] - b[rest, :2]).prod(-1)
        iou = inter / (area_i + area_r - inter + 1e-7)
        order = rest[iou <= iou_thres]
    return cand[np.array(keep_idx, int)].astype(np.float32)
