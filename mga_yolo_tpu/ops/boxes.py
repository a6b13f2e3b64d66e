"""Box geometry ops (pure jnp, static shapes).

Functional ports of the reference utilities
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/utils/tal.py:367`
make_anchors, `:382` dist2bbox, `:394` bbox2dist;
`utils/metrics.py:77` bbox_iou CIoU; `utils/ops.py:444` xywh2xyxy).
All are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def make_anchors(
    shapes: Sequence[tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Anchor centers (A, 2) in feature-grid units + per-anchor stride (A, 1).

    ``shapes`` are static (H, W) per level, so this is constant-folded by XLA.
    """
    pts, sts = [], []
    for (h, w), s in zip(shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        sts.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(pts), jnp.concatenate(sts)


def dist2bbox(distance: jax.Array, anchor_points: jax.Array, xywh: bool = True) -> jax.Array:
    """ltrb distances -> boxes (xywh or xyxy), last-dim layout."""
    lt, rb = distance[..., :2], distance[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], -1)
    return jnp.concatenate([x1y1, x2y2], -1)


def bbox2dist(anchor_points: jax.Array, bbox: jax.Array, reg_max: float) -> jax.Array:
    """xyxy boxes -> ltrb distances, clamped to [0, reg_max - 0.01]."""
    x1y1, x2y2 = bbox[..., :2], bbox[..., 2:]
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], -1), 0, reg_max - 0.01
    )


def xywh2xyxy(x: jax.Array) -> jax.Array:
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return jnp.concatenate([xy - half, xy + half], -1)


def xyxy2xywh(x: jax.Array) -> jax.Array:
    x1y1, x2y2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], -1)


def bbox_iou_ciou(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Complete-IoU between aligned boxes (xyxy, broadcastable), last dim 4.

    Matches reference `utils/metrics.py:77` bbox_iou(..., xywh=False, CIoU=True):
    the aspect-ratio coupling term's ``alpha`` is treated as a constant
    (stop_gradient), exactly like the reference's ``with torch.no_grad()``.
    Returns IoU with trailing singleton dim removed.
    """
    b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
    b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    ciou = iou - (rho2 / c2 + v * alpha)
    return ciou.squeeze(-1)


def box_iou_pairwise(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Plain pairwise IoU: (N,4) x (M,4) -> (N,M), xyxy (reference metrics.py box_iou)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (a2 - a1).prod(-1)
    area2 = (b2 - b1).prod(-1)
    return inter / (area1 + area2 - inter + eps)
