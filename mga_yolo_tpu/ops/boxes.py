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


def _ciou_from_coords(b1_x1, b1_y1, b1_x2, b1_y2, b2_x1, b2_y1, b2_x2, b2_y2,
                      eps: float = 1e-7) -> jax.Array:
    """CIoU from 8 broadcastable coordinate arrays — the shared math of
    :func:`bbox_iou_ciou` (last-dim-4 view) and :func:`bbox_iou_ciou_p`
    (planar view). Matches reference `utils/metrics.py:77`
    bbox_iou(..., xywh=False, CIoU=True): the aspect-ratio coupling term's
    ``alpha`` is a constant (stop_gradient), like the reference's
    ``with torch.no_grad()``."""
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
    return iou - (rho2 / c2 + v * alpha)


def bbox_iou_ciou(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Complete-IoU between aligned boxes (xyxy, broadcastable), last dim 4.

    Returns IoU with trailing singleton dim removed.
    """
    b1 = jnp.split(box1, 4, axis=-1)
    b2 = jnp.split(box2, 4, axis=-1)
    return _ciou_from_coords(*b1, *b2, eps=eps).squeeze(-1)


# ---------------------------------------------------------------- planar view
#
# TPU layout note (round-5 whole-step SoL, BASELINE.md): a materialized
# (B, A, 4) f32 tensor gets lane-tiled on its minor dim — 4 pads to 128, a
# 32x HBM inflation (17 MB logical -> 550 MB physical at b128/640; three such
# copies showed up at ~550 MB each in the train-step byte census). The loss
# therefore carries every box/distance quantity PLANAR as (4, ..., A): the
# minor dim is the anchor axis (8400 -> 8448, 0.6% pad) and the coordinate
# axis is major. Same math, same values — only the memory layout differs.


def dist2bbox_p(dist_p: jax.Array, anchor_p: jax.Array, xywh: bool = True) -> jax.Array:
    """Planar :func:`dist2bbox`: (4,...,A) ltrb + (2,...,A) centers -> (4,...,A)."""
    ax, ay = anchor_p[0], anchor_p[1]
    x1, y1 = ax - dist_p[0], ay - dist_p[1]
    x2, y2 = ax + dist_p[2], ay + dist_p[3]
    if xywh:
        return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
    return jnp.stack([x1, y1, x2, y2])


def bbox2dist_p(anchor_p: jax.Array, bbox_p: jax.Array, reg_max: float) -> jax.Array:
    """Planar :func:`bbox2dist`: xyxy (4,...,A) -> clamped ltrb (4,...,A)."""
    ax, ay = anchor_p[0], anchor_p[1]
    d = jnp.stack([ax - bbox_p[0], ay - bbox_p[1], bbox_p[2] - ax, bbox_p[3] - ay])
    return jnp.clip(d, 0, reg_max - 0.01)


def bbox_iou_ciou_p(box1_p: jax.Array, box2_p: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Planar CIoU: (4, *s1) x (4, *s2) with broadcastable *s -> broadcast(*s)."""
    return _ciou_from_coords(
        box1_p[0], box1_p[1], box1_p[2], box1_p[3],
        box2_p[0], box2_p[1], box2_p[2], box2_p[3], eps=eps,
    )


def box_iou_pairwise(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Plain pairwise IoU: (N,4) x (M,4) -> (N,M), xyxy (reference metrics.py box_iou)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (a2 - a1).prod(-1)
    area2 = (b2 - b1).prod(-1)
    return inter / (area1 + area2 - inter + eps)
