"""Multi-scale segmentation loss: BCE + soft Dice, or Unified Focal Loss.

jnp port of the reference criterion
(`/root/reference/mga_yolo/nn/losses/segmentation.py:23-151` SegmentationLoss):
per scale (p3/p4/p5), resize target to prediction resolution (nearest for
binary masks, bilinear in probabilistic-mask mode), then either
BCEWithLogits + soft Dice or the symmetric Unified Focal Loss
LsUF = lambda*LmF + (1-lambda)*LmFT, everything accumulated in float32.

Unlike the reference, the data pipeline already delivers targets at the
correct per-scale resolution (fixed ``imgsz`` -> static shapes), so the
resize path exists only as a safety net for odd shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from mga_yolo_tpu.losses.detection import optax_sigmoid_bce
from mga_yolo_tpu.models.layers import resize_bilinear, resize_nearest


@dataclasses.dataclass(frozen=True)
class SegLossConfig:
    bce_weight: float = 1.0
    dice_weight: float = 1.0
    scale_weights: tuple[float, float, float] = (1.0, 1.0, 1.0)
    smooth: float = 1.0
    loss_lambda: float = 1.0
    enabled: bool = True
    prob_mode: bool = False
    use_unified_focal: bool = False
    ufl_lambda: float = 0.5
    ufl_delta: float = 0.6
    ufl_gamma: float = 0.5


def soft_dice(probs: jax.Array, tgt: jax.Array, smooth: float) -> jax.Array:
    """1 - Dice per batch element (reference :38-41). NHWC input."""
    inter = (probs * tgt).sum(axis=(1, 2, 3))
    denom = probs.sum(axis=(1, 2, 3)) + tgt.sum(axis=(1, 2, 3)) + smooth
    return 1.0 - (2.0 * inter + smooth) / denom


def modified_focal_ce(
    logits: jax.Array, tgt: jax.Array, delta: float, gamma: float, eps: float = 1e-6
) -> jax.Array:
    """LmF (reference :44-62), float32, clamped bases."""
    x = logits.astype(jnp.float32)
    t = tgt.astype(jnp.float32)
    probs = jax.nn.sigmoid(x)
    pt = jnp.clip(jnp.where(t > 0.5, probs, 1.0 - probs), eps, 1.0 - eps)
    ce = optax_sigmoid_bce(x, t)
    w = jnp.where(t > 0.5, delta, 1.0 - delta)
    base = jnp.maximum(1.0 - pt, eps)
    return (base ** (1.0 - gamma) * ce * w).mean()


def modified_focal_tversky(
    logits: jax.Array, tgt: jax.Array, delta: float, gamma: float, smooth: float, eps: float = 1e-6
) -> jax.Array:
    """LmFT (reference :65-85), float32, guarded denominator."""
    x = logits.astype(jnp.float32)
    t = tgt.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    tp = (p * t).sum(axis=(1, 2, 3))
    fn = (t * (1.0 - p)).sum(axis=(1, 2, 3))
    fp = ((1.0 - t) * p).sum(axis=(1, 2, 3))
    denom = jnp.maximum(tp + delta * fn + (1.0 - delta) * fp + smooth, eps)
    mti = (tp + smooth) / denom
    base = jnp.maximum(1.0 - mti, eps)
    return (base**gamma).mean()


def segmentation_loss(
    preds: Dict[str, jax.Array],     # {"p3","p4","p5"}: (B,H,W,1) logits
    targets: Sequence[jax.Array],    # per-scale GT masks (B,H,W,1), order p3,p4,p5
    cfg: SegLossConfig = SegLossConfig(),
):
    """Returns (total_scalar, logs {sk_bce, sk_dice, sk_combined, seg_total})."""
    if not cfg.enabled:
        return jnp.zeros(()), {}

    total = jnp.zeros((), jnp.float32)
    logs: Dict[str, jax.Array] = {}
    for i, sk in enumerate(("p3", "p4", "p5")):
        if sk not in preds or i >= len(targets):
            continue
        pred = preds[sk]
        tgt = targets[i]
        if tgt.ndim == 3:
            tgt = tgt[..., None]
        if tgt.shape[1:3] != pred.shape[1:3]:
            hw = (pred.shape[1], pred.shape[2])
            tgt = (
                resize_bilinear(tgt.astype(jnp.float32), hw)
                if cfg.prob_mode
                else resize_nearest(tgt.astype(jnp.float32), hw)
            )
        tgt = tgt.astype(jnp.float32)
        w_scale = cfg.scale_weights[i] if i < len(cfg.scale_weights) else 1.0

        if cfg.use_unified_focal:
            l_mf = modified_focal_ce(pred, tgt, cfg.ufl_delta, cfg.ufl_gamma)
            l_mft = modified_focal_tversky(pred, tgt, cfg.ufl_delta, cfg.ufl_gamma, cfg.smooth)
            combined = w_scale * (cfg.ufl_lambda * l_mf + (1.0 - cfg.ufl_lambda) * l_mft)
            logs[f"{sk}_bce"] = jax.lax.stop_gradient(l_mf)
            logs[f"{sk}_dice"] = jax.lax.stop_gradient(l_mft)
        else:
            p32 = pred.astype(jnp.float32)
            bce = optax_sigmoid_bce(p32, tgt).mean()
            dice = soft_dice(jax.nn.sigmoid(p32), tgt, cfg.smooth).mean()
            combined = w_scale * (cfg.bce_weight * bce + cfg.dice_weight * dice)
            logs[f"{sk}_bce"] = jax.lax.stop_gradient(bce)
            logs[f"{sk}_dice"] = jax.lax.stop_gradient(dice)

        total = total + combined.astype(jnp.float32)
        logs[f"{sk}_combined"] = jax.lax.stop_gradient(combined)

    total = total * cfg.loss_lambda
    logs["seg_total"] = jax.lax.stop_gradient(total)
    return total, logs
