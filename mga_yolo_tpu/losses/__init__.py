"""Loss package: detection (TAL/CIoU/DFL/BCE), segmentation (BCE+Dice/UFL), Kendall MTL.

`mga_loss` is the full multi-task criterion mirroring
`/root/reference/mga_yolo/model/model.py:123-214` MGAModel.loss: detection
loss + multi-scale segmentation loss combined by Kendall uncertainty
weighting, with the reference's 10-element `loss_items` vector
[box, cls, dfl, p3_bce, p3_dice, p4_bce, p4_dice, p5_bce, p5_dice, seg_total].
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from mga_yolo_tpu.losses.detection import DetLossConfig, v8_detection_loss
from mga_yolo_tpu.losses.mtl import kendall_combine
from mga_yolo_tpu.losses.segmentation import SegLossConfig, segmentation_loss

__all__ = [
    "DetLossConfig",
    "SegLossConfig",
    "v8_detection_loss",
    "segmentation_loss",
    "kendall_combine",
    "mga_loss",
    "LOSS_ITEM_NAMES",
]

LOSS_ITEM_NAMES = (
    "box_loss",
    "cls_loss",
    "dfl_loss",
    "p3_bce",
    "p3_dice",
    "p4_bce",
    "p4_dice",
    "p5_bce",
    "p5_dice",
    "seg_total",
)


def mga_loss(
    outputs: dict,
    batch: dict,
    strides: Sequence[int],
    nc: int,
    mtl_log_vars: jax.Array,
    det_cfg: DetLossConfig = DetLossConfig(),
    seg_cfg: SegLossConfig = SegLossConfig(),
):
    """Full multi-task loss.

    Args:
        outputs: model forward dict {"det": [maps...], "seg": {...}} (train mode).
        batch: {"gt_labels" (B,M), "gt_bboxes" (B,M,4 xyxy px), "mask_gt" (B,M),
                "masks": [per-scale (B,H,W,1)]}.
        strides: detect strides (8,16,32).
        mtl_log_vars: (2,) Kendall log-variances (trainable).

    Returns:
        (total, loss_items (10,), logs dict)
    """
    det_maps = outputs["det"]
    if isinstance(det_maps, tuple):  # eval-mode output (decoded, raw)
        det_maps = det_maps[1]
    # AMP boundary: loss MATH always in float32 (reference computes seg loss
    # and assigner math in fp32 under autocast too). Det maps pass through in
    # their native storage dtype — v8_detection_loss casts per-consumer so
    # the big (B,A,4*reg_max) DFL tensor streams bf16 (round 4; value- and
    # gradient-rounding-identical, tests/test_loss_parity.py bf16 case).
    outputs = {**outputs, "seg": {k: v.astype(jnp.float32) for k, v in outputs["seg"].items()}}
    l_det, det_comps = v8_detection_loss(
        det_maps, strides, batch["gt_labels"], batch["gt_bboxes"], batch["mask_gt"], nc, det_cfg
    )
    l_seg, seg_logs = segmentation_loss(outputs["seg"], batch.get("masks", ()), seg_cfg)
    total, mtl_logs = kendall_combine(l_det, l_seg, mtl_log_vars)

    z = jnp.zeros(())
    items = jnp.stack(
        [
            det_comps["box"],
            det_comps["cls"],
            det_comps["dfl"],
            seg_logs.get("p3_bce", z),
            seg_logs.get("p3_dice", z),
            seg_logs.get("p4_bce", z),
            seg_logs.get("p4_dice", z),
            seg_logs.get("p5_bce", z),
            seg_logs.get("p5_dice", z),
            seg_logs.get("seg_total", z),
        ]
    )
    logs = {**{f"det/{k}": v for k, v in det_comps.items()}, **{f"seg/{k}": v for k, v in seg_logs.items()}, **mtl_logs}
    return total, items, logs
