"""Validation loop: device inference -> host NMS -> mAP + artifact capture.

Re-implements the reference `MGAValidator`
(`/root/reference/mga_yolo/model/validator.py:18-508`): detection metrics
(mAP50/50-95/P/R) plus the feature-map / predicted-mask capture subsystem.
Where the reference registers forward hooks, the TPU build simply asks the
model for taps (`tap_indices`) — intermediates are ordinary outputs of the
jitted forward (SURVEY.md §5.1).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from mga_yolo_tpu.config import MGAConfig
from mga_yolo_tpu.data.loader import DataLoader
from mga_yolo_tpu.ops.nms import nms_numpy
from mga_yolo_tpu.utils.metrics import DetMetrics, MetricAccumulator


@dataclasses.dataclass
class ValResult:
    metrics: DetMetrics
    loss_items: np.ndarray  # (10,) mean val loss items
    n_images: int = 0
    # ms per image per phase (reference engine/validator.py speed dict)
    speed: dict = dataclasses.field(default_factory=dict)

    def results_dict(self):
        return self.metrics.results_dict()


class Validator:
    """Runs the jitted eval step over a loader and computes detection metrics."""

    def __init__(
        self,
        eval_fn: Callable,
        loader: DataLoader,
        cfg: MGAConfig,
        conf_thres: float = 0.001,
        iou_thres: float = 0.7,
        max_det: int = 300,
    ):
        self.eval_fn = eval_fn
        self.loader = loader
        self.cfg = cfg
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det

    def __call__(
        self,
        state,
        save_artifacts_dir: Optional[Path] = None,
        max_artifacts: int = 4,
    ) -> ValResult:
        import time

        acc = MetricAccumulator()
        items_sum = np.zeros(10, np.float64)
        n_batches = 0
        n_images = 0
        saved = 0
        t_inf = t_post = 0.0

        for batch in self.loader:
            batch = dict(batch)
            batch.pop("index", None)
            t0 = time.perf_counter()
            out = self.eval_fn(state, batch)
            decoded = np.asarray(out["decoded"])  # (B, A, 4+nc) xywh px
            t_inf += time.perf_counter() - t0
            t0 = time.perf_counter()
            items_sum += np.asarray(out["items"], np.float64)
            n_batches += 1

            gt_boxes = batch["gt_boxes"]
            gt_labels = batch["gt_labels"]
            mask_gt = batch["mask_gt"]
            device_dets = np.asarray(out["dets"]) if "dets" in out else None
            for i in range(decoded.shape[0]):
                if device_dets is not None:
                    d = device_dets[i]
                    dets = d[d[:, 4] > 0]  # trim zero-score padding
                else:
                    dets = nms_numpy(
                        decoded[i],
                        conf_thres=self.conf_thres,
                        iou_thres=self.iou_thres,
                        max_det=self.max_det,
                    )
                n = int(mask_gt[i].sum())
                acc.update(
                    dets[:, :4],
                    dets[:, 4],
                    dets[:, 5],
                    gt_boxes[i, :n],
                    gt_labels[i, :n].astype(np.float32),
                )
                n_images += 1

            t_post += time.perf_counter() - t0
            if save_artifacts_dir is not None and saved < max_artifacts:
                self._save_batch_artifacts(batch, out, save_artifacts_dir, saved)
                saved += 1

        items = items_sum / max(n_batches, 1)
        n = max(n_images, 1)
        speed = {
            "inference": 1000.0 * t_inf / n,
            "postprocess": 1000.0 * t_post / n,
        }
        return ValResult(
            metrics=acc.compute(),
            loss_items=items.astype(np.float32),
            n_images=n_images,
            speed=speed,
        )

    def _save_batch_artifacts(self, batch, out, root: Path, batch_idx: int) -> None:
        """Bbox-overlay JPEGs + sigmoid-mask PNGs + raw seg tensors
        (reference validator.py:317-394 _draw_dets/_save_preds_and_masks)."""
        import cv2

        root = Path(root)
        (root / "preds").mkdir(parents=True, exist_ok=True)

        decoded = np.asarray(out["decoded"])
        images = batch["image"]
        for i in range(min(images.shape[0], 4)):
            dets = nms_numpy(decoded[i], conf_thres=0.25, iou_thres=self.iou_thres, max_det=50)
            im = np.ascontiguousarray(images[i])
            for x1, y1, x2, y2, conf, c in dets:
                cv2.rectangle(im, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 1)
                cv2.putText(im, f"{conf:.2f}", (int(x1), max(8, int(y1) - 2)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 255, 0), 1)
            cv2.imwrite(str(root / "preds" / f"batch{batch_idx}_img{i}_dets.jpg"), im)
        for sk, logits in out["seg"].items():
            arr = np.asarray(logits)
            prob = 1.0 / (1.0 + np.exp(-arr))
            np.save(root / "preds" / f"batch{batch_idx}_{sk}.npy", arr)
            for i in range(min(arr.shape[0], 4)):
                img = (prob[i, ..., 0] * 255).astype(np.uint8)
                cv2.imwrite(str(root / "preds" / f"batch{batch_idx}_img{i}_{sk}.png"), img)
        if "taps" in out:
            (root / "fm").mkdir(parents=True, exist_ok=True)
            from mga_yolo_tpu.utils.plotting import feature_visualization

            for idx, feat in out["taps"].items():
                arr = np.asarray(feat)
                np.save(root / "fm" / f"batch{batch_idx}_layer{idx}.npy", arr)
                feature_visualization(
                    arr[0], root / "fm" / f"batch{batch_idx}_layer{idx}.png"
                )
