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
from mga_yolo_tpu.utils.metrics import ConfusionMatrix, DetMetrics, MetricAccumulator


@dataclasses.dataclass
class ValResult:
    metrics: DetMetrics
    loss_items: np.ndarray  # (10,) mean val loss items
    n_images: int = 0
    # ms per image per phase (reference engine/validator.py speed dict)
    speed: dict = dataclasses.field(default_factory=dict)
    confusion: Optional[ConfusionMatrix] = None
    names: dict = dataclasses.field(default_factory=dict)

    def results_dict(self):
        return self.metrics.results_dict()

    def class_table(self) -> str:
        """Per-class results table (reference DetectionValidator.print_results,
        detect/val.py:199-223): Class / Instances / P / R / mAP50 / mAP50-95."""
        m = self.metrics
        rows = [f"{'Class':<20}{'Instances':>10}{'P':>10}{'R':>10}{'mAP50':>10}{'mAP50-95':>10}"]
        rows.append(
            f"{'all':<20}{int(m.nt_per_class.sum()):>10}{m.precision:>10.3f}"
            f"{m.recall:>10.3f}{m.map50:>10.3f}{m.map:>10.3f}"
        )
        if len(m.ap_class) > 1:
            for i, c in enumerate(m.ap_class):
                name = str(self.names.get(int(c), int(c)))
                rows.append(
                    f"{name:<20}{int(m.nt_per_class[i]):>10}{m.p_per_class[i]:>10.3f}"
                    f"{m.r_per_class[i]:>10.3f}{m.ap50_per_class[i]:>10.3f}{m.ap_per_class_[i]:>10.3f}"
                )
        return "\n".join(rows)


class Validator:
    """Runs the jitted eval step over a loader and computes detection metrics.

    Device inference + on-device NMS run in one jitted program; host work is
    TP matching, ConfusionMatrix accumulation and (optionally) COCO-JSON
    export, curve plots and artifact dumps — mirroring MGAValidator +
    DetectionValidator (`models/yolo/detect/val.py:101,199-223,365`).
    """

    def __init__(
        self,
        eval_fn: Callable,
        loader: DataLoader,
        cfg: MGAConfig,
        conf_thres: float = 0.001,
        iou_thres: float = 0.7,
        max_det: int = 300,
        mesh=None,
    ):
        self.eval_fn = eval_fn
        self.loader = loader
        self.cfg = cfg
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        self.mesh = mesh  # for multi-host global-batch assembly
        ds = getattr(loader, "dataset", None)
        self.names = dict(getattr(ds, "names", {}) or {})
        self.nc = max(len(self.names), 1)

    def __call__(
        self,
        state,
        save_artifacts_dir: Optional[Path] = None,
        max_artifacts: int = 4,
        plots_dir: Optional[Path] = None,
        save_json: Optional[Path] = None,
        verbose: bool = False,
    ) -> ValResult:
        import time

        acc = MetricAccumulator()
        self._seen: set[int] = set()  # dedup of wrap-around padded val rows
        # reference wires the confusion matrix into every val run (val.py:101)
        confusion = ConfusionMatrix(self.nc, conf=0.25, iou_thres=0.45)
        coco = None
        if save_json is not None:
            from mga_yolo_tpu.utils.coco import CocoWriter

            coco = CocoWriter(save_json)
        ds = getattr(self.loader, "dataset", None)

        items_sum = np.zeros(10, np.float64)
        n_batches = 0
        n_images = 0
        saved = 0
        t_pre = t_inf = t_post = 0.0

        it = iter(self.loader)
        while True:
            # preprocess phase = host batch assembly (augment-off letterbox +
            # mask pyramid, reference BaseValidator preprocess timing)
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                break
            batch = dict(batch)
            index = batch.pop("index", None)
            t_pre += time.perf_counter() - t0

            t0 = time.perf_counter()
            dev_batch = batch
            if self.mesh is not None:
                from mga_yolo_tpu.train import state as S

                dev_batch = S.host_local_to_global(batch, self.mesh)
            out = self.eval_fn(state, dev_batch)
            decoded = np.asarray(out["decoded"])  # (B, A, 4+nc) xywh px
            t_inf += time.perf_counter() - t0
            t0 = time.perf_counter()
            items_sum += np.asarray(out["items"], np.float64)
            n_batches += 1

            gt_boxes = batch["gt_boxes"]
            gt_labels = batch["gt_labels"]
            mask_gt = batch["mask_gt"]
            device_dets = np.asarray(out["dets"]) if "dets" in out else None
            n_local = gt_boxes.shape[0]
            if decoded.shape[0] != n_local:
                # multi-host: outputs are global (replicated), GT is this
                # host's shard — take the matching global rows
                import jax

                off = jax.process_index() * n_local
                decoded = decoded[off : off + n_local]
                if device_dets is not None:
                    device_dets = device_dets[off : off + n_local]
            for i in range(decoded.shape[0]):
                if index is not None:
                    di = int(index[i])
                    if di in self._seen:
                        continue  # wrap-around padding row (sharded val tail)
                    self._seen.add(di)
                if device_dets is not None:
                    d = device_dets[i]
                    dets = d[d[:, 4] > 0]  # trim zero-score padding
                else:
                    dets = nms_numpy(
                        decoded[i],
                        conf_thres=self.conf_thres,
                        iou_thres=self.iou_thres,
                        max_det=self.max_det,
                        multi_label=self.nc > 1,
                    )
                n = int(mask_gt[i].sum())
                gtb = gt_boxes[i, :n]
                gtc = gt_labels[i, :n].astype(np.float32)
                acc.update(dets[:, :4], dets[:, 4], dets[:, 5], gtb, gtc)
                confusion.process_batch(dets[:, :4], dets[:, 4], dets[:, 5], gtb, gtc)
                if coco is not None:
                    img_id = n_images
                    if index is not None and ds is not None:
                        di = int(index[i])
                        stem = Path(ds.img_files[di]).stem
                        # COCO convention: numeric stem -> int id (reference
                        # pred_to_json, detect/val.py:365)
                        img_id = int(stem) if stem.isnumeric() else stem
                    coco.add(dets, img_id)
                n_images += 1

            t_post += time.perf_counter() - t0
            if save_artifacts_dir is not None and saved < max_artifacts:
                self._save_batch_artifacts(batch, out, save_artifacts_dir, saved)
                saved += 1

        items = items_sum / max(n_batches, 1)
        n = max(n_images, 1)
        speed = {
            "preprocess": 1000.0 * t_pre / n,
            "inference": 1000.0 * t_inf / n,
            # val loss is fused into the same jitted program as inference, so
            # it has no separable wall-clock phase (reference runs it as a
            # fourth pass; here it is 0 by construction)
            "loss": 0.0,
            "postprocess": 1000.0 * t_post / n,
        }
        if coco is not None:
            coco.save()
        # multi-host: merge per-shard stats so metrics are global (no-op on 1)
        acc.gather_across_hosts()
        result = ValResult(
            metrics=acc.compute(),
            loss_items=items.astype(np.float32),
            n_images=n_images,
            speed=speed,
            confusion=confusion,
            names=self.names,
        )
        if plots_dir is not None:
            self._save_plots(result, Path(plots_dir))
        if verbose:
            print(result.class_table())
        return result

    def _save_plots(self, result: ValResult, out_dir: Path) -> None:
        """confusion_matrix.png + PR/F1/P/R curve PNGs (reference val plots)."""
        from mga_yolo_tpu.utils.plotting import (
            plot_confusion_matrix,
            plot_mc_curve,
            plot_pr_curve,
        )

        out_dir.mkdir(parents=True, exist_ok=True)
        names = {i: self.names.get(i, str(i)) for i in range(self.nc)}
        plot_confusion_matrix(result.confusion.matrix, names,
                              out_dir / "confusion_matrix.png", normalize=False)
        plot_confusion_matrix(result.confusion.matrix, names,
                              out_dir / "confusion_matrix_normalized.png", normalize=True)
        c = result.metrics.curves
        if c:
            plot_pr_curve(c["px101"], c["py"], result.metrics.ap50_per_class, names,
                          out_dir / "PR_curve.png")
            plot_mc_curve(c["px"], c["f1"], names, out_dir / "F1_curve.png", ylabel="F1")
            plot_mc_curve(c["px"], c["p"], names, out_dir / "P_curve.png", ylabel="Precision")
            plot_mc_curve(c["px"], c["r"], names, out_dir / "R_curve.png", ylabel="Recall")

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
