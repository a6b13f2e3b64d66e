"""CLI: mga-predict — run inference, save overlays and MGA mask PNGs.

Mirrors the reference predict surface incl. ``--save-feature-maps``
(BASELINE.json config 5): per-image bbox overlay JPEG + per-scale sigmoid
mask PNGs + optional raw feature tensors.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser("mga-predict")
    p.add_argument("--weights", required=True)
    p.add_argument("--source", required=True, help="image file or directory")
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--out", default="runs/predict")
    p.add_argument("--save-feature-maps", action="store_true")
    p.add_argument("--fuse", action="store_true", help="fold BN into convs before inference")
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    from mga_yolo_tpu.data.dataset import IMG_EXTS
    from mga_yolo_tpu.train.predictor import load_predictor
    from mga_yolo_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    src = Path(args.source)
    files = (
        sorted(p for p in src.rglob("*") if p.suffix.lower() in IMG_EXTS)
        if src.is_dir()
        else [src]
    )
    pred = load_predictor(args.weights, imgsz=args.imgsz, conf=args.conf, iou=args.iou, fuse=args.fuse)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    results = pred([str(f) for f in files], batch_size=args.batch)
    for f, r in zip(files, results):
        cv2.imwrite(str(out_dir / f"{f.stem}_pred.jpg"), r.plot())
        for sk, m in r.mga_masks.items():
            cv2.imwrite(
                str(out_dir / f"{f.stem}_mask_{sk}.png"), (m * 255).astype(np.uint8)
            )
        if args.save_feature_maps:
            np.savez(
                out_dir / f"{f.stem}_masks.npz",
                **{k: v for k, v in r.mga_masks.items()},
            )
        print(f"{f.name}: {len(r)} detections")


if __name__ == "__main__":
    main()
