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
    p.add_argument("--source", required=True,
                   help="image/video file, directory, glob, webcam index, or stream URL")
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--out", default="runs/predict")
    p.add_argument("--save-feature-maps", action="store_true")
    p.add_argument("--fuse", action="store_true", help="fold BN into convs before inference")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--use-pallas", default="auto", choices=["auto", "true", "false"],
                   help="fused Pallas attention kernels (auto = on when on TPU)")
    p.add_argument("--max-frames", type=int, default=0,
                   help="cap frames taken per video/stream source (0 = all)")
    p.add_argument("--save-frame-masks", action="store_true",
                   help="also save per-frame mask PNGs for video sources")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    from mga_yolo_tpu.data.sources import VideoSink
    from mga_yolo_tpu.train.predictor import load_predictor
    from mga_yolo_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    pred = load_predictor(args.weights, imgsz=args.imgsz, conf=args.conf, iou=args.iou,
                          fuse=args.fuse, use_pallas=args.use_pallas)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    sinks: dict[str, VideoSink] = {}   # one annotated-video writer per source video
    # recursive dir sources can contain same-named files (a/clip.mp4,
    # b/clip.mp4); key outputs by a per-path unique stem so writers never
    # truncate each other's files
    _stems: dict[str, str] = {}
    _used: set[str] = set()

    def unique_stem(frame) -> str:
        s = _stems.get(frame.path)
        if s is None:
            s, n = frame.stem, 1
            while s in _used:
                n += 1
                s = f"{frame.stem}_{n}"
            _used.add(s)
            _stems[frame.path] = s
        return s

    n_img = n_frames = 0
    try:
        for frame, r in pred.stream(args.source, batch_size=args.batch,
                                    max_frames=args.max_frames):
            annotated = r.plot(img=frame.img.copy())
            if frame.is_video:
                sink = sinks.get(frame.path)
                if sink is None:
                    suffix = ".avi" if frame.path.lower().endswith(".avi") else ".mp4"
                    sink = sinks[frame.path] = VideoSink(
                        out_dir / f"{unique_stem(frame)}_pred{suffix}", fps=frame.fps)
                sink.write(annotated)
                n_frames += 1
                if args.save_frame_masks or args.save_feature_maps:
                    tag = f"{unique_stem(frame)}_f{frame.index:05d}"
                    if args.save_frame_masks:
                        for sk, m in r.mga_masks.items():
                            cv2.imwrite(str(out_dir / f"{tag}_mask_{sk}.png"),
                                        (m * 255).astype(np.uint8))
                    if args.save_feature_maps:
                        np.savez(out_dir / f"{tag}_masks.npz", **r.mga_masks)
            else:
                stem = unique_stem(frame)
                cv2.imwrite(str(out_dir / f"{stem}_pred.jpg"), annotated)
                for sk, m in r.mga_masks.items():
                    cv2.imwrite(str(out_dir / f"{stem}_mask_{sk}.png"),
                                (m * 255).astype(np.uint8))
                if args.save_feature_maps:
                    np.savez(out_dir / f"{stem}_masks.npz", **r.mga_masks)
                n_img += 1
                print(f"{Path(frame.path).name}: {len(r)} detections")
    finally:
        for sink in sinks.values():
            sink.close()
    for path, sink in sinks.items():
        print(f"{Path(path).name}: {sink.frames_written} frames -> {sink.out_path.name}")
    print(f"[mga-predict] {n_img} images, {n_frames} video frames -> {out_dir}")


if __name__ == "__main__":
    main()
