"""`mga-serve` — persistent TPU inference server.

The reference ships only standalone deployment examples (SURVEY.md §2.9);
this is the TPU-native serving entry: one compiled fixed-shape program
(forward + DFL decode + device NMS) behind a micro-batching HTTP front.

Usage:
    python -m mga_yolo_tpu.cli.serve --weights runs/t/weights/best \
        [--imgsz 640] [--batch 8] [--port 8008] [--conf 0.25] [--iou 0.45] \
        [--masks] [--max-wait-ms 5]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser("mga-serve")
    p.add_argument("--weights", required=True)
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--masks", action="store_true", help="serve sigmoid masks too")
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--use-pallas", default="auto", choices=["auto", "true", "false"],
                   help="fused Pallas attention kernels (auto = on when on TPU)")
    args = p.parse_args(argv)

    from mga_yolo_tpu.serve import build_server

    server = build_server(
        args.weights, imgsz=args.imgsz, batch=args.batch, conf=args.conf,
        iou=args.iou, max_det=args.max_det, port=args.port, host=args.host,
        with_masks=args.masks, max_wait_ms=args.max_wait_ms, use_pallas=args.use_pallas,
    )
    print(f"[mga-serve] listening on http://{args.host}:{server.port}")
    try:
        server.httpd.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
