"""Baseline trainer CLI — plain YOLOv8 detection, no MGA components.

Mirrors `/root/reference/tools/cli/train.py:47-82` (BaseFMTrainer path): same
trainer loop and CSV/artifact capture, with the MGA-free model graph and the
segmentation loss disabled.
"""

from __future__ import annotations

import sys


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    from mga_yolo_tpu.cli.train import parse_overrides
    import argparse

    p = argparse.ArgumentParser("base-train")
    p.add_argument("--cfg", default=None)
    args, rest = p.parse_known_args(argv)
    overrides = parse_overrides(rest)
    overrides.setdefault("model", "configs/models/yolov8.yaml")
    overrides["enabled"] = False  # seg loss off (detection-only baseline)
    overrides.setdefault("task", "detect")

    from mga_yolo_tpu.train.trainer import train

    train(args.cfg, **overrides)


if __name__ == "__main__":
    main()
