"""Baseline grid runner (mirror of mga grid orchestrator for plain YOLOv8).

Reference: /root/reference/tools/scripts/ultralytics_base_comparison.py.
Reuses the MGA grid scheduler with the base model graph and seg loss off.
"""

from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

import yaml

from mga_yolo_tpu.scripts.performance_comparison import Job, prepare_config, schedule_loop


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser("base-grid")
    p.add_argument("--exp", required=True)
    args = p.parse_args(argv)

    with open(args.exp) as f:
        exp = yaml.safe_load(f)
    with open(exp["hyp"]) as f:
        hyp = yaml.safe_load(f) or {}
    hyp["enabled"] = False  # detection-only

    project = exp.get("project", "runs/base_grid")
    folds_root = exp.get("folds_root")
    cfg_dir = Path(project) / "_configs"
    jobs = []
    for scale, fold in itertools.product(exp.get("scales", ["n"]), exp.get("folds", [0])):
        name = f"base_{scale}_fold{fold}"
        data_yaml = (
            str(Path(folds_root) / f"fold_{fold}" / "data.yaml") if folds_root else exp["data"]
        )
        cfg_path = prepare_config(hyp, "", scale, data_yaml, project, name, cfg_dir)
        # base model graph instead of a variant graph
        cfg = yaml.safe_load(cfg_path.read_text())
        cfg["model"] = "configs/models/yolov8.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        jobs.append(Job("base", scale, fold, cfg_path, name))
    schedule_loop(jobs, slots=int(exp.get("slots", 1)))


if __name__ == "__main__":
    main()
