"""mAP parity run: torch reference vs this framework on one shared fixture.

The north star (BASELINE.json) demands "mAP@50 within 0.5 pt of the Torch
reference". The ARCADE dataset is not available in this sandbox, so parity is
established on the same synthetic vessel-style fixture both stacks can train
on, with **matched hyperparameters** (SGD, same lr schedule, augmentations
off, same batch/imgsz/epochs — reference protocol
`/root/reference/mga_yolo/engine/train.py:10` + `model/trainer.py:144-151`).

Runs the torch reference on CPU (it has no TPU path) and this framework on
whatever jax backend is active, then prints a table and optionally appends it
to BASELINE.md.

Usage:
    python -m tools.scripts.map_parity --epochs 60 --imgsz 128 --n 24 \
        [--write-baseline] [--skip-reference] [--out /tmp/map_parity]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# runnable as a plain script from anywhere: the repo root is two levels up
_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def make_fixture(root: Path, n_train: int, n_val: int, size: int, seed: int = 0) -> Path:
    """Synthetic dataset with a held-out val split (same generator family as
    tests/synth.py / reference tests/test_mga_train.py:8-39)."""
    import cv2
    import yaml

    rng = np.random.default_rng(seed)
    for split, count, off in (("train", n_train, 0), ("val", n_val, n_train)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        mask_dir = root / "masks"
        for d in (img_dir, lbl_dir, mask_dir):
            d.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            img = rng.integers(0, 30, (size, size, 3)).astype(np.uint8)
            mask = np.zeros((size, size), np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 4))):
                w = int(rng.integers(size // 8, size // 3))
                h = int(rng.integers(size // 8, size // 3))
                x = int(rng.integers(0, size - w))
                y = int(rng.integers(0, size - h))
                img[y : y + h, x : x + w] = 255
                mask[y : y + h, x : x + w] = 255
                cx, cy = (x + w / 2) / size, (y + h / 2) / size
                lines.append(f"0 {cx:.6f} {cy:.6f} {w / size:.6f} {h / size:.6f}")
            name = f"{split}{off + i}"
            cv2.imwrite(str(img_dir / f"{name}.png"), img)
            cv2.imwrite(str(mask_dir / f"{name}.png"), mask)
            (lbl_dir / f"{name}.txt").write_text("\n".join(lines) + "\n")
    data_yaml = root / "data.yaml"
    data_yaml.write_text(
        yaml.safe_dump(
            {
                "path": str(root),
                "train": "images/train",
                "val": "images/val",
                "dataset": str(root),
                "masks_dir": "masks",
                "names": {0: "stenosis"},
                "nc": 1,
            }
        )
    )
    return data_yaml


# hyperparameters shared verbatim by both stacks (augs off = the reference's
# medical-imaging profile with the geometric terms also zeroed for exactness)
COMMON_HYP = dict(
    optimizer="SGD", lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
    warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
    box=7.5, cls=0.5, dfl=1.5, seed=0,
    mosaic=0.0, mixup=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
    translate=0.0, scale=0.0, fliplr=0.0, flipud=0.0,
)


def run_reference(data_yaml: Path, out_dir: Path, epochs: int, imgsz: int, batch: int,
                  seed: int = 0) -> dict:
    """Train + val the torch reference (read-only import, CPU)."""
    import os

    os.environ["YOLO_OFFLINE"] = "1"
    repo = str(Path(__file__).resolve().parents[2])
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from tests._reference_oracle import _install_torchvision_stub, _patch_importlib_metadata

    _install_torchvision_stub()
    _patch_importlib_metadata()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from mga_yolo.external.ultralytics.ultralytics import YOLO

    cfg = dict(
        COMMON_HYP,
        seed=seed,
        data=str(data_yaml), epochs=epochs, imgsz=imgsz, batch=batch, workers=0,
        plots=False, val=True, amp=False, device="cpu", cache=False,
        erasing=0.0, project=str(out_dir), name="reference", exist_ok=True,
        deterministic=True, patience=10_000,
    )
    model = YOLO("/root/reference/configs/models/yolov8_cbam.yaml", task="mga")
    t0 = time.time()
    res = model.train(**cfg)
    wall = time.time() - t0
    rd = {k: float(v) for k, v in res.results_dict.items()} if res is not None else {}
    rd["wall_s"] = wall
    return rd


def run_ours(data_yaml: Path, out_dir: Path, epochs: int, imgsz: int, batch: int,
             seed: int = 0) -> dict:
    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.train.trainer import MGATrainer

    cfg = load_config(
        dict(
            COMMON_HYP,
            seed=seed,
            data=str(data_yaml), epochs=epochs, imgsz=imgsz, batch=batch,
            model="configs/models/yolov8_cbam.yaml", model_scale="n",
            workers=2, project=str(out_dir), name="ours", exist_ok=True,
            patience=10_000, plots=False,
            save=False,  # skip per-epoch orbax saves (slow over the TPU tunnel)
        )
    )
    t0 = time.time()
    trainer = MGATrainer(cfg)
    result = trainer.train()
    wall = time.time() - t0
    rd = {k: float(v) for k, v in result.results_dict().items()}
    rd["wall_s"] = wall
    return rd


def main(argv=None) -> None:
    p = argparse.ArgumentParser("map-parity")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--seed", type=int, default=0, help="training seed for BOTH stacks (fixture stays seed-0)")
    p.add_argument("--imgsz", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=24, help="train images")
    p.add_argument("--n-val", type=int, default=12)
    p.add_argument("--out", default="/tmp/map_parity")
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--skip-ours", action="store_true")
    p.add_argument("--write-baseline", action="store_true",
                   help="append the result table to BASELINE.md")
    args = p.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data_yaml = make_fixture(out / "ds", args.n, args.n_val, args.imgsz)
    results = {}
    results_path = out / "results.json"
    if results_path.exists():
        results = json.loads(results_path.read_text())

    if not args.skip_ours:
        print("[parity] training this framework ...")
        results["ours"] = run_ours(data_yaml, out, args.epochs, args.imgsz, args.batch, seed=args.seed)
        results_path.write_text(json.dumps(results, indent=2))
        print("[parity] ours:", results["ours"])
    if not args.skip_reference:
        print("[parity] training the torch reference (CPU) ...")
        results["reference"] = run_reference(data_yaml, out, args.epochs, args.imgsz, args.batch, seed=args.seed)
        results_path.write_text(json.dumps(results, indent=2))
        print("[parity] reference:", results["reference"])

    if "ours" in results and "reference" in results:
        o, r = results["ours"], results["reference"]
        d50 = o["metrics/mAP50(B)"] - r["metrics/mAP50(B)"]
        d5095 = o["metrics/mAP50-95(B)"] - r["metrics/mAP50-95(B)"]
        table = (
            f"| Stack | mAP50 | mAP50-95 | wall |\n|---|---|---|---|\n"
            f"| torch reference (CPU) | {r['metrics/mAP50(B)']:.4f} | "
            f"{r['metrics/mAP50-95(B)']:.4f} | {r['wall_s']:.0f}s |\n"
            f"| this framework | {o['metrics/mAP50(B)']:.4f} | "
            f"{o['metrics/mAP50-95(B)']:.4f} | {o['wall_s']:.0f}s |\n"
            f"| delta | {d50:+.4f} | {d5095:+.4f} | |\n"
        )
        print(table)
        verdict = "PASS" if abs(d50) <= 0.005 else "FAIL"
        print(f"[parity] |mAP50 delta| = {abs(d50):.4f} (target <= 0.005): {verdict}")
        if args.write_baseline:
            stamp = time.strftime("%Y-%m-%d")
            block = (
                f"\n## mAP parity vs torch reference ({stamp})\n\n"
                f"Matched-protocol run (`tools/scripts/map_parity.py`): synthetic vessel\n"
                f"fixture {args.n} train / {args.n_val} val @ {args.imgsz} px, "
                f"{args.epochs} epochs, batch {args.batch}, SGD, augs off.\n\n" + table
            )
            with open(Path(__file__).resolve().parents[2] / "BASELINE.md", "a") as f:
                f.write(block)
            print("[parity] appended to BASELINE.md")


if __name__ == "__main__":
    main()
