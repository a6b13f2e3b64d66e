"""Host data-pipeline throughput: DataLoader img/s by cache mode.

The TPU train step consumes ~1000+ img/s at b128; the host pipeline must
keep up or the chip starves (the reference leans on torch DataLoader worker
processes + `cache: ram|disk`, base.py:131-143 — this measures our threaded
loader + cache equivalents). Pure CPU bench, no jax.

Usage: PYTHONPATH=/root/repo python tools/scripts/bench_loader.py
Env: MGA_BENCH_IMGSZ (640), MGA_BENCH_N (64 images), MGA_BENCH_BATCH (16),
     MGA_BENCH_MOSAIC (1), MGA_BENCH_WORKERS (4).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from pathlib import Path

IMGSZ = int(os.environ.get("MGA_BENCH_IMGSZ", "640"))
N = int(os.environ.get("MGA_BENCH_N", "64"))
BATCH = int(os.environ.get("MGA_BENCH_BATCH", "16"))
MOSAIC = float(os.environ.get("MGA_BENCH_MOSAIC", "1"))
WORKERS = int(os.environ.get("MGA_BENCH_WORKERS", "4"))


def run_epochs(cache, root: Path, epochs: int = 2, raw: bool = False) -> dict:
    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.data.dataset import MGADataset
    from mga_yolo_tpu.data.loader import DataLoader

    cfg = load_config({
        "data": str(root / "data.yaml"), "imgsz": IMGSZ, "max_boxes": 16,
        "cache": cache, "mosaic": MOSAIC, "workers": WORKERS,
    })
    t0 = time.perf_counter()
    ds = MGADataset(cfg, split="train", augment=True)
    t_init = time.perf_counter() - t0

    dl = DataLoader(ds, BATCH, shuffle=True, workers=WORKERS, drop_last=True)
    # raw mode = the host half of device-side augmentation
    # (augment.on_device): decode + letterbox + mosaic placement only; the
    # warp/HSV/flip/pyramid cost moves into the accelerator's jit program
    dl.raw_mode = raw
    key = "canvas" if raw else "image"
    per_epoch = []
    for ep in range(epochs):
        dl.set_epoch(ep)
        t0 = time.perf_counter()
        n_img = 0
        for b in dl:
            n_img += b[key].shape[0]
        per_epoch.append(n_img / (time.perf_counter() - t0))
    return {
        "cache": str(cache),
        "raw": raw,
        "init_s": round(t_init, 2),
        "img_per_s_cold": round(per_epoch[0], 1),
        "img_per_s_warm": round(per_epoch[-1], 1),
    }


def main() -> None:
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.synth import create_synthetic_dataset

    tmp = Path(tempfile.mkdtemp(prefix="mga_loaderbench_"))
    try:
        create_synthetic_dataset(tmp, n=N, size=IMGSZ)
        rows = [run_epochs(c, tmp) for c in (False, "ram", "disk")]
        rows += [run_epochs(c, tmp, raw=True) for c in (False, "ram")]
        print(json.dumps({
            "imgsz": IMGSZ, "n_images": N, "batch": BATCH,
            "mosaic": MOSAIC, "workers": WORKERS, "modes": rows,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
