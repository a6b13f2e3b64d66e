"""results.csv writer with the reference column schema.

Matches `/root/reference/mga_yolo/model/trainer.py:106-159` MGATrainer
``save_metrics``: fixed header order [epoch, train/val det {total,box,dfl,cls},
train/val seg {total, p3/p4/p5 x bce/dice}, Kendall mtl/sigma2_* + mtl/w_*]
followed by sorted extras (metrics/*, alpha_P*, spade/*). The downstream
plotting suite consumes this schema unchanged.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict

HEADER_ORDER = [
    "epoch",
    "train/det/total", "train/det/box", "train/det/dfl", "train/det/cls",
    "train/seg/total", "train/seg/p3_bce", "train/seg/p3_dice",
    "train/seg/p4_bce", "train/seg/p4_dice", "train/seg/p5_bce", "train/seg/p5_dice",
    "val/det/total", "val/det/box", "val/det/dfl", "val/det/cls",
    "val/seg/total", "val/seg/p3_bce", "val/seg/p3_dice",
    "val/seg/p4_bce", "val/seg/p4_dice", "val/seg/p5_bce", "val/seg/p5_dice",
    "mtl/sigma2_det", "mtl/sigma2_seg", "mtl/w_det", "mtl/w_seg",
]


class ResultsCSV:
    def __init__(self, save_dir: Path):
        self.path = Path(save_dir) / "results.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._header: list[str] | None = None

    def truncate_after_epoch(self, start_epoch: int) -> None:
        """Drop rows with epoch >= start_epoch + 1 (resume hygiene: no
        duplicate epoch rows after a resume re-runs those epochs)."""
        if not self.path.exists():
            return
        with open(self.path, newline="") as f:
            rows = list(csv.reader(f))
        if not rows:
            return
        header, body = rows[0], rows[1:]
        try:
            ei = header.index("epoch")
        except ValueError:
            return
        kept = [r for r in body if r and float(r[ei]) <= start_epoch]
        with open(self.path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(kept)
        self._header = header

    def append(self, row: Dict[str, float]) -> None:
        if self._header is None:
            extras = [k for k in row if k not in HEADER_ORDER]
            self._header = HEADER_ORDER + sorted(extras)
            write_header = not self.path.exists()
        else:
            write_header = False
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._header, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow({k: row.get(k) for k in self._header})


def loss_items_to_row(prefix: str, items) -> Dict[str, float]:
    """10-element loss_items -> reference train/ or val/ columns."""
    import numpy as np

    v = np.asarray(items, dtype=np.float64)
    box, cls_, dfl = v[0], v[1], v[2]
    seg = dict(zip(
        ("p3_bce", "p3_dice", "p4_bce", "p4_dice", "p5_bce", "p5_dice", "total"),
        (*v[3:9], v[9]),
    ))
    row = {
        f"{prefix}/det/total": float(box + cls_ + dfl),
        f"{prefix}/det/box": float(box),
        f"{prefix}/det/dfl": float(dfl),
        f"{prefix}/det/cls": float(cls_),
        f"{prefix}/seg/total": float(seg["total"]),
    }
    for k in ("p3_bce", "p3_dice", "p4_bce", "p4_dice", "p5_bce", "p5_dice"):
        row[f"{prefix}/seg/{k}"] = float(seg[k])
    return row
