"""Synthetic on-the-fly dataset builder for tests.

Mirrors the reference's create_synthetic_dataset
(`/root/reference/tests/test_mga_train.py:8-39`): tiny images with white
squares, matching YOLO txt labels, binary masks, and a data YAML carrying the
MGA ``dataset``/``masks_dir`` keys.
"""

from pathlib import Path

import cv2
import numpy as np
import yaml


def create_synthetic_dataset(root: Path, n: int = 4, size: int = 96, seed: int = 0) -> Path:
    rng = np.random.default_rng(seed)
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    mask_dir = root / "masks"
    for d in (img_dir, lbl_dir, mask_dir):
        d.mkdir(parents=True, exist_ok=True)

    for i in range(n):
        # mild background noise: constant images give zero-variance activations
        # whose BatchNorm backward explodes (see trainer grad clipping)
        img = rng.integers(0, 30, (size, size, 3)).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 3))):
            w = int(rng.integers(size // 8, size // 3))
            h = int(rng.integers(size // 8, size // 3))
            x = int(rng.integers(0, size - w))
            y = int(rng.integers(0, size - h))
            img[y : y + h, x : x + w] = 255
            mask[y : y + h, x : x + w] = 255
            cx, cy = (x + w / 2) / size, (y + h / 2) / size
            lines.append(f"0 {cx:.6f} {cy:.6f} {w / size:.6f} {h / size:.6f}")
        cv2.imwrite(str(img_dir / f"im{i}.png"), img)
        cv2.imwrite(str(mask_dir / f"im{i}.png"), mask)
        (lbl_dir / f"im{i}.txt").write_text("\n".join(lines) + "\n")

    data_yaml = root / "data.yaml"
    data_yaml.write_text(
        yaml.safe_dump(
            {
                "path": str(root),
                "train": "images/train",
                "val": "images/train",
                "dataset": str(root),
                "masks_dir": "masks",
                "names": {0: "stenosis"},
                "nc": 1,
            }
        )
    )
    return data_yaml
