"""Rectangular val batching: static aspect buckets (reference `rect: True`,
ultralytics dataset set_rectangle) re-designed for TPU static shapes — a
fixed /32-aligned bucket set, batches formed within a bucket, wrap-padded to
full batch size so every bucket is exactly one XLA compile."""

from pathlib import Path

import cv2
import numpy as np
import pytest

from mga_yolo_tpu.config import load_config
from mga_yolo_tpu.data.dataset import MGADataset, image_size, rect_bucket_shapes
from mga_yolo_tpu.data.loader import DataLoader


def _mixed_ar_fixture(root: Path, n_per=3, size=64):
    """wide (h=size/2), square, tall (w=size/2) images with one box + mask."""
    img_dir = root / "images" / "val"
    lbl_dir = root / "labels" / "val"
    mask_dir = root / "masks"
    for d in (img_dir, lbl_dir, mask_dir):
        d.mkdir(parents=True, exist_ok=True)
    shapes = [(size // 2, size), (size, size), (size, size // 2)]
    k = 0
    for h, w in shapes:
        for _ in range(n_per):
            img = np.full((h, w, 3), 32, np.uint8)
            y0, y1, x0, x1 = h // 4, h // 2, w // 4, w // 2
            img[y0:y1, x0:x1] = 220
            cv2.imwrite(str(img_dir / f"im{k}.png"), img)
            cx, cy = (x0 + x1) / 2 / w, (y0 + y1) / 2 / h
            bw, bh = (x1 - x0) / w, (y1 - y0) / h
            (lbl_dir / f"im{k}.txt").write_text(f"0 {cx} {cy} {bw} {bh}\n")
            m = np.zeros((h, w), np.uint8)
            m[y0:y1, x0:x1] = 255
            cv2.imwrite(str(mask_dir / f"im{k}.png"), m)
            k += 1
    (root / "data.yaml").write_text(
        f"dataset: {root}\nmasks_dir: {mask_dir}\ntrain: images/val\n"
        f"val: images/val\nnames:\n  0: object\n"
    )
    return root / "data.yaml"


def test_rect_bucket_shapes_static():
    shapes = rect_bucket_shapes(640)
    assert (640, 640) in shapes
    for h, w in shapes:
        assert h % 32 == 0 and w % 32 == 0
    ars = [h / w for h, w in shapes]
    assert ars == sorted(ars)  # wide -> square -> tall


def test_image_size_header_parse(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (48, 80, 3)).astype(np.uint8)
    for ext in (".png", ".jpg", ".bmp"):
        p = tmp_path / f"x{ext}"
        cv2.imwrite(str(p), img)
        assert image_size(p) == (48, 80), ext


def test_rect_dataset_and_loader(tmp_path):
    yaml_path = _mixed_ar_fixture(tmp_path, n_per=3, size=64)
    cfg = load_config({"data": str(yaml_path), "imgsz": 64, "max_boxes": 4,
                       "rect": True})
    ds = MGADataset(cfg, "val", augment=False)
    assert ds.rect and ds.bucket is not None
    # wide images -> wide bucket (h < w), tall -> tall, square -> square
    for i in range(len(ds)):
        h, w = image_size(ds.img_files[i])
        bh, bw = ds.bucket_shapes[ds.bucket[i]]
        if h < w:
            assert bh < bw
        elif h > w:
            assert bh > bw
        else:
            assert bh == bw
        sample = ds.get(i)
        assert sample["image"].shape[:2] == (bh, bw)
        for m, st in zip(sample["masks"], (8, 16, 32)):
            assert m.shape == (bh // st, bw // st, 1)
        # boxes stay inside the bucket canvas
        gb = sample["gt_boxes"][sample["mask_gt"] > 0]
        assert (gb[:, [0, 2]] <= bw).all() and (gb[:, [1, 3]] <= bh).all()

    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    seen = set()
    shapes_seen = set()
    for batch in dl:
        shp = batch["image"].shape[1:3]
        shapes_seen.add(shp)
        assert batch["image"].shape[0] == 2  # wrap-padded, never partial
        # every image in a batch shares one bucket shape
        for m, st in zip(batch["masks"], (8, 16, 32)):
            assert m.shape[1:3] == (shp[0] // st, shp[1] // st)
        seen.update(int(i) for i in batch["index"])
    assert seen == set(range(len(ds)))  # full coverage despite bucketing
    assert len(shapes_seen) == 3


def test_rect_validator_end_to_end(tmp_path):
    """Validator over a rect loader: per-bucket compiles, index dedup, sane
    metrics on a trivially-detectable fixture with random weights (runs, no
    shape errors, counts every image exactly once)."""
    import jax

    from mga_yolo_tpu.config import det_loss_config, seg_loss_config
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S
    from mga_yolo_tpu.train.validator import Validator

    yaml_path = _mixed_ar_fixture(tmp_path, n_per=2, size=64)
    cfg = load_config({"data": str(yaml_path), "imgsz": 64, "max_boxes": 4,
                       "rect": True, "batch": 2})
    ds = MGADataset(cfg, "val", augment=False)
    # restrict to 2 buckets (wide + square) to bound CPU compile time
    keep = [i for i in range(len(ds))
            if ds.bucket_shapes[ds.bucket[i]][0] <= ds.bucket_shapes[ds.bucket[i]][1]]
    ds.img_files = [ds.img_files[i] for i in keep]
    ds.mask_paths = [ds.mask_paths[i] for i in keep]
    ds._labels = [ds._labels[i] for i in keep]
    ds.bucket = ds.bucket[keep]
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    mesh = S.data_mesh(jax.devices()[:1])
    eval_fn = S.jit_eval_step(
        S.make_eval_step(model, (8, 16, 32), spec.nc, det_loss_config(cfg),
                         seg_loss_config(cfg)),
        mesh,
    )
    v = Validator(eval_fn, dl, cfg, mesh=mesh)
    res = v(st)
    assert res.n_images == len(ds), (res.n_images, len(ds))
    assert np.isfinite(res.metrics.map50)
