"""NMS, metrics, predictor, kfold, CLI tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from mga_yolo_tpu.ops.nms import nms_jax, nms_numpy
from mga_yolo_tpu.utils.metrics import (
    DetMetrics,
    MetricAccumulator,
    ap_per_class,
    box_iou,
    match_predictions,
)


def _mk_pred(boxes, scores, nc=1, A=64):
    """Build a decoded (A, 4+nc) array (xywh px + probs) with given dets."""
    out = np.zeros((A, 4 + nc), np.float32)
    for i, (b, s) in enumerate(zip(boxes, scores)):
        x1, y1, x2, y2 = b
        out[i, :4] = [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]
        out[i, 4] = s
    return out


def test_nms_numpy_suppresses_overlaps():
    pred = _mk_pred(
        [(10, 10, 50, 50), (12, 12, 52, 52), (100, 100, 140, 140)], [0.9, 0.8, 0.7]
    )
    dets = nms_numpy(pred, conf_thres=0.25, iou_thres=0.45)
    assert len(dets) == 2
    np.testing.assert_allclose(dets[0, 4], 0.9)
    np.testing.assert_allclose(dets[1, 4], 0.7)


def test_nms_jax_matches_numpy():
    rng = np.random.default_rng(0)
    A, nc = 128, 3
    pred = np.zeros((A, 4 + nc), np.float32)
    xy = rng.uniform(50, 400, (A, 2))
    wh = rng.uniform(20, 80, (A, 2))
    pred[:, :2], pred[:, 2:4] = xy, wh
    pred[:, 4:] = rng.uniform(0, 1, (A, nc)) ** 2

    ours_b, ours_s, ours_c = nms_jax(jnp.asarray(pred)[None], 0.25, 0.45, max_det=32)
    ref = nms_numpy(pred, 0.25, 0.45, max_det=32)

    k = len(ref)
    got_s = np.asarray(ours_s[0])[:k]
    np.testing.assert_allclose(got_s, ref[:, 4], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_b[0])[:k], ref[:, :4], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ours_c[0])[:k], ref[:, 5])
    # padding is zero-score
    assert float(np.asarray(ours_s[0])[k:].max(initial=0.0)) == 0.0


def test_match_predictions_greedy():
    true_cls = np.array([0.0, 0.0])
    pred_cls = np.array([0.0, 0.0, 0.0])
    # pred 0 overlaps gt0 strongly, pred1 medium gt0, pred2 matches gt1
    iou = np.array([[0.9, 0.6, 0.0], [0.0, 0.0, 0.8]])
    tp = match_predictions(pred_cls, true_cls, iou)
    assert tp[0, 0] and tp[2, 0]          # best matches kept at IoU 0.5
    assert not tp[1, 0]                   # second pred for same gt not TP
    assert tp[0, 4] and not tp[0, 9]      # 0.9 passes 0.7, fails 0.95


def test_ap_perfect_detector():
    acc = MetricAccumulator()
    for _ in range(4):
        gt = np.array([[10, 10, 50, 50], [80, 80, 120, 120]], np.float32)
        acc.update(gt.copy(), np.array([0.9, 0.8]), np.zeros(2), gt, np.zeros(2))
    m = acc.compute()
    assert m.map50 > 0.99
    assert m.map > 0.99
    assert m.precision > 0.99 and m.recall > 0.99
    assert 0.99 < m.fitness <= 1.0


def test_ap_half_detector():
    acc = MetricAccumulator()
    for i in range(10):
        gt = np.array([[10, 10, 50, 50]], np.float32)
        if i % 2 == 0:
            acc.update(gt.copy(), np.array([0.9]), np.zeros(1), gt, np.zeros(1))
        else:  # detection misses entirely
            acc.update(
                np.array([[200, 200, 240, 240]], np.float32),
                np.array([0.9]),
                np.zeros(1),
                gt,
                np.zeros(1),
            )
    m = acc.compute()
    assert 0.3 < m.map50 < 0.7


def test_kfold_indices():
    from mga_yolo_tpu.data.kfold import kfold_indices

    folds = kfold_indices(10, 3, seed=1)
    assert len(folds) == 3
    all_val = np.sort(np.concatenate([v for _, v in folds]))
    np.testing.assert_array_equal(all_val, np.arange(10))
    for tr, va in folds:
        assert len(np.intersect1d(tr, va)) == 0


def test_cli_override_parsing():
    from mga_yolo_tpu.cli.train import parse_overrides

    out = parse_overrides(["--epochs", "5", "--lr0", "0.02", "--mosaic", "0.0",
                           "--name=exp1", "--deterministic", "true"])
    assert out == {"epochs": 5, "lr0": 0.02, "mosaic": 0.0, "name": "exp1",
                   "deterministic": True}


def test_mosaic9():
    from mga_yolo_tpu.data import transforms as T

    rng = np.random.default_rng(0)
    parts = []
    for _ in range(9):
        img = np.zeros((32, 32, 3), np.uint8)
        img[8:24, 8:24] = 255
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        parts.append({
            "img": img,
            "boxes": np.array([[8, 8, 24, 24]], np.float32),
            "cls": np.array([0.0], np.float32),
            "mask": mask,
        })
    out = T.mosaic9(parts, rng, 32)
    assert out["img"].shape == (64, 64, 3)
    assert out["mask"].shape == (64, 64)
    # mask still aligned with bright pixels
    bright = (out["img"][..., 0] > 100).astype(np.uint8)
    if out["mask"].sum():
        assert (bright & out["mask"]).sum() / out["mask"].sum() > 0.99


def test_coco_writer(tmp_path):
    import json

    from mga_yolo_tpu.utils.coco import CocoWriter

    w = CocoWriter(tmp_path / "preds.json")
    dets = np.array([[10, 20, 50, 80, 0.9, 0]], np.float32)
    w.add(dets, image_id=7)
    p = w.save()
    rec = json.loads(p.read_text())
    assert rec[0]["image_id"] == 7
    assert rec[0]["bbox"] == [10.0, 20.0, 40.0, 60.0]
    assert abs(rec[0]["score"] - 0.9) < 1e-6


def test_public_api():
    import mga_yolo_tpu

    assert callable(mga_yolo_tpu.load_config)
    assert callable(mga_yolo_tpu.create_model)
    assert callable(mga_yolo_tpu.MGATrainer)
    assert callable(mga_yolo_tpu.MGA)


def test_grid_prepare_config(tmp_path):
    import yaml

    from mga_yolo_tpu.scripts.performance_comparison import prepare_config

    hyp = {"epochs": 5, "lr0": 0.01}
    p = prepare_config(hyp, "eca", "s", "data.yaml", "runs/grid", "eca_s_fold0", tmp_path)
    cfg = yaml.safe_load(p.read_text())
    assert cfg["model"] == "configs/models/yolov8_eca.yaml"
    assert cfg["model_scale"] == "s"
    assert cfg["epochs"] == 5
    assert cfg["name"] == "eca_s_fold0"


def test_kfold_writes_tree(tmp_path):
    import yaml

    from mga_yolo_tpu.data.kfold import kfold_indices, write_fold
    from tests.synth import create_synthetic_dataset

    create_synthetic_dataset(tmp_path / "src", n=6, size=32)
    images = sorted((tmp_path / "src" / "images" / "train").glob("*.png"))
    (tr, va), = kfold_indices(len(images), 1, seed=0)[:1]
    dy = write_fold(images, tmp_path / "folds", 0, tr, va, "masks", str(tmp_path / "src"), {0: "stenosis"})
    cfg = yaml.safe_load(dy.read_text())
    assert cfg["masks_dir"] == "masks"
    assert (tmp_path / "folds" / "fold_0" / "images" / "val").exists()
    # symlinked labels resolve
    lbls = list((tmp_path / "folds" / "fold_0" / "labels" / "val").glob("*.txt"))
    assert lbls and lbls[0].resolve().exists()


def test_facade_task_detection():
    from mga_yolo_tpu.api import MGA

    m = MGA("configs/models/yolov8_cbam.yaml", scale="n")
    assert m.task == "mga"
    assert m.info()["n_layers"] == 29
    base = MGA("configs/models/yolov8.yaml", scale="n")
    assert base.task == "detect"
