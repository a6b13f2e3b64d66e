"""CLI end-to-end: mga-train subprocess on the synthetic dataset, then
mga-ckpt + mga-val + mga-predict against the produced run directory."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests._env import cpu_subprocess_env
from tests.synth import create_synthetic_dataset

pytestmark = pytest.mark.e2e

# CPU for subprocesses: env must be set before the interpreter starts
# (the sandbox sitecustomize imports jax at startup), and the TPU-tunnel
# plugin vars must be stripped or children stall minutes on tunnel init.
CPU_ENV = cpu_subprocess_env()


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    data_yaml = create_synthetic_dataset(root, n=4, size=64)
    out = tmp_path_factory.mktemp("runs")
    env_cmd = [
        sys.executable, "-m", "mga_yolo_tpu.cli.train",
        "--data", str(data_yaml), "--imgsz", "32", "--max_boxes", "4",
        "--batch", "2", "--nbs", "2", "--epochs", "2", "--mosaic", "0.0",
        "--workers", "1", "--project", str(out), "--name", "cli1",
    ]
    proc = subprocess.run(env_cmd, capture_output=True, text=True, timeout=900, env=CPU_ENV)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return data_yaml, out / "cli1"


def test_train_cli_artifacts(trained_run):
    _, run_dir = trained_run
    assert (run_dir / "results.csv").exists()
    assert (run_dir / "weights" / "best").exists()


def test_ckpt_cli(trained_run):
    _, run_dir = trained_run
    proc = subprocess.run(
        [sys.executable, "-m", "mga_yolo_tpu.cli.ckpt", "load", str(run_dir / "weights" / "last")],
        capture_output=True, text=True, timeout=600, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "params:" in proc.stdout


def test_ckpt_export_torch_cli(trained_run, tmp_path):
    """mga-ckpt export-torch writes a torch-loadable minimal checkpoint with
    the reference's key layout (deployment-toolchain gateway)."""
    _, run_dir = trained_run
    out = tmp_path / "export.pt"
    proc = subprocess.run(
        [
            sys.executable, "-m", "mga_yolo_tpu.cli.ckpt", "export-torch",
            str(run_dir / "weights" / "best"), str(out),
        ],
        capture_output=True, text=True, timeout=600, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert out.exists()
    import torch

    ckpt = torch.load(out, map_location="cpu", weights_only=True)
    sd = ckpt["ema_state_dict"]
    assert ckpt["train_args"]["nc"] >= 1
    assert any(k.startswith("model.0.conv") for k in sd)
    assert any(".dfl.conv.weight" in k for k in sd)


def test_predict_cli(trained_run, tmp_path):
    data_yaml, run_dir = trained_run
    src = data_yaml.parent / "images" / "train"
    proc = subprocess.run(
        [
            sys.executable, "-m", "mga_yolo_tpu.cli.predict",
            "--weights", str(run_dir / "weights" / "best"),
            "--source", str(src), "--out", str(tmp_path / "pred"),
            "--save-feature-maps",
        ],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    preds = list((tmp_path / "pred").glob("*_pred.jpg"))
    masks = list((tmp_path / "pred").glob("*_mask_p3.png"))
    npzs = list((tmp_path / "pred").glob("*_masks.npz"))
    assert len(preds) == 4 and len(masks) == 4 and len(npzs) == 4


def test_val_cli_plots_json(trained_run, tmp_path):
    data_yaml, run_dir = trained_run
    out = tmp_path / "valout"
    proc = subprocess.run(
        [
            sys.executable, "-m", "mga_yolo_tpu.cli.val",
            "--weights", str(run_dir / "weights" / "best"),
            "--data", str(data_yaml), "--batch", "2",
            "--plots", "--save-json", "--out", str(out),
        ],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    # per-class table + metrics json on stdout
    assert "Class" in proc.stdout and "mAP50" in proc.stdout
    assert "metrics/mAP50(B)" in proc.stdout
    # artifacts (reference detect/val.py:199-223,365)
    assert (out / "confusion_matrix.png").exists()
    assert (out / "confusion_matrix_normalized.png").exists()
    assert (out / "PR_curve.png").exists()
    assert (out / "F1_curve.png").exists()
    preds = json.loads((out / "predictions.json").read_text())
    assert isinstance(preds, list)
    if preds:  # entries follow the COCO result schema
        assert {"image_id", "category_id", "bbox", "score"} <= set(preds[0])


def test_tflite_export_and_val_cli(trained_run, tmp_path):
    """Deployment-artifact validation: export .tflite, then run mga-val on
    the flatbuffer itself (interpreter inference + shared NMS/metrics)."""
    data_yaml, run_dir = trained_run
    tfl = tmp_path / "best.tflite"
    proc = subprocess.run(
        [sys.executable, "-m", "mga_yolo_tpu.cli.ckpt", "export-tflite",
         str(run_dir / "weights" / "best"), "--imgsz", "64", "--out", str(tfl)],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert tfl.exists() and "verified vs jax forward" in proc.stdout

    proc = subprocess.run(
        [sys.executable, "-m", "mga_yolo_tpu.cli.val", "--weights", str(tfl),
         "--data", str(data_yaml), "--batch", "2"],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    out = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert "metrics/mAP50(B)" in out

    # predict from the same flatbuffer (TFLitePredictor path)
    pred_dir = tmp_path / "pred_tfl"
    proc = subprocess.run(
        [sys.executable, "-m", "mga_yolo_tpu.cli.predict", "--weights", str(tfl),
         "--source", str(data_yaml.parent / "images" / "train"),
         "--out", str(pred_dir)],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert list(pred_dir.glob("*_pred.jpg")) and list(pred_dir.glob("*_mask_p3.png"))
