"""Baseline (no-MGA) toolchain e2e: base-train then base-val with FM capture.

Mirrors the reference baseline comparison path (`tools/cli/train.py:47-82`,
`tools/engine/validators/base_fm_validator.py:18-335`): plain yolov8 graph,
seg loss off, per-layer feature-map capture at the P3/P4/P5 neck outputs.
"""

import json
import os
import subprocess
import sys

import pytest

from tests._env import cpu_subprocess_env
from tests.synth import create_synthetic_dataset

pytestmark = pytest.mark.e2e

CPU_ENV = cpu_subprocess_env()


@pytest.fixture(scope="module")
def base_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    data_yaml = create_synthetic_dataset(root, n=2, size=64)
    out = tmp_path_factory.mktemp("runs")
    cmd = [
        sys.executable, "-m", "tools.cli.train",
        "--data", str(data_yaml), "--imgsz", "32", "--max_boxes", "4",
        "--batch", "2", "--nbs", "2", "--epochs", "1", "--mosaic", "0.0",
        "--workers", "1", "--project", str(out), "--name", "base1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900, env=CPU_ENV)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return data_yaml, out / "base1"


def test_base_val_fm_capture(base_run, tmp_path):
    data_yaml, run_dir = base_run
    out = tmp_path / "bv"
    proc = subprocess.run(
        [
            sys.executable, "-m", "tools.cli.val",
            "--weights", str(run_dir / "weights" / "best"),
            "--data", str(data_yaml), "--batch", "2",
            "--save-fm", "--save-layers", "15,18,21", "--out", str(out),
        ],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert "metrics/mAP50(B)" in metrics
    # captured taps at the base graph's P3/P4/P5 (BASE_FM_LAYERS default)
    for layer in (15, 18, 21):
        assert (out / "fm" / f"batch0_layer{layer}.npy").exists()
        assert (out / "fm" / f"batch0_layer{layer}.png").exists()
    assert list((out / "preds").glob("*_dets.jpg"))
