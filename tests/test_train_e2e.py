"""End-to-end trainer test on the synthetic dataset, mirroring
reference tests/test_mga_train.py: a short real training run through the full
trainer (loader, schedule, EMA, validation, CSV, checkpoints)."""

from pathlib import Path

import numpy as np
import pytest

from mga_yolo_tpu.config import load_config
from mga_yolo_tpu.train.trainer import MGATrainer
from tests.synth import create_synthetic_dataset


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    data_yaml = create_synthetic_dataset(root, n=8, size=96)
    out = tmp_path_factory.mktemp("runs")
    cfg = load_config(
        {
            "data": str(data_yaml),
            "imgsz": 64,
            "max_boxes": 8,
            "batch": 4,
            "epochs": 3,
            "lr0": 0.01,
            "warmup_epochs": 1.0,
            "mosaic": 0.0,
            "workers": 2,
            "project": str(out),
            "name": "t1",
        }
    )
    trainer = MGATrainer(cfg)
    result = trainer.train()
    return cfg, trainer, result


def test_artifacts_written(run):
    cfg, trainer, result = run
    d = cfg.save_dir
    assert (d / "results.csv").exists()
    assert (d / "profiling.yaml").exists()
    assert (d / "weights" / "last").exists()
    assert (d / "weights" / "last.meta.json").exists()

    import csv

    rows = list(csv.DictReader(open(d / "results.csv")))
    assert len(rows) == 3
    # reference schema columns present
    for col in (
        "train/det/total", "train/seg/p3_bce", "val/det/box",
        "mtl/sigma2_det", "mtl/w_seg", "alpha_P3",
    ):
        assert col in rows[0], col
    # losses are finite and decreasing-ish
    tot = [float(r["train/det/total"]) + float(r["train/seg/total"]) for r in rows]
    assert all(np.isfinite(tot))


def test_val_ran(run):
    _, _, result = run
    assert result.n_images == 8
    assert np.isfinite(result.loss_items).all()
    assert 0.0 <= result.metrics.map50 <= 1.0


def test_checkpoint_roundtrip(run):
    cfg, trainer, _ = run
    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

    model, variables, meta = rebuild_from_checkpoint(cfg.save_dir / "weights" / "last")
    assert meta["nc"] == 1
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    decoded, _ = out["det"]
    assert decoded.shape[0] == 1
    # restored EMA params match the trainer's (EMA is stored flat in state)
    from mga_yolo_tpu.train.state import ema_variables

    ema_tree, _ = ema_variables(trainer.state)
    a = np.asarray(ema_tree["l0_Conv"]["conv"]["kernel"])
    b = np.asarray(variables["params"]["l0_Conv"]["conv"]["kernel"])
    np.testing.assert_allclose(a, b)


def test_resume(run, tmp_path):
    cfg, trainer, _ = run
    from mga_yolo_tpu.config import load_config as lc

    cfg2 = load_config(
        {
            "data": cfg.data.data,
            "imgsz": 64,
            "max_boxes": 8,
            "batch": 4,
            "epochs": 4,
            "mosaic": 0.0,
            "workers": 2,
            "project": cfg.train.project,
            "name": "t1",
            "resume": True,
        }
    )
    t2 = MGATrainer(cfg2)
    assert t2.start_epoch == 3
    assert int(t2.state.step) == int(trainer.state.step)
