"""End-to-end train-step tests on the synthetic dataset (CPU mesh)."""

import jax
import numpy as np
import pytest

from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
from mga_yolo_tpu.data.dataset import MGADataset
from mga_yolo_tpu.data.loader import DataLoader
from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.train import state as S
from tests.synth import create_synthetic_dataset


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    data_yaml = create_synthetic_dataset(root, n=8, size=96)
    cfg = load_config(
        {"data": str(data_yaml), "imgsz": 64, "max_boxes": 8, "batch": 4, "mosaic": 0.0}
    )
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    return cfg, model, spec


def test_train_step_loss_decreases(setup):
    cfg, model, spec = setup
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    mesh = S.data_mesh(jax.devices()[:2])
    step_fn = S.jit_train_step(
        S.make_train_step(
            model,
            (8, 16, 32),
            spec.nc,
            det_loss_config(cfg),
            seg_loss_config(cfg),
            weight_decay=0.0005,
            ema_decay=0.9999,
            ema_tau=2000,
        ),
        mesh,
    )
    ds = MGADataset(cfg, "train", augment=True)
    dl = DataLoader(ds, batch_size=4, seed=0, workers=2)
    rng = jax.random.PRNGKey(1)

    losses = []
    for epoch in range(8):
        dl.set_epoch(epoch)
        for batch in dl:
            batch.pop("index")
            rng, sub = jax.random.split(rng)
            st, metrics = step_fn(st, batch, 0.02, 0.02, 0.9, sub)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    # EMA drifted from init but tracks params
    assert int(st.step) == len(losses)


def test_eval_step_outputs(setup):
    cfg, model, spec = setup
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    mesh = S.data_mesh(jax.devices()[:2])
    eval_fn = S.jit_eval_step(
        S.make_eval_step(model, (8, 16, 32), spec.nc, det_loss_config(cfg), seg_loss_config(cfg)),
        mesh,
    )
    ds = MGADataset(cfg, "val", augment=False)
    dl = DataLoader(ds, batch_size=4, shuffle=False, workers=2)
    batch = next(iter(dl))
    batch.pop("index")
    out = eval_fn(st, batch)
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert out["decoded"].shape == (4, A, 4 + spec.nc)
    assert out["items"].shape == (10,)
    assert np.isfinite(np.asarray(out["items"])).all()
