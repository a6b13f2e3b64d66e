"""Spatial partitioning (DP x SP mesh): one train step on a 2x2 mesh with
image rows sharded over 'space' must match the pure-DP result — XLA GSPMD
inserts the conv halo exchanges, so numerics are identical up to reduction
order. Runs on the 8 virtual CPU devices from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.train import state as S


def _batch(batch, imgsz, m=4):
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (batch, imgsz, imgsz, 3)).astype(np.uint8),
        "gt_boxes": np.tile(np.array([[8.0, 8.0, 40.0, 40.0]], np.float32), (batch, m, 1)),
        "gt_labels": np.zeros((batch, m), np.int32),
        "mask_gt": np.concatenate(
            [np.ones((batch, 1), np.float32), np.zeros((batch, m - 1), np.float32)], axis=1
        ),
        "masks": [np.ones((batch, imgsz // s, imgsz // s, 1), np.float32) for s in (8, 16, 32)],
    }


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_spatial_mesh_matches_dp():
    imgsz, batch = 64, 4
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    cfg = load_config({})

    losses = {}
    for name, mesh in {
        "dp": S.data_mesh(jax.devices()[:4]),
        "dpsp": S.data_mesh(jax.devices()[:4], spatial=2),
    }.items():
        st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=imgsz)
        step_fn = S.jit_train_step(
            S.make_train_step(
                model, (8, 16, 32), spec.nc, det_loss_config(cfg), seg_loss_config(cfg),
                weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
            ),
            mesh,
        )
        data = S.host_local_to_global(_batch(batch, imgsz), mesh)
        new_state, metrics = step_fn(st, data, 0.01, 0.01, 0.9, jax.random.PRNGKey(1))
        losses[name] = float(metrics["loss"])
        # image must actually be sharded over both axes on the 2-D mesh
        if name == "dpsp":
            sh = data["image"].sharding
            assert set(sh.spec) >= {"data", "space"}, sh.spec

    assert np.isfinite(losses["dp"]) and np.isfinite(losses["dpsp"])
    np.testing.assert_allclose(losses["dp"], losses["dpsp"], rtol=2e-4)


def test_data_mesh_validation():
    with pytest.raises(ValueError):
        S.data_mesh(jax.devices()[:3], spatial=2)
