"""Baseline (no-MGA) training path + prob-mask mode + gater behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.train import state as S
from tests.synth import create_synthetic_dataset


def test_baseline_graph_no_seg():
    """Plain yolov8.yaml: 23 layers, no mask heads, detection-only loss path."""
    model, spec = create_model("configs/models/yolov8.yaml", scale="n", nc=1)
    assert spec.mask_head_indices == ()
    assert spec.attention_indices == ()
    assert spec.detect_index == 22

    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    cfg = load_config({"enabled": False})
    step = S.jit_train_step(
        S.make_train_step(
            model, (8, 16, 32), 1, det_loss_config(cfg), seg_loss_config(cfg),
            weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
        ),
        S.data_mesh(jax.devices()[:2]),
    )
    batch = {
        "image": np.zeros((2, 64, 64, 3), np.uint8),
        "gt_boxes": np.tile(np.array([[8, 8, 40, 40]], np.float32), (2, 4, 1)),
        "gt_labels": np.zeros((2, 4), np.int32),
        "mask_gt": np.ones((2, 4), np.float32),
        "masks": [np.zeros((2, 64 // s, 64 // s, 1), np.float32) for s in (8, 16, 32)],
    }
    st2, metrics = step(st, batch, 0.01, 0.01, 0.9, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    items = np.asarray(metrics["items"])
    assert (items[3:] == 0).all()  # all seg items zero


def test_prob_mode_dataset(tmp_path):
    data_yaml = create_synthetic_dataset(tmp_path, n=2, size=64)
    cfg = load_config(
        {"data": str(data_yaml), "imgsz": 64, "max_boxes": 4, "MGA_PROB_MODE": True,
         "MGA_MASK_PROB_METHOD": "avgpool"}
    )
    assert cfg.mask.prob_mode
    from mga_yolo_tpu.data.dataset import MGADataset

    ds = MGADataset(cfg, "train", augment=False)
    s = ds.get(0)
    m = s["masks"][0][..., 0]
    assert m.dtype == np.float32
    assert 0.0 <= m.min() and m.max() <= 1.0
    # probabilistic masks have fractional block coverage at boundaries
    frac = m[(m > 0) & (m < 1)]
    assert frac.size > 0


def test_prob_gater_modes():
    from mga_yolo_tpu.models.attention import ProbMaskGater

    p = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
    for mode in ("deterministic", "gumbel", "hard_st", "bernoulli_detach"):
        g = ProbMaskGater(mode=mode)
        v = g.init({"params": jax.random.PRNGKey(0), "gater": jax.random.PRNGKey(1)}, p, True)
        out = g.apply(v, p, True, rngs={"gater": jax.random.PRNGKey(2)})
        assert out.shape == p.shape
        assert np.isfinite(np.asarray(out)).all()
        # eval mode always deterministic
        out_eval = g.apply(v, p, False)
        np.testing.assert_allclose(np.asarray(out_eval), np.asarray(p), atol=1e-6)
    # hard_st produces (near-)binary forward values
    g = ProbMaskGater(mode="hard_st")
    v = g.init({"params": jax.random.PRNGKey(0), "gater": jax.random.PRNGKey(1)}, p, True)
    out = np.asarray(g.apply(v, p, True, rngs={"gater": jax.random.PRNGKey(2)}))
    assert ((out < 0.05) | (out > 0.95)).mean() > 0.9


def test_prob_mode_model_uses_gater():
    """MGA_PROB_MODE wires a ProbMaskGater into the attention blocks."""
    from mga_yolo_tpu.models.attention import MaskCBAM

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32))
    m = MaskCBAM(channels=16, prob_mode=True, prob_approach="gumbel")
    v = m.init({"params": jax.random.PRNGKey(0), "gater": jax.random.PRNGKey(1)}, feat, mask, True)
    o1 = m.apply(v, feat, mask, True, rngs={"gater": jax.random.PRNGKey(2)})
    o2 = m.apply(v, feat, mask, True, rngs={"gater": jax.random.PRNGKey(3)})
    # stochastic gating -> different outputs for different gater rngs
    assert float(jnp.abs(o1 - o2).max()) > 0
