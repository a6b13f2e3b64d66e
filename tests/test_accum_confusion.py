"""Gradient accumulation + confusion matrix tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.train import state as S
from mga_yolo_tpu.utils.metrics import ConfusionMatrix


def _batch(b=2, s=64, m=4):
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8),
        "gt_boxes": np.tile(np.array([[8, 8, 40, 40]], np.float32), (b, m, 1)),
        "gt_labels": np.zeros((b, m), np.int32),
        "mask_gt": np.ones((b, m), np.float32),
        "masks": [np.ones((b, s // st, s // st, 1), np.float32) for st in (8, 16, 32)],
    }


def test_grad_accumulation_applies_every_k():
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    from mga_yolo_tpu.train import optim

    st = st.replace(accum_grads=jnp.zeros((optim.FlatMeta(st.params).total,), jnp.float32))
    cfg = load_config({})
    k = 3
    step = S.jit_train_step(
        S.make_train_step(
            model, (8, 16, 32), 1, det_loss_config(cfg), seg_loss_config(cfg),
            weight_decay=0.0, ema_decay=0.9999, ema_tau=2000, accumulate=k,
        ),
        S.data_mesh(jax.devices()[:1]),
    )
    batch = _batch()
    p0 = np.asarray(st.params["l0_Conv"]["conv"]["kernel"]).copy()
    rng = jax.random.PRNGKey(0)
    for i in range(1, k + 1):
        rng, sub = jax.random.split(rng)
        st, _ = step(st, batch, 0.01, 0.01, 0.9, sub)
        p = np.asarray(st.params["l0_Conv"]["conv"]["kernel"])
        if i < k:
            np.testing.assert_array_equal(p, p0)  # no update before boundary
        else:
            assert np.abs(p - p0).max() > 0  # update applied at k-th step
    # accumulator reset after apply (flat buffer)
    acc = np.asarray(st.accum_grads)
    np.testing.assert_array_equal(acc, 0)


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(nc=2, conf=0.25, iou_thres=0.45)
    gt = np.array([[10, 10, 50, 50], [80, 80, 120, 120]], np.float32)
    gt_cls = np.array([0, 1])
    # one correct cls-0, one misclassified (gt 1 predicted as 0), one FP
    pred = np.array([[10, 10, 50, 50], [80, 80, 120, 120], [200, 200, 240, 240]], np.float32)
    pred_conf = np.array([0.9, 0.9, 0.9])
    pred_cls = np.array([0.0, 0.0, 1.0])
    cm.process_batch(pred, pred_conf, pred_cls, gt, gt_cls)
    assert cm.matrix[0, 0] == 1          # TP class 0
    assert cm.matrix[0, 1] == 1          # gt 1 predicted as 0
    assert cm.matrix[1, 2] == 1          # FP (background) for class-1 pred
    assert cm.matrix.sum() == 3

    # all-miss image: FNs land in the background row
    cm2 = ConfusionMatrix(nc=2)
    cm2.process_batch(
        np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0), gt, gt_cls
    )
    assert cm2.matrix[2, 0] == 1 and cm2.matrix[2, 1] == 1


def test_grad_clipping():
    from mga_yolo_tpu.train.optim import clip_by_global_norm

    g = {"a": jnp.full((10,), 100.0), "b": jnp.full((5,), -100.0)}
    clipped = clip_by_global_norm(g, 10.0)
    total = float(
        jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(clipped)))
    )
    assert abs(total - 10.0) < 1e-3
    # small grads untouched
    g2 = {"a": jnp.ones((4,)) * 0.1}
    out = clip_by_global_norm(g2, 10.0)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, rtol=1e-6)
