"""Decompose the loss BACKWARD cost on TPU (VERDICT r3: loss fwd+bwd ~48 ms
at b128 vs model fwd+bwd 78 ms — where does the grad time go?).

Times jax.value_and_grad wrt det_maps of: full det loss, cls-only, box-only,
dfl-only, and the seg loss, with the K-chain difference method.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_loss_grad.py
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("MGA_BENCH_BATCH", "128"))
M, NC, REG = 8, 1, 16
IMGSZ = 640
K1, K2, REPS = 1, 9, 5


def timeit(fn, *args):
    def chain(n):
        s = jnp.asarray(0.0, jnp.float32)
        v = None
        for _ in range(n):
            v, grads = fn(*args, salt=s)
            s = s + v * 1e-20
        return float(s)

    chain(1)  # compile
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)


def main() -> None:
    from mga_yolo_tpu.losses.detection import (
        DetLossConfig, dfl_loss, flatten_det_maps, optax_sigmoid_bce,
        task_aligned_assigner, v8_detection_loss,
    )
    from mga_yolo_tpu.losses.segmentation import SegLossConfig, segmentation_loss
    from mga_yolo_tpu.ops.boxes import bbox2dist, bbox_iou_ciou, dist2bbox, make_anchors

    rng = np.random.default_rng(0)
    shapes = [(IMGSZ // s, IMGSZ // s) for s in (8, 16, 32)]
    A = sum(h * w for h, w in shapes)
    anc, stride_t = make_anchors(shapes, (8, 16, 32), 0.5, dtype=jnp.float32)
    cfg = DetLossConfig()

    det_maps = [
        jnp.asarray(rng.random((B, h, w, 4 * REG + NC)), jnp.float32) for h, w in shapes
    ]
    gt_boxes = jnp.asarray(
        np.tile(np.array([[60.0, 60.0, 300.0, 300.0]], np.float32), (B, M, 1))
    )
    gt_labels = jnp.zeros((B, M), jnp.int32)
    mask_gt = jnp.asarray(
        np.concatenate([np.ones((B, 1), np.float32), np.zeros((B, M - 1), np.float32)], 1)
    )
    seg_logits = {f"p{i+3}": jnp.asarray(rng.random((B, h, w, 1)), jnp.float32)
                  for i, (h, w) in enumerate(shapes)}
    seg_masks = [jnp.ones((B, h, w, 1), jnp.float32) for h, w in shapes]

    def _targets(maps):
        """Shared (stop-grad) target assembly, mirroring v8_detection_loss."""
        pred_distri, pred_scores = flatten_det_maps(maps, REG, NC)
        pd = pred_distri.reshape(B, A, 4, REG)
        proj = jnp.arange(REG, dtype=jnp.float32)
        ltrb = (jax.nn.softmax(pd, axis=-1) * proj).sum(-1)
        pred_bboxes = dist2bbox(ltrb, anc[None], xywh=False)
        tb_p, ts, fg = jax.lax.stop_gradient(
            task_aligned_assigner(
                jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores)),
                (jax.lax.stop_gradient(pred_bboxes) * stride_t).transpose(2, 0, 1),
                anc * stride_t, gt_labels, gt_boxes, mask_gt, NC,
            )
        )
        # this decomposition bench keeps the legacy (B,A,4) view downstream
        return pred_distri, pred_scores, pd, pred_bboxes, tb_p.transpose(1, 2, 0), ts, fg

    def full(maps, salt=0.0):
        maps = [m + salt for m in maps]
        total, _ = v8_detection_loss(maps, (8, 16, 32), gt_labels, gt_boxes, mask_gt, NC)
        return total

    def cls_only(maps, salt=0.0):
        maps = [m + salt for m in maps]
        _, pred_scores, _, _, tb, ts, fg = _targets(maps)
        tss = jnp.maximum(ts.sum(), 1.0)
        return optax_sigmoid_bce(pred_scores, ts).sum() / tss

    def box_only(maps, salt=0.0):
        maps = [m + salt for m in maps]
        _, _, pd, pred_bboxes, tb, ts, fg = _targets(maps)
        tss = jnp.maximum(ts.sum(), 1.0)
        tb_feat = tb / stride_t
        weight = ts.sum(-1) * fg
        iou = bbox_iou_ciou(pred_bboxes, tb_feat)
        return (((1.0 - iou) * weight)).sum() / tss

    def dfl_only(maps, salt=0.0):
        maps = [m + salt for m in maps]
        _, _, pd, _, tb, ts, fg = _targets(maps)
        tss = jnp.maximum(ts.sum(), 1.0)
        tb_feat = tb / stride_t
        weight = ts.sum(-1) * fg
        tl = bbox2dist(anc[None], tb_feat, REG - 1)
        return (dfl_loss(pd, tl, REG) * weight).sum() / tss

    def targets_only(maps, salt=0.0):
        maps = [m + salt for m in maps]
        _, _, _, _, tb, ts, fg = _targets(maps)
        return tb.sum() + ts.sum() + fg.sum()

    scfg = SegLossConfig()

    def seg(logits, salt=0.0):
        logits = {k: v + salt for k, v in logits.items()}
        total, _ = segmentation_loss(logits, seg_masks, scfg)
        return total, {}

    results = {}
    for name, f, args in [
        ("det_full_grad", full, (det_maps,)),
        ("det_targets_only_grad", targets_only, (det_maps,)),
        ("det_cls_grad", cls_only, (det_maps,)),
        ("det_box_grad", box_only, (det_maps,)),
        ("det_dfl_grad", dfl_only, (det_maps,)),
    ]:
        g = jax.jit(jax.value_and_grad(f))
        results[name] = round(timeit(g, *args) * 1e3, 2)
        print(f"{name}: {results[name]} ms", flush=True)

    gseg = jax.jit(jax.value_and_grad(lambda l, salt=0.0: seg(l, salt)[0]))

    def gseg_wrap(logits, salt=0.0):
        return gseg(logits, salt)

    results["seg_grad"] = round(timeit(gseg_wrap, seg_logits) * 1e3, 2)
    print(f"seg_grad: {results['seg_grad']} ms", flush=True)

    print(json.dumps({"batch": B, "imgsz": IMGSZ, **results}))


if __name__ == "__main__":
    main()
