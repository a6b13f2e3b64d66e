"""Bisect the detection-loss cost on TPU: assigner alone, top_k alone,
CIoU pairwise alone, full det loss, seg loss. K-chain timing.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_loss_parts.py
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

B = int(os.environ.get("MGA_BENCH_BATCH", "64"))
M, NC, REG = 8, 1, 16
IMGSZ = 640
K1, K2, REPS = 1, 9, 5


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)

    def chain(n):
        s = jnp.asarray(0.0, jnp.float32)
        r = None
        for _ in range(n):
            r = fn(*args, salt=s)
            s = s + jax.tree_util.tree_leaves(r)[0].ravel()[0] * 1e-20
        return float(s)

    chain(1)
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)


def main() -> None:
    from mga_yolo_tpu.losses.detection import (
        DetLossConfig, task_aligned_assigner, v8_detection_loss,
    )
    from mga_yolo_tpu.losses.segmentation import SegLossConfig, segmentation_loss
    from mga_yolo_tpu.ops.boxes import bbox_iou_ciou, make_anchors

    rng = np.random.default_rng(0)
    shapes = [(IMGSZ // s, IMGSZ // s) for s in (8, 16, 32)]
    A = sum(h * w for h, w in shapes)
    anc, stride_t = make_anchors(shapes, (8, 16, 32), 0.5, dtype=jnp.float32)

    pd_scores = jnp.asarray(rng.random((B, A, NC)), jnp.float32)
    pd_boxes = jnp.asarray(rng.random((B, A, 4)) * IMGSZ, jnp.float32)
    gt_boxes = jnp.asarray(
        np.tile(np.array([[60.0, 60.0, 300.0, 300.0]], np.float32), (B, M, 1))
    )
    gt_labels = jnp.zeros((B, M), jnp.int32)
    mask_gt = jnp.asarray(
        np.concatenate([np.ones((B, 1), np.float32), np.zeros((B, M - 1), np.float32)], 1)
    )
    det_maps = [
        jnp.asarray(rng.random((B, h, w, 4 * REG + NC)), jnp.float32) for h, w in shapes
    ]
    seg_logits = {f"p{i+3}": jnp.asarray(rng.random((B, h, w, 1)), jnp.float32)
                  for i, (h, w) in enumerate(shapes)}
    seg_masks = [jnp.ones((B, h, w, 1), jnp.float32) for h, w in shapes]

    @jax.jit
    def f_topk(metric, salt=0.0):
        v, i = jax.lax.top_k(metric + salt, 10)
        return v.sum() + i.sum()

    metric = jnp.asarray(rng.random((B, M, A)), jnp.float32)

    @jax.jit
    def f_assigner(pd_scores, pd_boxes, gt_boxes, gt_labels, mask_gt, salt=0.0):
        tb, ts, fg = task_aligned_assigner(
            pd_scores + salt, pd_boxes.transpose(2, 0, 1),  # planar (4,B,A)
            anc * stride_t, gt_labels, gt_boxes, mask_gt, NC
        )
        return tb.sum() + ts.sum() + fg.sum()

    @jax.jit
    def f_ciou(gt_boxes, pd_boxes, salt=0.0):
        return jnp.clip(
            bbox_iou_ciou(gt_boxes[:, :, None, :] + salt, pd_boxes[:, None, :, :]), 0, None
        ).sum()

    @jax.jit
    def f_det(det_maps, gt_labels, gt_boxes, mask_gt, salt=0.0):
        maps = [m + salt for m in det_maps]
        total, _ = v8_detection_loss(maps, (8, 16, 32), gt_labels, gt_boxes, mask_gt, NC)
        return total

    scfg = SegLossConfig()

    @jax.jit
    def f_seg(seg_logits, seg_masks, salt=0.0):
        logits = {k: v + salt for k, v in seg_logits.items()}
        total, _ = segmentation_loss(logits, seg_masks, scfg)
        return total

    from mga_yolo_tpu.losses.detection import dfl_loss, flatten_det_maps
    from mga_yolo_tpu.ops.boxes import bbox2dist, dist2bbox

    @jax.jit
    def f_decode(det_maps, salt=0.0):
        pred_distri, pred_scores = flatten_det_maps([m + salt for m in det_maps], REG, NC)
        pd = pred_distri.reshape(B, A, 4, REG)
        proj = jnp.arange(REG, dtype=jnp.float32)
        ltrb = (jax.nn.softmax(pd, axis=-1) * proj).sum(-1)
        return dist2bbox(ltrb, anc[None], xywh=False).sum()

    tgt_ltrb = jnp.asarray(rng.random((B, A, 4)) * (REG - 1), jnp.float32)
    pd_logits = jnp.asarray(rng.random((B, A, 4, REG)), jnp.float32)

    @jax.jit
    def f_dfl(pd_logits, tgt_ltrb, salt=0.0):
        return dfl_loss(pd_logits + salt, tgt_ltrb, REG).sum()

    @jax.jit
    def f_dfl_onehot(pd_logits, tgt_ltrb, salt=0.0):
        target = jnp.clip(tgt_ltrb + salt, 0, REG - 1 - 0.01)
        tl = target.astype(jnp.int32)
        tr = jnp.minimum(tl + 1, REG - 1)
        wl = (tl + 1).astype(target.dtype) - target
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(pd_logits, axis=-1)
        ce_l = -(logp * jax.nn.one_hot(tl, REG, dtype=logp.dtype)).sum(-1)
        ce_r = -(logp * jax.nn.one_hot(tr, REG, dtype=logp.dtype)).sum(-1)
        return ((ce_l * wl + ce_r * wr).mean(-1)).sum()

    @jax.jit
    def f_bbox2dist(gt_boxes_bc, salt=0.0):
        return bbox2dist(anc[None], gt_boxes_bc + salt, REG - 1).sum()

    tb_feat = jnp.asarray(rng.random((B, A, 4)) * 80, jnp.float32)

    out = {"batch": B, "A": A}
    out["decode_ms"] = round(timeit(f_decode, det_maps) * 1e3, 2)
    out["dfl_ms"] = round(timeit(f_dfl, pd_logits, tgt_ltrb) * 1e3, 2)
    out["dfl_onehot_ms"] = round(timeit(f_dfl_onehot, pd_logits, tgt_ltrb) * 1e3, 2)
    out["bbox2dist_ms"] = round(timeit(f_bbox2dist, tb_feat) * 1e3, 2)
    out["topk_ms"] = round(timeit(f_topk, metric) * 1e3, 2)
    out["ciou_pairwise_ms"] = round(timeit(f_ciou, gt_boxes, pd_boxes) * 1e3, 2)
    out["assigner_ms"] = round(
        timeit(f_assigner, pd_scores, pd_boxes, gt_boxes, gt_labels, mask_gt) * 1e3, 2
    )
    out["det_loss_ms"] = round(
        timeit(f_det, det_maps, gt_labels, gt_boxes, mask_gt) * 1e3, 2
    )
    try:
        out["seg_loss_ms"] = round(timeit(f_seg, seg_logits, seg_masks) * 1e3, 2)
    except Exception as e:
        out["seg_loss_ms"] = f"failed: {type(e).__name__}"

    # fwd+bwd variants: the r3 step decomposition shows the LOSS BACKWARD as
    # the biggest non-model chunk (~33 ms @ b128); grads flow wrt the inputs
    # the model produces (det maps / seg logits)
    @jax.jit
    def f_det_grad(det_maps, gt_labels, gt_boxes, mask_gt, salt=0.0):
        def inner(maps):
            total, _ = v8_detection_loss(
                [m + salt for m in maps], (8, 16, 32), gt_labels, gt_boxes, mask_gt, NC
            )
            return total
        g = jax.grad(inner)(det_maps)
        return sum(jnp.sum(x) for x in g)

    @jax.jit
    def f_seg_grad(seg_logits, seg_masks, salt=0.0):
        def inner(logits):
            total, _ = segmentation_loss(
                {k: v + salt for k, v in logits.items()}, seg_masks, scfg
            )
            return total
        g = jax.grad(inner)(seg_logits)
        return sum(jnp.sum(x) for x in g.values())

    out["det_loss_fwdbwd_ms"] = round(
        timeit(f_det_grad, det_maps, gt_labels, gt_boxes, mask_gt) * 1e3, 2
    )
    try:
        out["seg_loss_fwdbwd_ms"] = round(timeit(f_seg_grad, seg_logits, seg_masks) * 1e3, 2)
    except Exception as e:
        out["seg_loss_fwdbwd_ms"] = f"failed: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
