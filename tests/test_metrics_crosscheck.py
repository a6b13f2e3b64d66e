"""mAP hardening cross-checks (VERDICT r1 #9, ROADMAP item 4).

Two independent oracles for utils/metrics.py:

1. The reference's own ``ap_per_class`` (vendored ultralytics
   `utils/metrics.py:760`) on identical (tp, conf, cls) stats — must agree to
   float precision, since the mAP north star is parity *with the reference's
   evaluator*.
2. An independent re-implementation of the COCOeval bbox protocol
   (pycocotools is not in this image): per-image greedy score-ordered
   matching + 101-recall-point precision sampling. Ultralytics integrates the
   interpolated envelope with the trapezoid rule instead of averaging the
   101 samples, a known systematic ~0.5% protocol difference, so this check
   uses a 0.015 tolerance (pycocotools-vs-ultralytics deltas of this size are
   expected and documented upstream).
"""

import numpy as np
import pytest

from mga_yolo_tpu.utils.metrics import IOUV, MetricAccumulator, ap_per_class, box_iou

torch = pytest.importorskip("torch")
from tests._reference_oracle import setup_reference_paths

setup_reference_paths()


def _fixture(seed=0, n_img=8, n_cls=2):
    """Random images with GT boxes and noisy predictions."""
    rng = np.random.default_rng(seed)
    gts, preds = [], []
    for _ in range(n_img):
        m = rng.integers(1, 5)
        xy = rng.uniform(0, 400, (m, 2))
        wh = rng.uniform(30, 120, (m, 2))
        gt = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        gt_cls = rng.integers(0, n_cls, m).astype(np.float32)
        # jittered true positives + some false positives
        jitter = rng.normal(0, 6, gt.shape).astype(np.float32)
        tp_boxes = gt + jitter
        tp_conf = rng.uniform(0.5, 1.0, m).astype(np.float32)
        k = rng.integers(0, 3)
        fp_xy = rng.uniform(0, 400, (k, 2))
        fp_wh = rng.uniform(20, 80, (k, 2))
        fp_boxes = np.concatenate([fp_xy, fp_xy + fp_wh], 1).astype(np.float32)
        fp_conf = rng.uniform(0.05, 0.6, k).astype(np.float32)
        boxes = np.concatenate([tp_boxes, fp_boxes])
        conf = np.concatenate([tp_conf, fp_conf])
        cls = np.concatenate([gt_cls, rng.integers(0, n_cls, k).astype(np.float32)])
        gts.append((gt, gt_cls))
        preds.append((boxes, conf, cls))
    return gts, preds


def test_ap_per_class_matches_reference_exactly():
    from mga_yolo.external.ultralytics.ultralytics.utils import metrics as ref_metrics

    gts, preds = _fixture()
    acc = MetricAccumulator()
    for (gt, gt_cls), (boxes, conf, cls) in zip(gts, preds):
        acc.update(boxes, conf, cls, gt, gt_cls)
    ours = acc.compute()

    tp = np.concatenate(acc.tp)
    conf = np.concatenate(acc.conf)
    pred_cls = np.concatenate(acc.pred_cls)
    target_cls = np.concatenate(acc.target_cls)
    out = ref_metrics.ap_per_class(tp, conf, pred_cls, target_cls)
    _, _, p, r, _, ap = out[:6]
    np.testing.assert_allclose(ours.map50, ap[:, 0].mean(), atol=1e-9)
    np.testing.assert_allclose(ours.map, ap.mean(), atol=1e-9)
    np.testing.assert_allclose(ours.precision, p.mean(), atol=1e-9)
    np.testing.assert_allclose(ours.recall, r.mean(), atol=1e-9)


def _coco_eval_map(gts, preds, iou_thrs):
    """Independent COCOeval-protocol bbox evaluation (no pycocotools in the
    image): per image+class, score-ordered greedy matching to the best
    still-unmatched GT with IoU >= thr; AP = mean of interpolated precision
    sampled at 101 recall thresholds (COCOeval.accumulate)."""
    n_cls = int(max(int(g[1].max()) for g in gts) + 1)
    aps = np.zeros((len(iou_thrs), n_cls))
    valid_cls = np.zeros(n_cls, bool)
    for c in range(n_cls):
        scores_all, matched_all = [], []
        npig = 0
        for (gt, gt_cls), (boxes, conf, cls) in zip(gts, preds):
            g_sel = gt_cls == c
            d_sel = cls == c
            g, d, s = gt[g_sel], boxes[d_sel], conf[d_sel]
            npig += len(g)
            order = np.argsort(-s)
            d, s = d[order], s[order]
            iou = box_iou(d, g)  # (nd, ng)
            matched = np.zeros((len(iou_thrs), len(d)), bool)
            for ti, thr in enumerate(iou_thrs):
                taken = np.zeros(len(g), bool)
                for di in range(len(d)):
                    best, best_iou = -1, thr
                    for gi in range(len(g)):
                        if taken[gi]:
                            continue
                        if iou[di, gi] >= best_iou:
                            best, best_iou = gi, iou[di, gi]
                    if best >= 0:
                        taken[best] = True
                        matched[ti, di] = True
            scores_all.append(s)
            matched_all.append(matched)
        if npig == 0:
            continue
        valid_cls[c] = True
        scores = np.concatenate(scores_all)
        matched = np.concatenate(matched_all, axis=1)
        order = np.argsort(-scores)
        matched = matched[:, order]
        for ti in range(len(iou_thrs)):
            tp = matched[ti].cumsum()
            fp = (~matched[ti]).cumsum()
            rc = tp / npig
            pr = tp / np.maximum(tp + fp, 1e-9)
            # precision envelope then sample at 101 recall points
            for i in range(len(pr) - 1, 0, -1):
                pr[i - 1] = max(pr[i - 1], pr[i])
            rec_thrs = np.linspace(0, 1, 101)
            inds = np.searchsorted(rc, rec_thrs, side="left")
            q = np.array([pr[i] if i < len(pr) else 0.0 for i in inds])
            aps[ti, c] = q.mean()
    return aps[:, valid_cls]


def test_map_matches_coco_protocol_within_tolerance():
    gts, preds = _fixture(seed=3, n_img=12)
    acc = MetricAccumulator()
    for (gt, gt_cls), (boxes, conf, cls) in zip(gts, preds):
        acc.update(boxes, conf, cls, gt, gt_cls)
    ours = acc.compute()
    aps = _coco_eval_map(gts, preds, IOUV)
    coco_map50 = aps[0].mean()
    coco_map = aps.mean()
    assert abs(ours.map50 - coco_map50) <= 0.015, (ours.map50, coco_map50)
    # at high IoU thresholds the two matching policies (ultralytics: global
    # IoU-sorted greedy across the dataset; COCO: per-image score-ordered
    # greedy) legitimately diverge more — measured ~2.6% on this fixture,
    # consistent with published ultralytics-vs-pycocotools deltas
    assert abs(ours.map - coco_map) <= 0.035, (ours.map, coco_map)
