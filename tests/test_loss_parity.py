"""Numeric parity of the jnp losses vs the torch reference on fixed inputs.

The reference implementation at /root/reference is imported read-only and used
purely as a test oracle (SURVEY.md §7 stage 2 exit criterion: loss parity on
fixed random inputs within tolerances).
"""

import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

torch = pytest.importorskip("torch")

from tests._reference_oracle import setup_reference_paths

setup_reference_paths()

from mga_yolo_tpu.losses.detection import (
    DetLossConfig,
    task_aligned_assigner,
    v8_detection_loss,
)
from mga_yolo_tpu.losses.segmentation import SegLossConfig, segmentation_loss
from mga_yolo_tpu.ops.boxes import bbox_iou_ciou


def _rand_boxes(rng, n, size=256.0):
    xy = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(8, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_ciou_parity(rng):
    from mga_yolo.external.ultralytics.ultralytics.utils.metrics import bbox_iou

    b1 = _rand_boxes(rng, 64)
    b2 = _rand_boxes(rng, 64)
    ours = np.asarray(bbox_iou_ciou(jnp.asarray(b1), jnp.asarray(b2)))
    theirs = (
        bbox_iou(torch.from_numpy(b1), torch.from_numpy(b2), xywh=False, CIoU=True)
        .squeeze(-1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_tal_assigner_parity(rng):
    from mga_yolo.external.ultralytics.ultralytics.utils.tal import TaskAlignedAssigner

    B, A, M, nc = 2, 84, 4, 3
    pd_scores = rng.uniform(0, 1, (B, A, nc)).astype(np.float32)
    pd_bboxes = np.stack([_rand_boxes(rng, A) for _ in range(B)])
    anc = rng.uniform(0, 256, (A, 2)).astype(np.float32)
    gt_bboxes = np.stack([_rand_boxes(rng, M) for _ in range(B)])
    gt_labels = rng.integers(0, nc, (B, M))
    mask_gt = np.ones((B, M), np.float32)
    mask_gt[0, -1] = 0  # one padded gt

    ours_tb_p, ours_ts, ours_fg = task_aligned_assigner(
        jnp.asarray(pd_scores),
        jnp.asarray(pd_bboxes).transpose(2, 0, 1),  # planar (4,B,A)
        jnp.asarray(anc),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_bboxes),
        jnp.asarray(mask_gt),
        nc,
        topk=10,
        alpha=0.5,
        beta=6.0,
    )

    assigner = TaskAlignedAssigner(topk=10, num_classes=nc, alpha=0.5, beta=6.0)
    _, t_tb, t_ts, t_fg, _ = assigner(
        torch.from_numpy(pd_scores),
        torch.from_numpy(pd_bboxes),
        torch.from_numpy(anc),
        torch.from_numpy(gt_labels[..., None]).long(),
        torch.from_numpy(gt_bboxes),
        torch.from_numpy(mask_gt[..., None]),
    )
    # Zero-metric candidates (CIoU clamped to 0) are tie-broken arbitrarily by
    # topk in both frameworks; they carry zero target-score weight so they
    # cannot affect the loss.  Compare where the weight is non-negligible.
    ours_ts_np = np.asarray(ours_ts)
    t_ts_np = t_ts.numpy()
    np.testing.assert_allclose(ours_ts_np, t_ts_np, rtol=1e-3, atol=1e-4)
    significant = t_ts_np.sum(-1) > 1e-6
    np.testing.assert_array_equal(
        (np.asarray(ours_fg) > 0)[significant], t_fg.numpy()[significant]
    )
    both_fg = significant & t_fg.numpy() & (np.asarray(ours_fg) > 0)
    np.testing.assert_allclose(
        np.asarray(ours_tb_p).transpose(1, 2, 0)[both_fg], t_tb.numpy()[both_fg],
        rtol=1e-4, atol=1e-4,
    )


def test_seg_loss_parity(rng):
    from mga_yolo.nn.losses.segmentation import SegLossConfig as TorchCfg
    from mga_yolo.nn.losses.segmentation import SegmentationLoss

    B, H, W = 2, 16, 16
    preds = {
        k: rng.normal(0, 2, (B, s, s, 1)).astype(np.float32)
        for k, s in (("p3", 16), ("p4", 8), ("p5", 4))
    }
    tgts = [
        (rng.uniform(0, 1, (B, s, s, 1)) > 0.7).astype(np.float32) for s in (16, 8, 4)
    ]

    ours_total, ours_logs = segmentation_loss(
        {k: jnp.asarray(v) for k, v in preds.items()},
        [jnp.asarray(t) for t in tgts],
        SegLossConfig(),
    )

    crit = SegmentationLoss(TorchCfg())
    t_total, t_logs = crit(
        {k: torch.from_numpy(np.transpose(v, (0, 3, 1, 2))) for k, v in preds.items()},
        [torch.from_numpy(np.transpose(t, (0, 3, 1, 2))) for t in tgts],
    )
    np.testing.assert_allclose(float(ours_total), float(t_total), rtol=1e-4)
    for k in ("p3_bce", "p3_dice", "p5_bce", "p5_dice", "seg_total"):
        np.testing.assert_allclose(float(ours_logs[k]), t_logs[k], rtol=1e-3, atol=1e-5)


def test_ufl_parity(rng):
    from mga_yolo.nn.losses.segmentation import SegLossConfig as TorchCfg
    from mga_yolo.nn.losses.segmentation import SegmentationLoss

    B = 2
    preds = {"p3": rng.normal(0, 2, (B, 8, 8, 1)).astype(np.float32)}
    tgts = [(rng.uniform(0, 1, (B, 8, 8, 1)) > 0.5).astype(np.float32)]

    ours_total, _ = segmentation_loss(
        {k: jnp.asarray(v) for k, v in preds.items()},
        [jnp.asarray(t) for t in tgts],
        SegLossConfig(use_unified_focal=True),
    )
    crit = SegmentationLoss(TorchCfg(use_unified_focal=True))
    t_total, _ = crit(
        {k: torch.from_numpy(np.transpose(v, (0, 3, 1, 2))) for k, v in preds.items()},
        [torch.from_numpy(np.transpose(t, (0, 3, 1, 2))) for t in tgts],
    )
    np.testing.assert_allclose(float(ours_total), float(t_total), rtol=1e-4)


def test_detection_loss_runs_and_grads(rng):
    """Smoke: full det loss is finite and differentiable w.r.t. the maps."""
    B, nc = 2, 2
    maps = [
        jnp.asarray(rng.normal(0, 1, (B, s, s, 64 + nc)).astype(np.float32))
        for s in (16, 8, 4)
    ]
    gt_bboxes = jnp.asarray(np.stack([_rand_boxes(rng, 3, 128.0) for _ in range(B)]))
    gt_labels = jnp.asarray(rng.integers(0, nc, (B, 3)))
    mask_gt = jnp.ones((B, 3))

    def f(m0):
        total, _ = v8_detection_loss(
            [m0, maps[1], maps[2]], (8, 16, 32), gt_labels, gt_bboxes, mask_gt, nc
        )
        return total

    val, grad = jax.value_and_grad(f)(maps[0])
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.abs(grad).sum()) > 0


def test_tal_degenerate_zero_metric_invariant(rng):
    """Pin the zero-alignment invariant (VERDICT r1 weak #7): when every
    candidate's alignment metric is exactly 0 (zero class scores), fg anchors
    may be tie-broken arbitrarily by topk in either framework, but the
    loss-facing outputs — target_scores and its normalizer — must be exactly
    zero in both, so the loss cannot differ."""
    from mga_yolo.external.ultralytics.ultralytics.utils.tal import TaskAlignedAssigner
    import torch

    B, A, M, nc = 2, 84, 4, 1
    anc = np.stack(np.meshgrid(np.arange(12), np.arange(7)), -1).reshape(-1, 2).astype(np.float32) * 8 + 4
    pd_scores = np.zeros((B, A, nc), np.float32)          # degenerate: all-zero scores
    pd_bboxes = np.tile(_rand_boxes(rng, A, 96)[None], (B, 1, 1))
    gt_bboxes = np.tile(_rand_boxes(rng, M, 96)[None], (B, 1, 1))
    gt_labels = np.zeros((B, M), np.float32)
    mask_gt = np.ones((B, M), np.float32)

    _, ours_ts, ours_fg = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_bboxes).transpose(2, 0, 1), jnp.asarray(anc),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
        nc, topk=10, alpha=0.5, beta=6.0,
    )
    assigner = TaskAlignedAssigner(topk=10, num_classes=nc, alpha=0.5, beta=6.0)
    _, _, t_ts, t_fg, _ = assigner(
        torch.from_numpy(pd_scores), torch.from_numpy(pd_bboxes), torch.from_numpy(anc),
        torch.from_numpy(gt_labels[..., None]).long(), torch.from_numpy(gt_bboxes),
        torch.from_numpy(mask_gt[..., None]),
    )
    assert float(np.abs(np.asarray(ours_ts)).max()) == 0.0
    assert float(t_ts.abs().max()) == 0.0
    # normalizer max(sum, 1) identical -> identical cls loss scaling
    assert max(float(np.asarray(ours_ts).sum()), 1.0) == max(float(t_ts.sum()), 1.0) == 1.0


def test_tal_threshold_topk_tie_and_boundary(rng):
    """Pin the threshold-top-k semantics (VERDICT r2 next #8): selection is
    `metric >= kth largest AND metric > 0`, so

      * with > topk positive candidates and distinct metrics, exactly topk
        anchors are selected per gt (identical to the reference's index
        top-k);
      * exact ties AT the kth value select all tied anchors (k+t) — the one
        documented divergence from the reference (which keeps the lowest
        indices); their target boxes are identical so the box/dfl losses see
        the same per-anchor targets;
      * with fewer than topk positive candidates, exactly the positive ones
        are selected — never zero-metric fillers.
    """
    B, nc, k = 1, 1, 10
    # one gt covering the whole image: every anchor is a candidate
    gt_bboxes = np.asarray([[[0.0, 0.0, 96.0, 96.0]]], np.float32)
    gt_labels = np.zeros((B, 1), np.float32)
    mask_gt = np.ones((B, 1), np.float32)
    anc = (
        np.stack(np.meshgrid(np.arange(12), np.arange(7)), -1).reshape(-1, 2).astype(np.float32)
        * 8 + 4
    )
    A = anc.shape[0]

    def run(pd_scores, pd_bboxes):
        _, ts, fg = task_aligned_assigner(
            jnp.asarray(pd_scores), jnp.asarray(pd_bboxes).transpose(2, 0, 1), jnp.asarray(anc),
            jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
            nc, topk=k, alpha=0.5, beta=6.0,
        )
        return np.asarray(ts), np.asarray(fg)

    # all anchors predict the same (perfect) box -> metric driven by score only
    perfect = np.tile(gt_bboxes[0], (A, 1))[None]

    # distinct scores -> exactly k selected
    scores = np.linspace(0.1, 0.9, A).astype(np.float32)[None, :, None]
    # sigmoid never yields these exact values; pass as already-sigmoided scores
    logits = np.log(scores / (1 - scores))
    _, fg = run(1 / (1 + np.exp(-logits)), perfect)
    assert int(fg.sum()) == k

    # 3-way tie at the kth value: k-1 clearly above, 3 tied at the boundary
    tied = np.full(A, 0.2, np.float32)
    tied[:9] = 0.9            # top 9 distinct
    tied[9:12] = 0.5          # 3-way tie for the single remaining slot
    _, fg = run(tied[None, :, None], perfect)
    assert int(fg.sum()) == k - 1 + 3 + (A - 12) * 0  # 9 + all 3 tied

    # fewer than k positive candidates: shrink the gt so only 2 anchors are
    # inside, with predictions matching the small box (positive CIoU)
    small_gt = np.asarray([[[0.0, 0.0, 17.0, 9.0]]], np.float32)  # centers (4,4),(12,4)
    small_pred = np.tile(small_gt[0], (A, 1))[None]
    _, ts, fgv = task_aligned_assigner(
        jnp.asarray(tied[None, :, None]), jnp.asarray(small_pred).transpose(2, 0, 1),
        jnp.asarray(anc),
        jnp.asarray(gt_labels), jnp.asarray(small_gt), jnp.asarray(mask_gt),
        nc, topk=k, alpha=0.5, beta=6.0,
    )
    assert int(np.asarray(fgv).sum()) == 2  # only the positive candidates, no fillers


def test_dfl_analytic_vjp_matches_autodiff(rng):
    """The custom-VJP decode/CE pair must equal plain-autodiff values AND
    gradients (the analytic forms replace four (B,A,4,R) HBM cotangent
    tensors in the loss backward — bench_loss_grad.py)."""
    import jax.numpy as jnp

    from mga_yolo_tpu.losses.detection import dfl_ce, dfl_decode, dfl_loss

    B, A, R = 2, 37, 16
    pd = jnp.asarray(rng.normal(size=(B, A, 4, R)) * 3, jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)
    # include exact-integer targets (wl=1, wr=0 path) and the clip boundary
    target = target.at[0, :5].set(jnp.floor(target[0, :5]))
    target = target.at[0, 5].set(R - 1.0)

    def ref_decode(z):
        proj = jnp.arange(R, dtype=z.dtype)
        return (jax.nn.softmax(z, axis=-1) * proj).sum(-1)

    # decode: value + grad through a nonlinear scalarization
    def s_new(z):
        return jnp.sin(dfl_decode(z)).sum()

    def s_ref(z):
        return jnp.sin(ref_decode(z)).sum()

    v_new, g_new = jax.value_and_grad(s_new)(pd)
    v_ref, g_ref = jax.value_and_grad(s_ref)(pd)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-5, atol=1e-6)

    # dfl CE: value identical to dfl_loss, grad identical to its autodiff
    w = jnp.asarray(rng.uniform(0, 1, (B, A)), jnp.float32)

    def c_new(z):
        return (dfl_ce(z, target) * w).sum()

    def c_ref(z):
        return (dfl_loss(z, target, R) * w).sum()

    v_new, g_new = jax.value_and_grad(c_new)(pd)
    v_ref, g_ref = jax.value_and_grad(c_ref)(pd)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_dfl_fused_decode_ce_matches_separate(rng):
    """dfl_decode_ce (single fused VJP, round 4) must equal the separate
    decode + CE pair in value AND gradient for a scalarization that pulls on
    both outputs simultaneously (as v8_detection_loss does: CIoU via ltrb,
    DFL via ce)."""
    import jax.numpy as jnp

    from mga_yolo_tpu.losses.detection import dfl_ce, dfl_decode, dfl_decode_ce

    B, A, R = 2, 53, 16
    pd = jnp.asarray(rng.normal(size=(B, A, 4, R)) * 3, jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)
    target = target.at[0, :5].set(jnp.floor(target[0, :5]))  # wl=1 path
    target = target.at[0, 5].set(R - 1.0)  # clip boundary
    w = jnp.asarray(rng.uniform(0, 1, (B, A)), jnp.float32)

    def fused(z):
        # planar io: target in as (4,B,A), ltrb out as (4,B,A); the sin-sum
        # scalarization is permutation-invariant so values still match
        ltrb_p, ce = dfl_decode_ce(z, target.transpose(2, 0, 1))
        return jnp.sin(ltrb_p).sum() + (ce * w).sum()

    def separate(z):
        return jnp.sin(dfl_decode(z)).sum() + (dfl_ce(z, target) * w).sum()

    v_f, g_f = jax.value_and_grad(fused)(pd)
    v_s, g_s = jax.value_and_grad(separate)(pd)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s), rtol=1e-5, atol=1e-6)


def test_det_loss_bf16_maps_match_f32(rng):
    """v8_detection_loss on bf16 det maps (the train-path storage dtype,
    round 4: the big DFL tensor streams bf16, math stays f32) must produce
    the IDENTICAL loss value as the same bf16-representable values passed as
    f32, and gradients equal up to bf16 rounding at the map boundary."""
    import jax.numpy as jnp

    from mga_yolo_tpu.losses.detection import DetLossConfig, v8_detection_loss

    B, nc, reg_max = 2, 3, 16
    shapes = [(8, 8), (4, 4), (2, 2)]
    maps16 = [
        jnp.asarray(rng.normal(size=(B, h, w, 4 * reg_max + nc)), jnp.bfloat16)
        for h, w in shapes
    ]
    maps32 = [m.astype(jnp.float32) for m in maps16]
    gt_boxes = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]], [[8.0, 8.0, 30.0, 50.0]]], jnp.float32)
    gt_labels = jnp.zeros((B, 1), jnp.float32)
    mask_gt = jnp.ones((B, 1), jnp.float32)

    def run(maps):
        total, comps = v8_detection_loss(
            maps, (8, 16, 32), gt_labels, gt_boxes, mask_gt, nc, DetLossConfig()
        )
        return total, comps

    def scalar(maps):
        return run(maps)[0]

    v16, g16 = jax.value_and_grad(scalar)(maps16)
    v32, g32 = jax.value_and_grad(scalar)(maps32)
    np.testing.assert_allclose(float(v16), float(v32), rtol=1e-6)
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), rtol=0.02, atol=2e-4
        )


def test_kth_largest_matches_sort(rng):
    """_kth_largest (exact block top-k, round 4) must equal the full-sort
    kth value bit-for-bit — including duplicated values (multiplicity
    preserved) and rows with fewer than k positives."""
    import jax.numpy as jnp

    from mga_yolo_tpu.losses.detection import _kth_largest

    k = 10
    for shape in [(3, 5, 400), (2, 8, 8400), (1, 1, 100)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        ref = jnp.sort(x, axis=-1)[..., -k][..., None]
        np.testing.assert_array_equal(np.asarray(_kth_largest(x, k)), np.asarray(ref))

    # heavy ties straddling block boundaries + a sparse row of zeros
    x = jnp.concatenate(
        [
            jnp.full((1, 1, 9), 0.9), jnp.full((1, 1, 3), 0.5),
            jnp.zeros((1, 1, 388)),
        ],
        axis=-1,
    )
    x = jnp.asarray(np.random.default_rng(0).permutation(np.asarray(x[0, 0])))[None, None]
    ref = jnp.sort(x, axis=-1)[..., -k][..., None]  # = 0.5 (multiplicity honored)
    np.testing.assert_array_equal(np.asarray(_kth_largest(x, k)), np.asarray(ref))
    assert float(ref[0, 0, 0]) == 0.5
