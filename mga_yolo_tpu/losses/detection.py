"""YOLOv8 detection loss — task-aligned assignment + CIoU + DFL + BCE.

Static-shape jnp re-formulation of the reference criterion
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/utils/loss.py:194-298`
``v8DetectionLoss``) and assigner (`utils/tal.py:14-331`
``TaskAlignedAssigner``, topk=10, alpha=0.5, beta=6.0).

The reference relies on boolean-mask indexing and per-image variable box
counts; here every image carries a fixed-size padded GT tensor
(``gt_bboxes (B, M, 4)`` + ``mask_gt (B, M)``) and all data-dependent
selection becomes masking / one-hot matmuls — the whole loss traces once
under ``jit`` and runs on the MXU/VPU with no host synchronization.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mga_yolo_tpu import perf
from mga_yolo_tpu.ops.boxes import (
    bbox2dist_p,
    bbox_iou_ciou_p,
    dist2bbox_p,
    make_anchors,
)


@dataclasses.dataclass(frozen=True)
class DetLossConfig:
    box: float = 7.5   # gains — reference cfg/default.yaml
    cls: float = 0.5
    dfl: float = 1.5
    reg_max: int = 16
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    eps: float = 1e-9


def select_candidates_in_gts(xy_centers: jax.Array, gt_bboxes: jax.Array, eps: float = 1e-9) -> jax.Array:
    """(A,2) centers x (B,M,4) xyxy -> (B,M,A) bool: center strictly inside box.

    Reference tal.py:278-299.
    """
    lt = gt_bboxes[..., None, :2]  # (B,M,1,2)
    rb = gt_bboxes[..., None, 2:]  # (B,M,1,2)
    xy = xy_centers[None, None]    # (1,1,A,2)
    # two (B,M,A) mins instead of concatenating a (B,M,A,4) delta tensor:
    # the concat forces a 4x materialization (550 MB at b128/8400 anchors)
    # that the fused min chain never creates
    d_min = jnp.minimum((xy - lt).min(-1), (rb - xy).min(-1))  # (B,M,A)
    return d_min > eps


def _fast_pow(x: jax.Array, p: float) -> jax.Array:
    """x**p with strength reduction for the assigner's default exponents.

    ``x**0.5``/``x**6.0`` as generic pow lower to exp(p*log(x)) — two VPU
    transcendentals over the (B,M,A) metric matrices. sqrt and repeated
    multiplication compute the same values (to ulp; the metric only feeds
    threshold compares and a max-normalization) without the transcendental
    cost. Falls back to generic pow for non-default exponents."""
    if p == 0.5:
        return jnp.sqrt(x)
    if float(p).is_integer() and 1 <= int(p) <= 8:
        n = int(p)
        out = x
        for _ in range(n - 1):
            out = out * x
        return out
    return x**p


def _kth_largest(x: jax.Array, k: int) -> jax.Array:
    """EXACT k-th largest value (with multiplicity) along the last axis,
    keepdims.

    Default impl (``iter``): k rounds of distinct-max **with a running
    >=-count**, which makes it tie-exact — the k-th largest in sorted-with-
    duplicates order is the largest distinct value d with count(x >= d) >= k,
    and each round visits the next distinct value. Each round is two fused
    streaming reductions over the row (masked max, then >=-count), so the
    whole thing is ~2k linear passes — interleaved-A/B'd at −5.4 ms/step
    vs ``approx_max_k(recall=1.0)`` at (128,8,8400) f32 b128/640 on v5e
    (the latter lowers to a FULL SORT worth 3.7 ms device time plus its
    layout copies, round-4 per-op table in BASELINE.md). Earlier
    dead ends for the record: blocked 128-wide chunk sort (5x worse —
    minor-dim sorts of short rows vectorize terribly on TPU) and the
    count-less masked-max (breaks tie multiplicity,
    tests/test_loss_parity.py tie cases). ``perf.kth_impl="approx"`` (config
    key ``kth_impl`` / bench env ``MGA_KTH_IMPL``) restores the sort path.
    """
    if perf.active().kth_impl == "approx":
        return jax.lax.approx_max_k(x, k, recall_target=1.0)[0][..., -1:]
    lead = x.shape[:-1] + (1,)
    d = jnp.full(lead, jnp.inf, x.dtype)       # last distinct value visited
    kth = jnp.zeros(lead, x.dtype)
    done = jnp.zeros(lead, bool)
    neg = jnp.array(-jnp.inf, x.dtype)
    for _ in range(k):
        nm = jnp.max(jnp.where(x < d, x, neg), axis=-1, keepdims=True)
        # count with multiplicity; jnp.max returns an element of x, so the
        # == comparison inside >= is exact (no rounding)
        nc = jnp.sum((x >= nm).astype(jnp.float32), axis=-1, keepdims=True)
        hit = (~done) & (nc >= k)
        kth = jnp.where(hit, nm, kth)
        done = done | hit
        d = nm
    # rows always resolve within k rounds: every distinct value adds >= 1 to
    # the count and the row length A >= k in every caller
    return kth


def task_aligned_assigner(
    pd_scores: jax.Array,    # (B, A, nc) — sigmoided class scores
    pd_bboxes_p: jax.Array,  # (4, B, A) xyxy PLANAR, image units (layout note in ops/boxes.py)
    anc_points: jax.Array,   # (A, 2), image units
    gt_labels: jax.Array,    # (B, M) int
    gt_bboxes: jax.Array,    # (B, M, 4) xyxy, image units
    mask_gt: jax.Array,      # (B, M) bool/0-1 valid flags
    num_classes: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns (target_bboxes_p (4,B,A), target_scores (B,A,nc), fg_mask (B,A))."""
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    gt_bboxes_p = gt_bboxes.transpose(2, 0, 1)  # (4,B,M) — M is tiny, free
    mask_gt_f = mask_gt.astype(pd_scores.dtype)  # (B,M)

    # ---- candidate mask: anchor centers inside valid gt boxes ----
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes).astype(pd_scores.dtype)
    cand = mask_in_gts * mask_gt_f[..., None]  # (B,M,A)

    # ---- alignment metric ----
    # score of each anchor for each gt's class: one-hot matmul (MXU-friendly)
    onehot = jax.nn.one_hot(gt_labels, nc, dtype=pd_scores.dtype)  # (B,M,nc)
    bbox_scores = jnp.einsum("bac,bmc->bma", pd_scores, onehot) * cand
    overlaps = (
        jnp.clip(
            bbox_iou_ciou_p(gt_bboxes_p[:, :, :, None], pd_bboxes_p[:, :, None, :]), 0, None
        )
        * cand
    )  # (B,M,A)
    align_metric = _fast_pow(bbox_scores, alpha) * _fast_pow(overlaps, beta)

    # ---- top-k per gt over anchors (reference select_topk_candidates tal.py:203-233) ----
    # Threshold formulation: an anchor is selected iff its metric reaches the
    # k-th largest value for that gt AND is positive. vs the reference's
    # index-scatter this avoids both the (B,M,k,A) one-hot count broadcast
    # (~150M elements at b64) and the index half of top_k. Parity argument:
    #   * fewer than k positive candidates -> kth value is 0; the `> 0` guard
    #     keeps exactly the positive ones. The reference *does* select
    #     zero-metric anchors in this case, but they are inert downstream:
    #     their normalized target score is 0 (align_metric * mask_pos = 0), so
    #     cls targets and box/dfl weights vanish identically.
    #   * ties at the kth positive value select k+t anchors here vs exactly k
    #     (lowest index wins) in the reference — a measure-zero event for
    #     continuous fp32 metrics; covered by the degenerate-case invariant
    #     test (tests/test_loss_parity.py).
    # kth value via the exact block-top-k (_kth_largest): identical value
    # (multiplicity preserved) to the former approx_max_k(recall=1.0), which
    # the round-4 on-chip HLO showed lowering to a FULL SORT of the (B,M,A)
    # f32 metric (3.7 ms/step at b128 — BASELINE.md per-op table).
    kth = _kth_largest(align_metric, topk)  # (B,M,1)
    mask_pos = ((align_metric >= kth) & (align_metric > 0)).astype(align_metric.dtype)

    # ---- resolve anchors claimed by multiple gts: keep highest overlap ----
    # (reference select_highest_overlaps tal.py:301-329; the data-dependent
    # `if fg.max() > 1` early-out is dropped — applying unconditionally is
    # identical when no anchor is contested)
    fg = mask_pos.sum(-2)  # (B,A)
    max_overlap_gt = overlaps.argmax(1)  # (B,A)
    is_max = jax.nn.one_hot(max_overlap_gt, M, dtype=mask_pos.dtype).transpose(0, 2, 1)  # (B,M,A)
    multi = fg[:, None, :] > 1  # (B,1,A)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2)  # (B,A), 0/1
    target_gt_idx = mask_pos.argmax(-2)  # (B,A)

    # ---- gather targets ----
    # one-hot einsum instead of take_along_axis: batched gathers lower poorly
    # on TPU (cf. the 50x dfl_loss gather cost, bench_loss_parts.py); M is
    # tiny so the (B,A,M) selection matmul is effectively free and exact
    # (one 1.0 per row, finite operands).
    sel = jax.nn.one_hot(target_gt_idx, M, dtype=pd_scores.dtype)  # (B,A,M)
    tb_p = jnp.einsum("bam,fbm->fba", sel, gt_bboxes_p)  # (4,B,A) planar
    # labels route through fp32 regardless of pd_scores.dtype: in bf16 class
    # ids > 256 would round silently (bf16 integer-exactness limit)
    sel32 = jax.nn.one_hot(target_gt_idx, M, dtype=jnp.float32)
    tl = jnp.einsum("bam,bm->ba", sel32, gt_labels.astype(jnp.float32)).astype(jnp.int32)
    target_scores = jax.nn.one_hot(tl, nc, dtype=pd_scores.dtype) * fg_mask[..., None]

    # ---- normalize by per-gt best alignment (reference tal.py:120-125) ----
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)  # (B,M,1)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)  # (B,M,1)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(-2)[..., None]  # (B,A,1)
    target_scores = target_scores * norm

    return tb_p, target_scores, fg_mask


def flatten_det_maps(det_maps: Sequence[jax.Array], reg_max: int, nc: int):
    """NHWC per-level maps -> (pred_distri (B,A,4*reg_max), pred_scores (B,A,nc))."""
    b = det_maps[0].shape[0]
    no = 4 * reg_max + nc
    flat = jnp.concatenate([m.reshape(b, -1, no) for m in det_maps], axis=1)
    return flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]


def dfl_loss(pred_dist: jax.Array, target: jax.Array, reg_max: int) -> jax.Array:
    """Distribution focal loss per anchor (reference loss.py:87-105).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
    [0, reg_max-1]. Returns (...,) mean over the 4 sides.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # select the tl/tr bins with a broadcast-compare + where + sum instead of
    # take_along_axis: a gather on a 16-wide minor dim lowers to scalar loads
    # on TPU and measured 75.8 ms at (64, 8400, 4, 16) vs 1.5 ms for the
    # vectorized select (tools/scripts/bench_loss_parts.py). where+sum (not
    # one_hot multiply) keeps bit-exact selection semantics: no 0*(-inf).
    idx = jnp.arange(reg_max, dtype=jnp.int32)
    ce_l = -jnp.sum(jnp.where(idx == tl[..., None], logp, 0), axis=-1)
    ce_r = -jnp.sum(
        jnp.where(idx == jnp.minimum(tr, reg_max - 1)[..., None], logp, 0), axis=-1
    )
    return (ce_l * wl + ce_r * wr).mean(-1)


# --------------------------------------------------------------- analytic VJPs
#
# Autodiff of the DFL decode (softmax·proj) + distribution-focal CE
# materializes softmax(pd), log_softmax(pd) and a cotangent for each — four
# (B,A,4,R) HBM tensors (275 MB apiece at b128/640px fp32); the measured loss
# backward was ~2x the whole model backward per FLOP (bench_loss_grad.py).
# Both gradients have textbook closed forms that need only p = softmax(pd),
# and p is *recomputed in the backward from the saved input* (pure remat:
# same HBM reads, zero extra residency). Two separate custom_vjps — not one
# fused — because the DFL target is produced by the assigner, which consumes
# the (stop-grad) decode output: ltrb must exist before `target` does.
# Reference math: loss.py:87-105 (DFLoss) + nn/modules/block.py:58 (DFL
# decode); value + gradient equivalence vs autodiff covered by
# tests/test_loss_parity.py.


def _dfl_decode_primal(pd: jax.Array) -> jax.Array:
    # f32 internal math regardless of storage dtype: pd may arrive as the
    # model's native bf16 (already bf16-quantized — casting earlier adds no
    # information, it only doubles the HBM stream of the (B,A,4,R) tensor)
    pd = pd.astype(jnp.float32)
    proj = jnp.arange(pd.shape[-1], dtype=pd.dtype)
    return (jax.nn.softmax(pd, axis=-1) * proj).sum(-1)


@jax.custom_vjp
def dfl_decode(pd: jax.Array) -> jax.Array:
    """(B,A,4,R) logits -> (B,A,4) expectation ``sum(softmax(pd) * arange(R))``.

    Analytic VJP: d ltrb/dz_j = p_j (j - ltrb)  =>  dz = p * (proj - ltrb) * g.
    """
    return _dfl_decode_primal(pd)


def _dfl_decode_fwd(pd):
    ltrb = _dfl_decode_primal(pd)
    return ltrb, (pd, ltrb)


def _dfl_decode_bwd(res, g_ltrb):
    pd, ltrb = res
    p = jax.nn.softmax(pd.astype(jnp.float32), axis=-1)  # recompute, f32
    proj = jnp.arange(pd.shape[-1], dtype=jnp.float32)
    dz = p * (proj - ltrb[..., None]) * g_ltrb[..., None]
    return (dz.astype(pd.dtype),)


dfl_decode.defvjp(_dfl_decode_fwd, _dfl_decode_bwd)


def _dfl_interp(target: jax.Array, reg_max: int):
    """Clip + split a continuous bin target into (tl, tr, wl, wr)."""
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = target.astype(jnp.int32)
    tr = jnp.minimum(tl + 1, reg_max - 1)
    wl = tr.astype(target.dtype) - target
    return tl, tr, wl, 1.0 - wl


def _dfl_ce_primal(pd: jax.Array, target: jax.Array) -> jax.Array:
    reg_max = pd.shape[-1]
    pd = pd.astype(jnp.float32)  # f32 math from native-dtype storage
    target = target.astype(jnp.float32)
    tl, tr, wl, wr = _dfl_interp(target, reg_max)
    lse = jax.nn.logsumexp(pd, axis=-1)  # (B,A,4)
    idx = jnp.arange(reg_max, dtype=jnp.int32)
    # where+sum select (never take_along_axis on a 16-wide minor dim — see
    # dfl_loss note); CE = lse - z_t
    z_tl = jnp.sum(jnp.where(idx == tl[..., None], pd, 0), axis=-1)
    z_tr = jnp.sum(jnp.where(idx == tr[..., None], pd, 0), axis=-1)
    ce = (lse - z_tl) * wl + (lse - z_tr) * wr  # (B,A,4)
    return ce.mean(-1)  # (B,A)


@jax.custom_vjp
def dfl_ce(pd: jax.Array, target: jax.Array) -> jax.Array:
    """Per-anchor distribution-focal CE: identical value to :func:`dfl_loss`.

    pd (B,A,4,R) logits, target (B,A,4) continuous bins (stop-grad GT).
    Analytic VJP (softmax-CE form): dz = (p - q) * g/4 with
    q = wl*onehot(tl) + wr*onehot(tr).
    """
    return _dfl_ce_primal(pd, target)


def _dfl_ce_fwd(pd, target):
    return _dfl_ce_primal(pd, target), (pd, target)


def _dfl_ce_bwd(res, g_dfl):
    pd, target = res
    reg_max = pd.shape[-1]
    tl, tr, wl, wr = _dfl_interp(target.astype(jnp.float32), reg_max)
    p = jax.nn.softmax(pd.astype(jnp.float32), axis=-1)  # recompute
    idx = jnp.arange(reg_max, dtype=jnp.int32)
    q = (
        jnp.where(idx == tl[..., None], wl[..., None], 0)
        + jnp.where(idx == tr[..., None], wr[..., None], 0)
    )  # interpolated one-hot target
    g_side = (g_dfl / 4.0)[..., None, None]  # d dfl_pa / d ce per side
    return ((p - q) * g_side).astype(pd.dtype), None  # target is GT: no gradient


dfl_ce.defvjp(_dfl_ce_fwd, _dfl_ce_bwd)


def _dfl_decode_primal_p(pd: jax.Array) -> jax.Array:
    """Planar decode: (B,A,4,R) logits -> (4,B,A) expectation (layout note
    in ops/boxes.py — a materialized (B,A,4) f32 pays a 32x lane-pad tax)."""
    return _dfl_decode_primal(pd).transpose(2, 0, 1)


@jax.custom_vjp
def dfl_decode_ce(pd: jax.Array, target_p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Fused decode + CE: ``(ltrb_p, ce) = (decode(pd) planar, dfl_ce(pd, t))``.

    One custom VJP instead of two: the separate decode/CE VJPs each stream
    the full (B,A,4,R) pd tensor and emit a (B,A,4,R) cotangent, which XLA
    then re-reads to sum (the 3.5 ms f32[128,8400,64] ``add_any`` in the
    round-4 per-op table, BASELINE.md). The combined backward reads pd once,
    recomputes p = softmax(pd), and writes the summed cotangent directly:

        dz = p * ((proj - ltrb) * g_ltrb + g_ce/4) - q * g_ce/4

    All (·,·,4)-shaped io is PLANAR (4,B,A) — target_p in, ltrb_p out, and
    the backward's g_ltrb cotangent arrives planar — so no lane-padded
    (B,A,4) tensor ever materializes at a fusion boundary (round-5 byte
    census: three such tensors cost ~550 MB apiece vs 17 MB logical).

    Requires ``target`` at call time — callers that feed the assigner from
    the decode output should use a ``stop_gradient`` re-evaluation of the
    primal for that (value-identical; XLA CSEs it with this forward).
    """
    return _dfl_decode_primal_p(pd), _dfl_ce_primal(pd, target_p.transpose(1, 2, 0))


def _dfl_decode_ce_fwd(pd, target_p):
    ltrb_p = _dfl_decode_primal_p(pd)
    ce = _dfl_ce_primal(pd, target_p.transpose(1, 2, 0))
    return (ltrb_p, ce), (pd, ltrb_p, target_p)


def _dfl_decode_ce_bwd(res, gs):
    pd, ltrb_p, target_p = res
    g_ltrb_p, g_ce = gs
    # the planar residuals/cotangents re-enter batch-major INSIDE the fused
    # backward (transposes fuse as index permutations; only the planar
    # fusion-boundary tensors are materialized)
    ltrb = ltrb_p.transpose(1, 2, 0)
    target = target_p.transpose(1, 2, 0)
    g_ltrb = g_ltrb_p.transpose(1, 2, 0)
    reg_max = pd.shape[-1]
    # TPU path: one Pallas pass over pd (ops/pallas/dfl_bwd.py) — XLA lowers
    # this same math to a batch-minor kLoop fusion ~9x off bandwidth SoL
    # (3.3 ms/step at b128/640, round-4 per-op table). perf.dfl_bwd="xla"
    # (config key dfl_bwd / bench env MGA_DFL_BWD) is the A/B escape hatch;
    # value parity pinned by tests/test_dfl_bwd_pallas.py.
    if (
        perf.active().dfl_bwd == "pallas"
        and 128 % reg_max == 0
        and (pd.shape[0] * pd.shape[1] * 4 * reg_max) % 128 == 0
    ):
        from mga_yolo_tpu.ops.pallas.dfl_bwd import (
            HAS_PALLAS,
            dfl_decode_ce_bwd_pallas_planar,
        )

        if HAS_PALLAS and jax.default_backend() == "tpu":
            # v2 kernel: consumes the planar residuals/cotangents directly
            # (zero-lane-pad (nseg, M) aux packing) — the v1 (M,8) packing
            # lane-padded 16x and measured slower than XLA's fusion under
            # planar io (BASELINE.md round-5 A/B)
            dz = dfl_decode_ce_bwd_pallas_planar(
                pd, ltrb_p.astype(jnp.float32), g_ltrb_p.astype(jnp.float32),
                g_ce.astype(jnp.float32), target_p.astype(jnp.float32),
            )
            return dz, None
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    tl, tr, wl, wr = _dfl_interp(target.astype(jnp.float32), reg_max)
    p = jax.nn.softmax(pd.astype(jnp.float32), axis=-1)  # recompute, f32
    idx = jnp.arange(reg_max, dtype=jnp.int32)
    q = (
        jnp.where(idx == tl[..., None], wl[..., None], 0)
        + jnp.where(idx == tr[..., None], wr[..., None], 0)
    )
    g_side = (g_ce / 4.0)[..., None, None]
    dz = p * ((proj - ltrb[..., None]) * g_ltrb[..., None] + g_side) - q * g_side
    return dz.astype(pd.dtype), None


dfl_decode_ce.defvjp(_dfl_decode_ce_fwd, _dfl_decode_ce_bwd)


def v8_detection_loss(
    det_maps: Sequence[jax.Array],
    strides: Sequence[int],
    gt_labels: jax.Array,   # (B, M)
    gt_bboxes: jax.Array,   # (B, M, 4) xyxy in image pixels
    mask_gt: jax.Array,     # (B, M)
    nc: int,
    cfg: DetLossConfig = DetLossConfig(),
):
    """Returns (total_loss_scalar, {'box','cls','dfl'} detached components).

    Mirrors reference loss.py:243-298: BCE cls + CIoU box + DFL, gains from
    cfg, final loss scaled by batch size.
    """
    reg_max = cfg.reg_max
    B = det_maps[0].shape[0]
    pred_distri, pred_scores = flatten_det_maps(det_maps, reg_max, nc)
    A = pred_scores.shape[1]
    # mixed-precision boundary: scalar-ish score/box math runs f32; the BIG
    # (B,A,4*reg_max) distribution tensor stays in its native (bf16 under
    # train) storage — the DFL custom VJPs cast to f32 internally, so the
    # values and the rounding point of the gradient are identical to casting
    # here, at half the HBM traffic (round-4 per-op table, BASELINE.md).
    pred_scores = pred_scores.astype(jnp.float32)

    shapes = [(m.shape[1], m.shape[2]) for m in det_maps]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5, dtype=jnp.float32)

    # decode to xyxy in feature units — the assigner only needs VALUES, so it
    # runs off a stop-gradient re-evaluation of the decode primal; the
    # gradient-carrying decode happens inside the fused dfl_decode_ce below
    # (one backward pass over pd instead of two + an add_any merge). XLA
    # CSEs the two identical primal computations. All box/ltrb tensors are
    # PLANAR (4,B,A) — see ops/boxes.py layout note (32x lane-pad tax on a
    # materialized (B,A,4); round-5 whole-step byte census, BASELINE.md).
    pd = pred_distri.reshape(B, A, 4, reg_max)
    anc_p = anchor_points.T[:, None, :]          # (2,1,A) planar centers
    stride_a = stride_tensor[:, 0]               # (A,)
    ltrb_sg_p = jax.lax.stop_gradient(_dfl_decode_primal_p(pd))
    pred_bboxes_sg_p = dist2bbox_p(ltrb_sg_p, anc_p, xywh=False)  # (4,B,A)

    target_bboxes_p, target_scores, fg_mask = jax.lax.stop_gradient(
        task_aligned_assigner(
            jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores)),
            pred_bboxes_sg_p * stride_a,
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
            nc,
            topk=cfg.tal_topk,
            alpha=cfg.tal_alpha,
            beta=cfg.tal_beta,
        )
    )

    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # ---- cls: BCE with logits, sum / target_scores_sum ----
    bce = optax_sigmoid_bce(pred_scores, target_scores)
    loss_cls = bce.sum() / target_scores_sum

    # ---- box + dfl through the single fused decode/CE VJP ----
    tb_feat_p = target_bboxes_p / stride_a  # (4,B,A)
    weight = target_scores.sum(-1) * fg_mask  # (B,A)
    target_ltrb_p = bbox2dist_p(anc_p, tb_feat_p, reg_max - 1)  # (4,B,A)
    ltrb_p, per_anchor_dfl = dfl_decode_ce(pd, jax.lax.stop_gradient(target_ltrb_p))
    pred_bboxes_p = dist2bbox_p(ltrb_p, anc_p, xywh=False)  # (4,B,A)

    iou = bbox_iou_ciou_p(pred_bboxes_p, tb_feat_p)  # (B,A)
    loss_iou = (((1.0 - iou) * weight)).sum() / target_scores_sum
    loss_dfl = (per_anchor_dfl * weight).sum() / target_scores_sum

    loss_box = loss_iou * cfg.box
    loss_cls = loss_cls * cfg.cls
    loss_dfl = loss_dfl * cfg.dfl
    total = (loss_box + loss_cls + loss_dfl) * B
    comps = {
        "box": jax.lax.stop_gradient(loss_box),
        "cls": jax.lax.stop_gradient(loss_cls),
        "dfl": jax.lax.stop_gradient(loss_dfl),
    }
    return total, comps


def optax_sigmoid_bce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable elementwise BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
