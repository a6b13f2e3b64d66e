"""Device-side training augmentation: batched warp/HSV/flip/pyramid under jit.

The reference's augmentation stack is entirely host cv2 (per-image mosaic,
``cv2.warpAffine``/``warpPerspective``, HSV LUTs, flips —
`/root/reference/mga_yolo/external/ultralytics/ultralytics/data/augment.py`
:630-810, :1373-1415, :1466, :1608). On a TPU host the per-pixel work is the
train-pipeline bottleneck at 640 px (BASELINE.md host-pipeline table): mosaic
assembly is memcpy, but the affine warp + HSV jitter burn ~20 ms/img/core.

This module is the DALI-style split re-designed for XLA:

* **Host** (numpy/cv2, cheap): decode, letterbox, mosaic *placement* (pure
  memcpy into a canvas) and — crucially — ALL randomness: the affine matrix,
  HSV gains and flip flags are drawn with the exact same
  ``np.random.Generator`` consumption order as the host pipeline
  (`dataset.MGADataset._train_sample`), so given the same seed both paths
  produce the same geometry.
* **Device** (one jitted XLA program, batched over B): inverse-map bilinear
  warp of the image canvas (constant-114 border, cv2 semantics), nearest warp
  of the mask with the same matrix, exact box corner transform + the
  reference's candidate filter, HSV jitter in cv2's uint8 HSV space, flips,
  mask-pyramid downsampling, and static-shape GT compaction to ``max_boxes``.

Everything under jit is static-shape: the canvas is ``(2S, 2S)`` for mosaic
batches (the affine output crops to ``S``) and ``(S, S)`` when mosaic is off,
GT rides as padded ``(2*max_boxes,)`` rows with a validity mask, and the
per-sample matrices/gains/flags are tiny dense inputs. No data-dependent
control flow — sample validity flows through ``jnp.where``.

Supported config subset (``supported()`` reports the reason otherwise):
``mixup == cutmix == albumentations == 0`` (those compose *finished* samples
recursively — host-only) and a mask downsample method with a device
equivalent: ``maxpool`` / ``area`` / ``nearest`` / ``skeleton_bresenham``
with ``skeleton_strict=False`` (= maxpool + 3x3 morphological close), or
``prob_mode`` with ``area``/``avgpool``/``nearest``. The strict skeleton path
(Zhang-Suen + Bresenham) is inherently sequential — it stays on host.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

from mga_yolo_tpu.config import AugmentConfig, MGAConfig
from mga_yolo_tpu.data import transforms as T

STRIDES = (8, 16, 32)

# ---------------------------------------------------------------------------
# capability check
# ---------------------------------------------------------------------------


def supported(cfg: MGAConfig) -> tuple[bool, str]:
    """Can this config's augmentation run on device? (ok, reason-if-not)."""
    a = cfg.augment
    if a.mixup or a.cutmix:
        return False, "mixup/cutmix compose finished samples recursively (host-only)"
    if a.albumentations:
        return False, "albumentations is a host cv2 pipeline"
    m = cfg.mask
    if m.prob_mode:
        if m.prob_method not in ("area", "avgpool", "nearest"):
            return False, f"prob_method={m.prob_method!r} has no device equivalent"
        return True, ""
    method = m.method.lower()
    if method in ("maxpool", "area", "nearest"):
        return True, ""
    if method == "skeleton_bresenham" and not m.skeleton_strict:
        return True, ""  # non-strict = maxpool (+ close bridge)
    return False, f"mask method={method!r} (strict={m.skeleton_strict}) is host-only"


def canvas_multiplier(aug: AugmentConfig, use_mosaic: bool) -> int:
    """Canvas side length in multiples of imgsz (2 while mosaic can fire)."""
    return 2 if (use_mosaic and aug.mosaic > 0) else 1


# ---------------------------------------------------------------------------
# host side: raw-sample builder (numpy only — mirrors MGADataset._train_sample
# rng consumption exactly so host/device paths are geometry-identical)
# ---------------------------------------------------------------------------


def build_raw_sample(
    ds, i: int, rng: np.random.Generator, use_mosaic: bool, size: int | None = None
) -> dict:
    """One un-warped training sample: canvas + matrices + gains + padded GT.

    ``ds`` is an ``MGADataset``; rng draws happen in the same order as
    ``ds._train_sample`` (mosaic gate, part indices, mosaic jitter, affine
    matrix, HSV gains, flip flags) so a given (seed, index) yields the same
    augmentation parameters on either path.
    """
    aug = ds.cfg.augment
    s = size or ds.imgsz
    cm = canvas_multiplier(aug, use_mosaic)
    mosaic_draw = use_mosaic and rng.random() < aug.mosaic
    if mosaic_draw:
        n = aug.mosaic_n if aug.mosaic_n in (3, 4, 9) else 4
        idxs = [i] + list(rng.integers(0, len(ds), n - 1))
        parts = [T.letterbox(ds.load_raw(j), s, scaleup=True, center=False) for j in idxs]
        sample = {3: T.mosaic3, 4: T.mosaic4, 9: T.mosaic9}[n](parts, rng, s)
    else:
        sample = T.letterbox(ds.load_raw(i), s, scaleup=True)

    img = sample["img"]
    canvas = np.full((cm * s, cm * s, 3), 114, np.uint8)
    mask_canvas = np.zeros((cm * s, cm * s), np.uint8)
    h0, w0 = img.shape[:2]
    canvas[:h0, :w0] = img  # mosaic: exact fit; plain-in-2S: top-left embed
    if sample.get("mask") is not None:
        mask_canvas[:h0, :w0] = sample["mask"]

    # affine matrix with the host path's exact arguments: output size is
    # always (s, s) — mosaic border (-s//2) or plain border 0 — and the
    # centering term uses the pre-embed image shape (reads past it hit the
    # 114-filled canvas, which equals cv2's BORDER_CONSTANT behavior).
    M, sc = T._affine_matrix(
        rng, (s, s), img.shape, aug.degrees, aug.translate, aug.scale, aug.shear,
        aug.perspective,
    )
    minv = np.linalg.inv(M.astype(np.float64)).astype(np.float32)

    if aug.hsv_h or aug.hsv_s or aug.hsv_v:
        hsv_r = (rng.uniform(-1, 1, 3) * (aug.hsv_h, aug.hsv_s, aug.hsv_v) + 1).astype(
            np.float32
        )
    else:
        hsv_r = np.ones(3, np.float32)
    flips = np.zeros(2, np.float32)  # [flipud, fliplr] — same draw order/gating
    if aug.flipud and rng.random() < aug.flipud:
        flips[0] = 1.0
    if aug.fliplr and rng.random() < aug.fliplr:
        flips[1] = 1.0

    P = 2 * ds.max_boxes  # pre-filter GT capacity (affine drops some)
    boxes = np.zeros((P, 4), np.float32)
    cls = np.zeros((P,), np.float32)
    valid = np.zeros((P,), np.float32)
    nb = min(len(sample.get("boxes", ())), P)
    if nb:
        boxes[:nb] = sample["boxes"][:nb]
        cls[:nb] = sample["cls"][:nb]
        valid[:nb] = 1.0

    return {
        "canvas": canvas,
        "mask_canvas": mask_canvas,
        "pboxes": boxes,
        "pcls": cls,
        "pvalid": valid,
        "mfwd": M.astype(np.float32),
        "minv": minv,
        "ascale": np.float32(sc),
        "hsv": hsv_r,
        "flips": flips,
        "index": np.int32(i),
    }


def collate_raw(samples: Sequence[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# ---------------------------------------------------------------------------
# device side (jax) — imported lazily by the loader, only in raw mode
# ---------------------------------------------------------------------------

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def _src_coords(minv, out_hw, perspective: bool):
    """Inverse-map source coordinates for every output pixel (f32 grids)."""
    oh, ow = out_hw
    ys, xs = jnp.mgrid[0:oh, 0:ow].astype(jnp.float32)
    x = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    y = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    if perspective:
        w = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
        w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        x, y = x / w, y / w
    return x, y


def _gather2d(img, yi, xi):
    """img (H, W, C) or (H, W); integer index grids -> gathered values."""
    H, W = img.shape[0], img.shape[1]
    flat = img.reshape(H * W, -1)
    idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape(*yi.shape, flat.shape[-1])


def _warp_bilinear(canvas, minv, out_hw, perspective: bool, border: float = 114.0):
    """cv2.warpAffine/warpPerspective INTER_LINEAR + BORDER_CONSTANT semantics.

    float32 bilinear (cv2 uses 5-bit fixed-point interpolation weights, so
    outputs may differ by a couple of grey levels — pinned by tests).
    """
    H, W = canvas.shape[0], canvas.shape[1]
    x, y = _src_coords(minv, out_hw, perspective)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = (x - x0)[..., None], (y - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    out = jnp.zeros((*out_hw, canvas.shape[2]), jnp.float32)
    for dy, dx, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        yi, xi = y0i + dy, x0i + dx
        tap = _gather2d(canvas, yi, xi).astype(jnp.float32)
        inside = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
        out = out + wgt * jnp.where(inside, tap, border)
    return out


def _warp_nearest(mask, minv, out_hw, perspective: bool):
    """Nearest warp, 0 border (the mask-alignment fork edit, augment.py:1373)."""
    H, W = mask.shape[0], mask.shape[1]
    x, y = _src_coords(minv, out_hw, perspective)
    xi = jnp.floor(x + 0.5).astype(jnp.int32)
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    tap = _gather2d(mask, yi, xi)[..., 0].astype(jnp.float32)
    inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    return jnp.where(inside, tap, 0.0)


def _transform_boxes(boxes, valid, M, sc, size: int, perspective: bool):
    """Exact device version of T.random_affine's box math + candidate filter."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # corners (P, 4, 2): (x1,y1) (x2,y2) (x1,y2) (x2,y1) — host order
    cx = jnp.stack([x1, x2, x1, x2], 1)
    cy = jnp.stack([y1, y2, y2, y1], 1)
    wx = M[0, 0] * cx + M[0, 1] * cy + M[0, 2]
    wy = M[1, 0] * cx + M[1, 1] * cy + M[1, 2]
    if perspective:
        ww = M[2, 0] * cx + M[2, 1] * cy + M[2, 2]
        wx, wy = wx / ww, wy / ww
    nx1 = jnp.clip(wx.min(1), 0, size)
    ny1 = jnp.clip(wy.min(1), 0, size)
    nx2 = jnp.clip(wx.max(1), 0, size)
    ny2 = jnp.clip(wy.max(1), 0, size)
    new = jnp.stack([nx1, ny1, nx2, ny2], 1)
    w1, h1 = x2 - x1, y2 - y1
    w2, h2 = nx2 - nx1, ny2 - ny1
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    keep = (
        (w2 > 2)
        & (h2 > 2)
        & (w2 * h2 / (w1 * h1 * sc**2 + 1e-16) > 0.1)
        & (ar < 100)
        & (valid > 0)
    )
    return new, keep.astype(jnp.float32)


# ---- cv2 uint8 HSV round trip -------------------------------------------------


def _hsv_jitter(img_bgr: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """RandomHSV in cv2's uint8 HSV space (transforms.random_hsv semantics).

    BGR->HSV (H in [0,180)), per-channel LUT math ``h*(r0)%180`` /
    ``clip(s*r1)`` / ``clip(v*r2)`` with the host's truncation casts, HSV->BGR.
    cv2's fixed-point conversion tables round slightly differently — pinned
    within a few grey levels by tests.
    """
    b, g, rr = img_bgr[..., 0], img_bgr[..., 1], img_bgr[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), rr)
    mn = jnp.minimum(jnp.minimum(b, g), rr)
    diff = v - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(v > 0, jnp.floor(255.0 * diff / jnp.where(v > 0, v, 1.0) + 0.5), 0.0)
    h = jnp.where(
        v == rr,
        30.0 * (g - b) / safe,
        jnp.where(v == g, 60.0 + 30.0 * (b - rr) / safe, 120.0 + 30.0 * (rr - g) / safe),
    )
    h = jnp.where(diff > 0, h, 0.0)
    h = jnp.floor(h + 0.5)
    h = jnp.where(h < 0, h + 180.0, h)

    # the host LUTs: float multiply then uint8 truncation (values are >= 0)
    h = jnp.floor((h * r[0]) % 180.0)
    s = jnp.floor(jnp.clip(s * r[1], 0, 255))
    v = jnp.floor(jnp.clip(v * r[2], 0, 255))

    # HSV -> BGR, cv2 uint8 domain (h in half-degrees)
    sector = jnp.floor(h / 30.0)
    f = h / 30.0 - sector
    sf = s / 255.0
    p = v * (1.0 - sf)
    q = v * (1.0 - sf * f)
    t = v * (1.0 - sf * (1.0 - f))
    i = sector.astype(jnp.int32)
    conds = [i == k for k in range(6)]
    red = jnp.select(conds, [v, q, p, p, t, v], v)
    grn = jnp.select(conds, [t, v, v, q, p, p], v)
    blu = jnp.select(conds, [p, p, t, v, v, q], v)
    out = jnp.stack([blu, grn, red], -1)
    return jnp.clip(jnp.floor(out + 0.5), 0, 255)


# ---- mask pyramid --------------------------------------------------------------


def _close3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 morphological close on (B, H, W) binary f32 (cv2 MORPH_CLOSE)."""
    dil = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    ero = lax.reduce_window(dil, jnp.inf, lax.min, (1, 3, 3), (1, 1, 1), "SAME")
    return ero


def downsample_batch(masks: jnp.ndarray, stride: int, mcfg) -> jnp.ndarray:
    """(B, S, S) binary f32 -> (B, S/st, S/st) via the configured method.

    Device equivalents of mask_ops.downsample_mask / downsample_mask_prob for
    the jit-able subset (pinned exactly equal by tests/test_device_augment.py).
    """
    B, H, W = masks.shape
    hc, wc = H // stride, W // stride
    blocks = masks.reshape(B, hc, stride, wc, stride)
    if mcfg.prob_mode:
        if mcfg.prob_method == "nearest":
            return masks[:, ::stride, ::stride]
        if mcfg.prob_method == "avgpool":
            return blocks.mean((2, 4))
        # "area": host resizes the *uint8* mask with INTER_AREA, so the block
        # mean is rounded to {0,1} before the float conversion
        return jnp.floor(blocks.mean((2, 4)) + 0.5)
    method = mcfg.method.lower()
    if method == "nearest":
        return masks[:, ::stride, ::stride]
    if method == "area":
        # cv2 INTER_AREA on uint8 rounds the block mean to the nearest integer
        # ({0,1} for binary masks) before mask_ops' `> thresh` comparison
        out = (jnp.floor(blocks.mean((2, 4)) + 0.5) > mcfg.thresh).astype(jnp.float32)
        return _close3(out) if mcfg.bridge else out
    out = blocks.max((2, 4))  # maxpool | skeleton_bresenham (non-strict)
    if method == "skeleton_bresenham" and mcfg.bridge:
        out = _close3(out)
    return out


# ---- the batched augment program ----------------------------------------------


def make_augment_fn(cfg: MGAConfig, max_boxes: int, strides=STRIDES, out_shardings=None):
    """Build ``augment(raw_batch, out_size) -> train batch`` (jit, static size).

    Output matches `dataset.finalize` + `collate`: image (B,S,S,3) uint8,
    gt_boxes (B,M,4), gt_labels (B,M) int32, mask_gt (B,M) f32, masks pyramid.
    ``out_shardings`` (the train step's batch shardings, sans "index") pins the
    output layout so the downstream jitted step sees its expected sharding.
    """
    aug, mcfg = cfg.augment, cfg.mask
    perspective = bool(aug.perspective)
    do_hsv = bool(aug.hsv_h or aug.hsv_s or aug.hsv_v)
    do_flipud, do_fliplr = bool(aug.flipud), bool(aug.fliplr)

    def one(canvas, mcanvas, boxes, cls, valid, mfwd, minv, sc, hsv_r, flips, S):
        img = _warp_bilinear(canvas, minv, (S, S), perspective)
        img = jnp.clip(jnp.floor(img + 0.5), 0, 255)
        if do_hsv:
            img = _hsv_jitter(img, hsv_r)
        m = _warp_nearest(mcanvas[..., None], minv, (S, S), perspective)
        nb, keep = _transform_boxes(boxes, valid, mfwd, sc, S, perspective)
        if do_flipud:
            fud = flips[0] > 0
            img = jnp.where(fud, img[::-1], img)
            m = jnp.where(fud, m[::-1], m)
            nb = jnp.where(
                fud,
                jnp.stack([nb[:, 0], S - nb[:, 3], nb[:, 2], S - nb[:, 1]], 1),
                nb,
            )
        if do_fliplr:
            flr = flips[1] > 0
            img = jnp.where(flr, img[:, ::-1], img)
            m = jnp.where(flr, m[:, ::-1], m)
            nb = jnp.where(
                flr,
                jnp.stack([S - nb[:, 2], nb[:, 1], S - nb[:, 0], nb[:, 3]], 1),
                nb,
            )
        # compact kept boxes to the front in original order (finalize semantics)
        order = jnp.argsort(1.0 - keep, stable=True)[:max_boxes]
        kv = keep[order]
        gt_boxes = nb[order] * kv[:, None]
        gt_labels = (cls[order] * kv).astype(jnp.int32)
        return img.astype(jnp.uint8), m, gt_boxes, gt_labels, kv

    @functools.partial(jax.jit, static_argnums=1, out_shardings=out_shardings)
    def augment(raw: dict, out_size: int) -> dict:
        S = out_size
        img, m, gtb, gtl, gtv = jax.vmap(
            lambda c, mc, b, cl, va, mf, mi, sc, hr, fl: one(
                c, mc, b, cl, va, mf, mi, sc, hr, fl, S
            )
        )(
            raw["canvas"], raw["mask_canvas"], raw["pboxes"], raw["pcls"],
            raw["pvalid"], raw["mfwd"], raw["minv"], raw["ascale"], raw["hsv"],
            raw["flips"],
        )
        pyr = [downsample_batch(m, st, mcfg)[..., None] for st in strides]
        return {
            "image": img,
            "gt_boxes": gtb,
            "gt_labels": gtl,
            "mask_gt": gtv,
            "masks": pyr,
        }

    return augment
