"""Mask-synced augmentation pipeline (host-side numpy/cv2).

Re-implements the capability of the reference's fork-edited transforms
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/data/augment.py` —
Mosaic `:630-810`, MixUp `:954-960`, CutMix `:1074-1081`, RandomPerspective
`:1373-1415`, RandomFlip `:1608-1633`, LetterBox `:1784-1793`): the binary
mask rides through every geometric transform with the *same* warp matrix as
the image (nearest interpolation, zero padding) so GT masks stay
pixel-aligned with augmented images — the core MGA data capability.

Samples are plain dicts:
    img:   (H, W, 3) uint8
    boxes: (N, 4) float32 xyxy absolute pixels
    cls:   (N,)   float32
    mask:  (H, W) uint8 binary (optional)
All randomness flows through an explicit ``np.random.Generator``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import cv2
import numpy as np

from mga_yolo_tpu.config import AugmentConfig

Sample = dict


def letterbox(
    sample: Sample,
    new_shape: int | tuple[int, int],
    scaleup: bool = True,
    center: bool = True,
    pad_value: int = 114,
) -> Sample:
    """Aspect-preserving resize + pad; boxes shifted, mask nearest + 0-pad.

    Geometry matches reference LetterBox (augment.py:1637-1793) including the
    round(d - 0.1)/round(d + 0.1) padding split.
    """
    img = sample["img"]
    h, w = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = int(round(w * r)), int(round(h * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if center:
        dw /= 2
        dh /= 2
    if (w, h) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top = int(round(dh - 0.1)) if center else 0
    bottom = int(round(dh + 0.1))
    left = int(round(dw - 0.1)) if center else 0
    right = int(round(dw + 0.1))
    img = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(pad_value,) * 3
    )

    out = dict(sample)
    out["img"] = img
    if len(sample.get("boxes", ())):
        b = sample["boxes"].copy()
        b[:, [0, 2]] = b[:, [0, 2]] * r + left
        b[:, [1, 3]] = b[:, [1, 3]] * r + top
        out["boxes"] = b
    if sample.get("mask") is not None:
        m = sample["mask"]
        if (m.shape[1], m.shape[0]) != new_unpad:
            m = cv2.resize(m, new_unpad, interpolation=cv2.INTER_NEAREST)
        m = cv2.copyMakeBorder(m, top, bottom, left, right, cv2.BORDER_CONSTANT, value=0)
        out["mask"] = m.astype(np.uint8)
    out["ratio_pad"] = (r, (left, top))
    return out


def random_flip(sample: Sample, rng: np.random.Generator, fliplr: float, flipud: float) -> Sample:
    """Horizontal/vertical flip of image + boxes + mask (reference :1549-1633)."""
    img = sample["img"]
    boxes = sample.get("boxes")
    mask = sample.get("mask")
    h, w = img.shape[:2]
    if flipud and rng.random() < flipud:
        img = np.flipud(img)
        if mask is not None:
            mask = np.flipud(mask)
        if boxes is not None and len(boxes):
            boxes = boxes.copy()
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    if fliplr and rng.random() < fliplr:
        img = np.fliplr(img)
        if mask is not None:
            mask = np.fliplr(mask)
        if boxes is not None and len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    out = dict(sample)
    out["img"] = np.ascontiguousarray(img)
    if boxes is not None:
        out["boxes"] = boxes
    if mask is not None:
        out["mask"] = np.ascontiguousarray(mask)
    return out


def random_hsv(
    sample: Sample, rng: np.random.Generator, hgain: float, sgain: float, vgain: float
) -> Sample:
    """HSV color jitter via LUTs (reference RandomHSV :1466)."""
    if not (hgain or sgain or vgain):
        return sample
    img = sample["img"]
    r = rng.uniform(-1, 1, 3) * (hgain, sgain, vgain) + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(256, dtype=np.int16)
    lut_h = ((x * r[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * r[2], 0, 255).astype(np.uint8)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    out = dict(sample)
    out["img"] = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return out


def _affine_matrix(
    rng: np.random.Generator,
    size: tuple[int, int],
    img_shape: tuple[int, int],
    degrees: float,
    translate: float,
    scale: float,
    shear: float,
    perspective: float,
) -> tuple[np.ndarray, float]:
    """Random C->P->R->S->T matrix, same composition as reference :1373-1415."""
    W, H = size
    C = np.eye(3, dtype=np.float32)
    C[0, 2] = -img_shape[1] / 2
    C[1, 2] = -img_shape[0] / 2
    P = np.eye(3, dtype=np.float32)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3, dtype=np.float32)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3, dtype=np.float32)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * W
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * H
    return T @ S @ R @ P @ C, s


def random_affine(
    sample: Sample,
    rng: np.random.Generator,
    cfg: AugmentConfig,
    border: tuple[int, int] = (0, 0),
) -> Sample:
    """Random perspective/affine warp of image + boxes + mask with one matrix.

    The mask is warped with the SAME matrix using INTER_NEAREST and zero
    border — the reference's key fork edit (augment.py:1373-1415).
    Degenerate boxes are filtered with the reference's candidate rule
    (w,h > 2px, aspect < 100, area ratio > 0.1).
    """
    img = sample["img"]
    h0, w0 = img.shape[:2]
    size = (w0 + border[1] * 2, h0 + border[0] * 2)  # (W, H) output
    M, s = _affine_matrix(
        rng, size, img.shape, cfg.degrees, cfg.translate, cfg.scale, cfg.shear, cfg.perspective
    )

    use_perspective = cfg.perspective != 0
    if use_perspective:
        img_w = cv2.warpPerspective(img, M, dsize=size, borderValue=(114, 114, 114))
    else:
        img_w = cv2.warpAffine(img, M[:2], dsize=size, borderValue=(114, 114, 114))

    out = dict(sample)
    out["img"] = img_w

    mask = sample.get("mask")
    if mask is not None:
        if use_perspective:
            mask_w = cv2.warpPerspective(
                mask, M, dsize=size, flags=cv2.INTER_NEAREST, borderValue=0
            )
        else:
            mask_w = cv2.warpAffine(
                mask, M[:2], dsize=size, flags=cv2.INTER_NEAREST, borderValue=0
            )
        out["mask"] = mask_w.astype(np.uint8)

    boxes = sample.get("boxes")
    cls = sample.get("cls")
    if boxes is not None and len(boxes):
        n = len(boxes)
        corners = np.ones((n * 4, 3), np.float32)
        corners[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        warped = corners @ M.T
        if use_perspective:
            warped = warped[:, :2] / warped[:, 2:3]
        else:
            warped = warped[:, :2]
        warped = warped.reshape(n, 8)
        xs = warped[:, [0, 2, 4, 6]]
        ys = warped[:, [1, 3, 5, 7]]
        new = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, size[0])
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, size[1])

        w1, h1 = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
        w2, h2 = new[:, 2] - new[:, 0], new[:, 3] - new[:, 1]
        ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
        keep = (
            (w2 > 2)
            & (h2 > 2)
            & (w2 * h2 / (w1 * h1 * s**2 + 1e-16) > 0.1)
            & (ar < 100)
        )
        out["boxes"] = new[keep].astype(np.float32)
        if cls is not None:
            out["cls"] = cls[keep]
    return out


def mosaic4(
    samples: Sequence[Sample], rng: np.random.Generator, imgsz: int
) -> Sample:
    """4-image mosaic on a 2x canvas; masks placed on the same canvas.

    Capability port of reference Mosaic._mosaic4 (augment.py:697-730 with the
    bin_mask fork edit): each of the 4 letterboxed-to-imgsz images lands in a
    quadrant around a jittered center; masks use 0 background.
    """
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
    mask_canvas = np.zeros((2 * s, 2 * s), np.uint8)
    has_mask = any(sm.get("mask") is not None for sm in samples)
    all_boxes, all_cls = [], []

    for i, sm in enumerate(samples):
        img = sm["img"]
        h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        if sm.get("mask") is not None:
            mask_canvas[y1a:y2a, x1a:x2a] = sm["mask"][y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(sm.get("boxes", ())):
            b = sm["boxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(sm["cls"])

    boxes = (
        np.concatenate(all_boxes).astype(np.float32) if all_boxes else np.zeros((0, 4), np.float32)
    )
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    return {
        "img": canvas,
        "boxes": boxes,
        "cls": cls,
        "mask": mask_canvas if has_mask else None,
    }


def mosaic3(samples: Sequence[Sample], rng: np.random.Generator, imgsz: int) -> Sample:
    """1x3 horizontal mosaic (reference Mosaic._mosaic3, augment.py:596-662
    with the bin_mask fork edit): main image centered on a 3s canvas, one
    image to its right, one to its left; final output is the centered 2s x 2s
    crop (border = -s//2), masks placed with the same offsets.
    """
    s = imgsz
    canvas = np.full((3 * s, 3 * s, 3), 114, np.uint8)
    mask_canvas = np.zeros((3 * s, 3 * s), np.uint8)
    has_mask = any(sm.get("mask") is not None for sm in samples[:3])
    all_boxes, all_cls = [], []
    h0 = w0 = 0
    for i, sm in enumerate(samples[:3]):
        img = sm["img"]
        h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = (s, s, s + w, s + h)
        elif i == 1:  # right of center
            c = (s + w0, s, s + w0 + w, s + h)
        else:  # left of center, bottom-aligned with it
            c = (s - w, s + h0 - h, s, s + h0)
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        canvas[y1:y2, x1:x2] = img[y1 - padh :, x1 - padw :]
        if sm.get("mask") is not None:
            mask_canvas[y1:y2, x1:x2] = sm["mask"][y1 - padh :, x1 - padw :]
        if len(sm.get("boxes", ())):
            b = sm["boxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(sm["cls"])
    boxes = (
        np.concatenate(all_boxes).astype(np.float32) if all_boxes else np.zeros((0, 4), np.float32)
    )
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    # centered 2s x 2s crop (reference border = [-s//2, -s//2])
    o = s // 2
    crop = canvas[o : o + 2 * s, o : o + 2 * s]
    mask_crop = mask_canvas[o : o + 2 * s, o : o + 2 * s]
    if len(boxes):
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - o).clip(0, 2 * s)
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - o).clip(0, 2 * s)
        keep = ((boxes[:, 2] - boxes[:, 0]) > 2) & ((boxes[:, 3] - boxes[:, 1]) > 2)
        boxes, cls = boxes[keep], cls[keep]
    return {
        "img": np.ascontiguousarray(crop),
        "boxes": boxes,
        "cls": cls,
        "mask": np.ascontiguousarray(mask_crop) if has_mask else None,
    }


def mosaic9(samples: Sequence[Sample], rng: np.random.Generator, imgsz: int) -> Sample:
    """9-image mosaic on a 3x canvas (reference Mosaic._mosaic9, augment.py:767-810),
    masks placed with the same offsets."""
    s = imgsz
    canvas = np.full((3 * s, 3 * s, 3), 114, np.uint8)
    mask_canvas = np.zeros((3 * s, 3 * s), np.uint8)
    has_mask = any(sm.get("mask") is not None for sm in samples)
    all_boxes, all_cls = [], []
    # 3x3 grid anchored at top-left of each cell
    for idx, sm in enumerate(samples[:9]):
        gy, gx = divmod(idx, 3)
        img = sm["img"]
        h, w = img.shape[:2]
        y0, x0 = gy * s, gx * s
        y1, x1 = min(y0 + h, 3 * s), min(x0 + w, 3 * s)
        canvas[y0:y1, x0:x1] = img[: y1 - y0, : x1 - x0]
        if sm.get("mask") is not None:
            mask_canvas[y0:y1, x0:x1] = sm["mask"][: y1 - y0, : x1 - x0]
        if len(sm.get("boxes", ())):
            b = sm["boxes"].copy()
            b[:, [0, 2]] += x0
            b[:, [1, 3]] += y0
            all_boxes.append(b)
            all_cls.append(sm["cls"])
    boxes = (
        np.concatenate(all_boxes).astype(np.float32) if all_boxes else np.zeros((0, 4), np.float32)
    )
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    # crop a random 2s x 2s window (center jitter), like the reference border crop
    oy = int(rng.integers(0, s))
    ox = int(rng.integers(0, s))
    crop = canvas[oy : oy + 2 * s, ox : ox + 2 * s]
    mask_crop = mask_canvas[oy : oy + 2 * s, ox : ox + 2 * s]
    if len(boxes):
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - ox).clip(0, 2 * s)
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - oy).clip(0, 2 * s)
        keep = ((boxes[:, 2] - boxes[:, 0]) > 2) & ((boxes[:, 3] - boxes[:, 1]) > 2)
        boxes, cls = boxes[keep], cls[keep]
    return {
        "img": np.ascontiguousarray(crop),
        "boxes": boxes,
        "cls": cls,
        "mask": np.ascontiguousarray(mask_crop) if has_mask else None,
    }


def mixup(a: Sample, b: Sample, rng: np.random.Generator) -> Sample:
    """Beta(32,32) image blend; masks max-combined (reference :954-960)."""
    lam = rng.beta(32.0, 32.0)
    img = (a["img"].astype(np.float32) * lam + b["img"].astype(np.float32) * (1 - lam)).astype(
        np.uint8
    )
    out = {
        "img": img,
        "boxes": np.concatenate([a["boxes"], b["boxes"]]).astype(np.float32),
        "cls": np.concatenate([a["cls"], b["cls"]]),
        "mask": None,
    }
    ma, mb = a.get("mask"), b.get("mask")
    if ma is not None and mb is not None:
        out["mask"] = np.maximum(ma, mb)
    elif ma is not None or mb is not None:
        out["mask"] = ma if ma is not None else mb
    return out


def cutmix(a: Sample, b: Sample, rng: np.random.Generator, beta: float = 1.0) -> Sample:
    """Paste a random crop of b into a; mask region replaced too (reference :1074-1081)."""
    h, w = a["img"].shape[:2]
    lam = rng.beta(beta, beta)
    cut_ratio = math.sqrt(1 - lam)
    cw, ch = int(w * cut_ratio), int(h * cut_ratio)
    cx, cy = rng.integers(0, w), rng.integers(0, h)
    x1, y1 = max(cx - cw // 2, 0), max(cy - ch // 2, 0)
    x2, y2 = min(cx + cw // 2, w), min(cy + ch // 2, h)
    img = a["img"].copy()
    img[y1:y2, x1:x2] = b["img"][y1:y2, x1:x2]

    # keep b's boxes that substantially lie inside the pasted window
    keep_b = np.zeros((0, 4), np.float32)
    cls_b = np.zeros((0,), np.float32)
    if len(b.get("boxes", ())):
        bx = b["boxes"]
        ix1 = np.maximum(bx[:, 0], x1)
        iy1 = np.maximum(bx[:, 1], y1)
        ix2 = np.minimum(bx[:, 2], x2)
        iy2 = np.minimum(bx[:, 3], y2)
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        area = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1]) + 1e-9
        sel = inter / area > 0.5
        keep_b = bx[sel]
        cls_b = b["cls"][sel]

    out = {
        "img": img,
        "boxes": np.concatenate([a["boxes"], keep_b]).astype(np.float32),
        "cls": np.concatenate([a["cls"], cls_b]),
        "mask": None,
    }
    ma, mb = a.get("mask"), b.get("mask")
    if ma is not None:
        m = ma.copy()
        if mb is not None:
            m[y1:y2, x1:x2] = mb[y1:y2, x1:x2]
        else:
            m[y1:y2, x1:x2] = 0
        out["mask"] = m
    return out


_ALBU_PIPELINE = None
_ALBU_CHECKED = False


def albumentations(sample: Sample, rng: np.random.Generator, p: float = 1.0) -> Sample:
    """Optional Albumentations pixel-transform adapter (reference
    augment.py:1931): Blur/MedianBlur/ToGray/CLAHE at p=0.01 each, applied to
    the image only (spatial layout untouched, so boxes and mask stay valid).
    Import-guarded — a no-op identity when the package is not installed
    (it is absent from this image's baked dependency set).
    """
    global _ALBU_PIPELINE, _ALBU_CHECKED
    if not _ALBU_CHECKED:
        _ALBU_CHECKED = True
        try:
            import albumentations as A

            _ALBU_PIPELINE = A.Compose(
                [
                    A.Blur(p=0.01),
                    A.MedianBlur(p=0.01),
                    A.ToGray(p=0.01),
                    A.CLAHE(p=0.01),
                    A.RandomBrightnessContrast(p=0.0),
                    A.RandomGamma(p=0.0),
                ]
            )
        except ImportError:
            _ALBU_PIPELINE = None
    if _ALBU_PIPELINE is None or rng.random() > p:
        return sample
    import random as _random

    _random.seed(int(rng.integers(0, 2**31)))  # albumentations draws from stdlib random
    out = dict(sample)
    out["img"] = _ALBU_PIPELINE(image=sample["img"])["image"]
    return out
