"""Host-side mask pyramid downsampling (numpy/cv2).

Same capability set as the reference mask pipeline
(`/root/reference/mga_yolo/utils/mask_utils.py:64-142` downsample_mask,
`:14-48` downsample_mask_prob, `mga_yolo/utils/mask_downsample.py:117-247`
connectivity-preserving path), driven by the typed
:class:`~mga_yolo_tpu.config.MaskPipelineConfig` instead of env vars.

Methods:
    binary:  nearest | area(+thresh+bridge) | maxpool | pyrdown |
             gaussian_maxpool | skeleton_bresenham (relaxed = maxpool+close;
             strict = thin to 1-px skeleton, project nodes to the coarse grid
             and rasterize 8-neighbor skeleton edges with Bresenham lines so
             thin vessel structures stay connected at /8, /16, /32)
    prob:    area | avgpool | nearest -> float32 in [0, 1]

This runs on CPU inside the input pipeline workers; it never touches the TPU.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict, Optional, Sequence

import cv2
import numpy as np

from mga_yolo_tpu.config import MaskPipelineConfig
from mga_yolo_tpu import native

_CLOSE_KERNEL = np.ones((3, 3), np.uint8)


def infer_mask_path(im_file: str | Path, data_root: Optional[str], masks_dir: Optional[str]) -> Optional[Path]:
    """{data_root}/{masks_dir}/{image_stem}.{png,jpg,...} (reference mask_utils.py:52-61)."""
    if not data_root or not masks_dir:
        return None
    stem = Path(im_file).stem
    base = Path(data_root) / masks_dir
    for ext in (".png", ".jpg", ".jpeg", ".tif", ".tiff"):
        p = base / f"{stem}{ext}"
        if p.exists():
            return p
    return None


def load_binary_mask(path: str | Path) -> np.ndarray:
    """Grayscale read, >0 -> 1 (reference dataset.py:27-72)."""
    m = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if m is None:
        raise FileNotFoundError(path)
    return (m > 0).astype(np.uint8)


def _coarse_shape(h: int, w: int, stride: int) -> tuple[int, int]:
    return math.ceil(h / stride), math.ceil(w / stride)


def _block_reduce_max(m: np.ndarray, k: int) -> np.ndarray:
    out = native.block_reduce_max(m, k)
    if out is not None:
        return out
    h, w = m.shape
    ph, pw = (-h) % k, (-w) % k
    if ph or pw:
        m = np.pad(m, ((0, ph), (0, pw)))
    H, W = m.shape
    return m.reshape(H // k, k, W // k, k).max(axis=(1, 3))


def _block_reduce_mean(m: np.ndarray, k: int) -> np.ndarray:
    out = native.block_reduce_mean((m > 0).astype(np.uint8), k)
    if out is not None:
        return out
    h, w = m.shape
    ph, pw = (-h) % k, (-w) % k
    if ph or pw:
        m = np.pad(m, ((0, ph), (0, pw)))
    H, W = m.shape
    return m.reshape(H // k, k, W // k, k).astype(np.float32).mean(axis=(1, 3))


def zhang_suen_thin(mask: np.ndarray, max_iters: int = 10000) -> np.ndarray:
    """Thin a binary mask to a 1-px-wide skeleton (Zhang–Suen, vectorized).

    Pure-numpy implementation of the classic two-subiteration algorithm; used
    when neither cv2.ximgproc nor scikit-image is available, and as the
    default deterministic backend.
    """
    img = np.pad((mask > 0).astype(np.uint8), 1)
    for _ in range(max_iters):
        changed = False
        for step in (0, 1):
            p = img
            # 8-neighborhood in Zhang–Suen order P2..P9 (N, NE, E, SE, S, SW, W, NW)
            n = [
                p[:-2, 1:-1], p[:-2, 2:], p[1:-1, 2:], p[2:, 2:],
                p[2:, 1:-1], p[2:, :-2], p[1:-1, :-2], p[:-2, :-2],
            ]
            b = sum(x.astype(np.int32) for x in n)
            a = sum(
                ((n[i] == 0) & (n[(i + 1) % 8] == 1)).astype(np.int32) for i in range(8)
            )
            cond = (p[1:-1, 1:-1] == 1) & (b >= 2) & (b <= 6) & (a == 1)
            if step == 0:
                cond &= (n[0] * n[2] * n[4] == 0) & (n[2] * n[4] * n[6] == 0)
            else:
                cond &= (n[0] * n[2] * n[6] == 0) & (n[0] * n[4] * n[6] == 0)
            if cond.any():
                img[1:-1, 1:-1][cond] = 0
                changed = True
        if not changed:
            break
    return img[1:-1, 1:-1].astype(bool)


def skeletonize(mask: np.ndarray) -> np.ndarray:
    """Best-available thinning backend (cv2.ximgproc > native C++ > skimage > numpy)."""
    img = (mask > 0).astype(np.uint8)
    if hasattr(cv2, "ximgproc") and hasattr(cv2.ximgproc, "thinning"):
        return cv2.ximgproc.thinning(img, thinningType=cv2.ximgproc.THINNING_ZHANGSUEN).astype(bool)
    out = native.zhang_suen_thin(img)
    if out is not None:
        return out
    try:
        from skimage.morphology import thin

        return thin(img.astype(bool))
    except ImportError:
        return zhang_suen_thin(img)


def skeleton_edges(skel: np.ndarray) -> np.ndarray:
    """(N, 4) int array of (y0, x0, y1, x1) 8-neighbor skeleton edges.

    Each undirected neighbor direction (E, S, SE, SW) is tested once with an
    array shift, so no per-pixel python loops.
    """
    s = skel.astype(bool)
    out = []
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        if dx >= 0:
            a = s[: s.shape[0] - dy, : s.shape[1] - dx]
            b = s[dy:, dx:]
            off = (0, 0)
        else:
            a = s[: s.shape[0] - dy, -dx:]
            b = s[dy:, :dx]
            off = (0, -dx)
        ys, xs = np.nonzero(a & b)
        if ys.size:
            y0, x0 = ys, xs + off[1]
            y1, x1 = ys + dy, xs + off[1] + dx
            out.append(np.stack([y0, x0, y1, x1], axis=1))
    if not out:
        return np.empty((0, 4), np.int32)
    return np.concatenate(out).astype(np.int32)


def _skeleton_bresenham_from(
    skel: np.ndarray, edges: np.ndarray, shape: tuple[int, int], stride: int, bridge: bool
) -> np.ndarray:
    hc, wc = _coarse_shape(shape[0], shape[1], stride)
    out = np.zeros((hc, wc), np.uint8)
    ys, xs = np.nonzero(skel)
    if ys.size == 0:
        return out
    out[ys // stride, xs // stride] = 1
    # Rasterize skeleton edges on the coarse grid so connectivity survives.
    if not native.rasterize_edges(edges, stride, out):
        coarse = edges // stride
        moved = (coarse[:, 0] != coarse[:, 2]) | (coarse[:, 1] != coarse[:, 3])
        for y0, x0, y1, x1 in coarse[moved]:
            cv2.line(out, (int(x0), int(y0)), (int(x1), int(y1)), 1, 1)
    if bridge:
        out = cv2.morphologyEx(out, cv2.MORPH_CLOSE, _CLOSE_KERNEL)
    return out


def downsample_mask(mask: np.ndarray, stride: int, cfg: MaskPipelineConfig) -> np.ndarray:
    """Binary downsample by ``stride`` (uint8 {0,1})."""
    m = (mask > 0).astype(np.uint8)
    if stride <= 1:
        return m
    h, w = m.shape
    hc, wc = _coarse_shape(h, w, stride)
    method = cfg.method.lower()

    if method == "nearest":
        return cv2.resize(m, (wc, hc), interpolation=cv2.INTER_NEAREST)
    if method == "area":
        small = cv2.resize(m, (wc, hc), interpolation=cv2.INTER_AREA)
        out = (small > cfg.thresh).astype(np.uint8)
        return cv2.morphologyEx(out, cv2.MORPH_CLOSE, _CLOSE_KERNEL) if cfg.bridge else out
    if method == "maxpool":
        return _block_reduce_max(m, stride).astype(np.uint8)
    if method == "pyrdown" and stride & (stride - 1) == 0:
        out, s = m.copy(), stride
        while s > 1:
            out = cv2.pyrDown(out)
            s //= 2
        out = (out > 0).astype(np.uint8)
        return cv2.morphologyEx(out, cv2.MORPH_CLOSE, _CLOSE_KERNEL) if cfg.bridge else out
    if method == "gaussian_maxpool":
        sigma = stride / 2.0
        blurred = cv2.GaussianBlur(
            m.astype(np.float32), (0, 0), sigmaX=sigma, sigmaY=sigma, borderType=cv2.BORDER_REFLECT
        )
        pooled = _block_reduce_max(blurred, stride)
        thr = cfg.thresh if cfg.thresh > 0 else 0.2
        return (pooled >= thr).astype(np.uint8)

    # skeleton_bresenham (default)
    if not cfg.skeleton_strict:
        out = _block_reduce_max(m, stride).astype(np.uint8)
        return cv2.morphologyEx(out, cv2.MORPH_CLOSE, _CLOSE_KERNEL) if cfg.bridge else out
    skel = skeletonize(m)
    return _skeleton_bresenham_from(skel, skeleton_edges(skel), m.shape, stride, cfg.bridge)


def downsample_mask_multi(
    mask: np.ndarray, strides: Sequence[int], cfg: MaskPipelineConfig
) -> Dict[int, np.ndarray]:
    """Multi-stride variant sharing one skeletonization (reference :193-236)."""
    if cfg.method.lower() == "skeleton_bresenham" and cfg.skeleton_strict:
        m = (mask > 0).astype(np.uint8)
        skel = skeletonize(m)
        edges = skeleton_edges(skel)
        return {s: _skeleton_bresenham_from(skel, edges, m.shape, s, cfg.bridge) for s in strides}
    return {s: downsample_mask(mask, s, cfg) for s in strides}


def downsample_mask_prob(mask: np.ndarray, stride: int, method: str = "area") -> np.ndarray:
    """Probabilistic downsample: block foreground fraction, float32 in [0,1]."""
    m = (mask > 0).astype(np.uint8)
    if stride <= 1:
        return m.astype(np.float32)
    h, w = m.shape
    hc, wc = _coarse_shape(h, w, stride)
    if method == "avgpool":
        return _block_reduce_mean(m, stride)
    if method == "nearest":
        return cv2.resize(m, (wc, hc), interpolation=cv2.INTER_NEAREST).astype(np.float32)
    out = cv2.resize(m, (wc, hc), interpolation=cv2.INTER_AREA)
    return np.clip(out.astype(np.float32), 0.0, 1.0)


def connected_components(mask: np.ndarray, connectivity: int = 8) -> int:
    n, _ = cv2.connectedComponents((mask > 0).astype(np.uint8), connectivity=connectivity)
    return int(n - 1)
