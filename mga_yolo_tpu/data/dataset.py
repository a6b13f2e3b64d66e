"""YOLO-format detection dataset with per-image binary masks.

Capability port of the reference data stack (`MGADataset`
`/root/reference/mga_yolo/data/dataset.py:22-174`, `YOLODataset`/`BaseDataset`
in the vendored engine): YOLO txt labels, stem-matched mask discovery, the
full mask-synced augmentation pipeline, and pyramid mask downsampling to
strides 8/16/32.

TPU-first differences:
* Every sample is emitted at **fixed static shapes** — image (S, S, 3) uint8,
  GT padded to ``max_boxes``, masks exactly (S/s, S/s, 1) — so the jitted
  train step never recompiles and no ragged collate is needed (the reference
  pads masks to the per-batch max, dataset.py:149-169).
* Images stay uint8 through host->device transfer; normalization to [0,1]
  happens on-device (halves PCIe/DMA bytes).
* The letterboxed mask size is computed exactly from the letterbox geometry
  instead of the reference's fragile ``ori_shape + stride`` heuristic
  (reference dataset.py:79-89; SURVEY.md §7 hard-part 7).
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Iterator, Optional, Sequence

import cv2
import numpy as np
import yaml

from mga_yolo_tpu.config import MGAConfig, resolve_cache_mode
from mga_yolo_tpu.data import mask_ops, transforms as T

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}
STRIDES = (8, 16, 32)


def _resolve(root: Optional[str], p: str) -> Path:
    path = Path(p)
    if not path.is_absolute() and root:
        path = Path(root) / p
    return path


def list_images(source: Path) -> list[Path]:
    if source.is_file() and source.suffix == ".txt":
        base = source.parent
        out = []
        for line in source.read_text().splitlines():
            line = line.strip()
            if line:
                out.append(_resolve(str(base), line))
        return out
    if source.is_dir():
        return sorted(p for p in source.rglob("*") if p.suffix.lower() in IMG_EXTS)
    raise FileNotFoundError(f"image source not found: {source}")


def _exif_orientation(app1: bytes) -> int:
    """Orientation (1-8) from a JPEG APP1/EXIF segment body, 0 if absent."""
    if app1[:6] != b"Exif\x00\x00":
        return 0
    tiff = app1[6:]
    if len(tiff) < 8:
        return 0
    bo = "little" if tiff[:2] == b"II" else "big" if tiff[:2] == b"MM" else None
    if bo is None:
        return 0
    ifd = int.from_bytes(tiff[4:8], bo)
    if len(tiff) < ifd + 2:
        return 0
    n = int.from_bytes(tiff[ifd : ifd + 2], bo)
    for i in range(n):
        e = ifd + 2 + 12 * i
        if len(tiff) < e + 12:
            return 0
        if int.from_bytes(tiff[e : e + 2], bo) == 0x0112:  # Orientation tag
            v = int.from_bytes(tiff[e + 8 : e + 10], bo)
            return v if 1 <= v <= 8 else 0
    return 0


def image_size(path: Path) -> tuple[int, int]:
    """(h, w) from the file header without decoding pixels (PNG/JPEG/BMP);
    cv2 full-decode fallback for anything else. Used by rect bucketing,
    mirroring the reference's `verify_image_label` shape pass."""
    try:
        with open(path, "rb") as f:
            head = f.read(32)
            if head[:8] == b"\x89PNG\r\n\x1a\n":  # IHDR: w,h big-endian at 16
                w = int.from_bytes(head[16:20], "big")
                h = int.from_bytes(head[20:24], "big")
                return h, w
            if head[:2] == b"BM":  # BITMAPINFOHEADER at offset 18
                import struct

                w, h = struct.unpack("<ii", head[18:26])
                return abs(h), abs(w)
            if head[:2] == b"\xff\xd8":  # JPEG: scan for SOFn marker
                # cv2.imread applies EXIF rotation at decode time, so the
                # header dims must be swapped for orientations 5-8 or
                # EXIF-rotated files land in the wrong rect aspect bucket
                # (wide binned as tall); mirrors the reference's `exif_size`
                # (`/root/reference/.../ultralytics/data/utils.py`).
                f.seek(2)
                orient = 1
                while True:
                    marker = f.read(2)
                    if len(marker) < 2 or marker[0] != 0xFF:
                        break
                    if 0xC0 <= marker[1] <= 0xCF and marker[1] not in (0xC4, 0xC8, 0xCC):
                        f.read(3)
                        h = int.from_bytes(f.read(2), "big")
                        w = int.from_bytes(f.read(2), "big")
                        return (w, h) if orient >= 5 else (h, w)
                    seg_len = int.from_bytes(f.read(2), "big")
                    if marker[1] == 0xE1 and seg_len >= 16:  # APP1/EXIF
                        seg = f.read(seg_len - 2)
                        orient = _exif_orientation(seg) or orient
                    else:
                        f.seek(seg_len - 2, 1)
    except OSError:
        pass
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return img.shape[0], img.shape[1]


def rect_bucket_shapes(imgsz: int) -> list[tuple[int, int]]:
    """Static (h, w) aspect buckets for rect batching, /32-aligned: wide
    (h < w), square, tall (h > w). A small fixed set bounds XLA compiles to
    one per bucket; letterbox into the closest-ratio bucket minimizes pad
    waste while keeping every shape static."""
    def r32(x: float) -> int:
        return max(32, int(math.ceil(x / 32)) * 32)

    fracs = (0.5, 0.75)
    wide = [(r32(imgsz * q), imgsz) for q in fracs]
    tall = [(imgsz, r32(imgsz * q)) for q in reversed(fracs)]
    return wide + [(imgsz, imgsz)] + tall


def label_path_for(img_path: Path) -> Path:
    """images/.../x.jpg -> labels/.../x.txt (standard YOLO layout)."""
    parts = list(img_path.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return Path(*parts).with_suffix(".txt")


def parse_yolo_label_file(path: Path) -> np.ndarray:
    """YOLO txt -> (N, 5) float32 rows [cls, cx, cy, w, h] (normalized)."""
    if not path.exists():
        return np.zeros((0, 5), np.float32)
    rows = []
    for line in path.read_text().splitlines():
        vals = line.split()
        if len(vals) >= 5:
            rows.append([float(v) for v in vals[:5]])
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 5), np.float32)


def rows_to_labels(rows: np.ndarray, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    """(N,5) normalized rows -> (cls (N,), boxes (N,4) xyxy px)."""
    if not len(rows):
        return np.zeros((0,), np.float32), np.zeros((0, 4), np.float32)
    cls = rows[:, 0].astype(np.float32)
    cx, cy, bw, bh = rows[:, 1] * w, rows[:, 2] * h, rows[:, 3] * w, rows[:, 4] * h
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    return cls, boxes.astype(np.float32)


def load_yolo_labels(path: Path, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    """YOLO txt (cls cx cy w h, normalized) -> (cls (N,), boxes (N,4) xyxy px)."""
    return rows_to_labels(parse_yolo_label_file(path), w, h)


LABEL_CACHE_VERSION = 1


def load_labels_cached(img_files: list[Path], split: str) -> list[np.ndarray]:
    """Parse all label files once, memoized on disk (reference label cache,
    `data/dataset.py:49-318`: a versioned cache file keyed by a hash of the
    label set, so labels are not re-parsed every epoch/process).

    The cache lives next to the first label file as
    ``.mga_labels_{split}.cache.npz``; any mtime/size/path change of any
    label file invalidates it. IO failures fall back to direct parsing.
    """
    import hashlib

    lbl_paths = [label_path_for(p) for p in img_files]
    if not lbl_paths:
        return []
    h = hashlib.sha1(f"v{LABEL_CACHE_VERSION}".encode())
    for p in lbl_paths:
        st = p.stat() if p.exists() else None
        h.update(str(p).encode())
        h.update(str(st.st_mtime_ns if st else 0).encode())
        h.update(str(st.st_size if st else -1).encode())
    key = h.hexdigest()
    cache_path = lbl_paths[0].parent / f".mga_labels_{split}.cache.npz"

    try:
        if cache_path.exists():
            z = np.load(cache_path, allow_pickle=False)
            if str(z["key"]) == key:
                flat, lengths = z["flat"], z["lengths"]
                out, off = [], 0
                for n in lengths:
                    out.append(flat[off : off + n].reshape(n, 5))
                    off += n
                return out
    except Exception:
        pass

    labels = [parse_yolo_label_file(p) for p in lbl_paths]
    try:
        flat = (
            np.concatenate([l.reshape(-1) for l in labels])
            if labels else np.zeros((0,), np.float32)
        )
        lengths = np.asarray([len(l) for l in labels], np.int64)
        np.savez(cache_path, key=key, flat=flat.astype(np.float32), lengths=lengths)
    except Exception:
        pass  # read-only label dir: parse-per-init still works
    return labels


def check_cache_ram(sample_bytes: int, n: int, safety: float = 1.1) -> bool:
    """True when ``n`` decoded images (est. ``sample_bytes`` each) fit in
    available RAM with a safety margin (reference base.py check_cache_ram)."""
    try:
        avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return False
    return sample_bytes * n * safety < avail


def check_cache_disk(sample_bytes: int, n: int, path: Path, safety: float = 1.1) -> bool:
    """True when ``n`` .npy sidecars fit in the filesystem holding ``path``
    (reference base.py check_cache_disk)."""
    import shutil

    try:
        free = shutil.disk_usage(path).free
    except OSError:
        return False
    return sample_bytes * n * safety < free


class MGADataset:
    """Image + boxes + binary-mask dataset producing fixed-shape samples."""

    def __init__(self, cfg: MGAConfig, split: str = "train", augment: bool = True):
        self.cfg = cfg
        self.split = split
        self.augment = augment
        self.imgsz = cfg.data.imgsz
        self.max_boxes = cfg.data.max_boxes

        with open(cfg.data.data) as f:
            dy = yaml.safe_load(f)
        root = dy.get("path") or dy.get("dataset")
        self.dataset_root = cfg.data.dataset_root or dy.get("dataset") or root
        self.masks_dir = cfg.data.masks_dir or dy.get("masks_dir")
        self.names = dy.get("names", {0: "object"})
        src = dy.get(split) or dy.get("val")
        self.img_files = list_images(_resolve(root, src))
        if cfg.data.fraction < 1.0:
            n = max(1, int(len(self.img_files) * cfg.data.fraction))
            self.img_files = self.img_files[:n]
        self.mask_paths = [
            mask_ops.infer_mask_path(p, self.dataset_root, self.masks_dir) for p in self.img_files
        ]
        # on-disk label cache: all label txts parsed once per label-set hash
        self._labels = load_labels_cached(self.img_files, split)
        self._cache: dict[int, tuple] = {}
        self._final_cache: dict[tuple, dict] = {}  # eval-mode processed samples
        self._aug_dumped = 0

        # image cache (reference base.py:131-143 `cache: ram|disk`):
        # "ram"  — decode every image+mask once up front into memory,
        # "disk" — persist the decoded image as a .npy sidecar (skips JPEG/PNG
        #          decode on every epoch; survives across runs).
        # Either mode is disabled with a warning when the resource check
        # fails, matching the reference's check_cache_{ram,disk} behavior.
        self.cache_mode = resolve_cache_mode(cfg.data.cache)
        if self.cache_mode and len(self.img_files):
            probe = cv2.imread(str(self.img_files[0]))
            est = probe.nbytes if probe is not None else 8_000_000
            n = len(self.img_files)
            if self.cache_mode == "ram":
                # eval datasets additionally memoize the processed sample
                # (letterboxed image + mask pyramid), roughly doubling the
                # per-image footprint — budget for it up front
                est_ram = est * (1 if augment else 2)
                if not check_cache_ram(est_ram, n):
                    import logging

                    logging.getLogger("mga.data").warning(
                        "cache='ram' needs ~%.1f GB for %d images but less is "
                        "free; caching disabled (use cache='disk')",
                        est_ram * n * 1.1 / 2**30, n,
                    )
                    self.cache_mode = None
            elif self.cache_mode == "disk":
                # only the sidecars that don't exist yet need free space —
                # a warm restart over a fully-built cache must not disable it
                missing = sum(
                    1 for i in range(n) if not self._npy_sidecar(i).exists()
                )
                if missing and not check_cache_disk(
                    est, missing, self.img_files[0].parent
                ):
                    import logging

                    logging.getLogger("mga.data").warning(
                        "cache='disk' needs ~%.1f GB free next to the images; "
                        "caching disabled", est * missing * 1.1 / 2**30
                    )
                    self.cache_mode = None
        if self.cache_mode:
            self._cache_images()

        # rectangular batching (reference `rect: True` val,
        # dataset.py set_rectangle): instead of the reference's per-batch
        # dynamic shapes, images are binned into a small STATIC set of
        # /32-aligned aspect buckets so each bucket compiles exactly once on
        # TPU; the loader forms batches within a bucket.
        self.rect = bool(cfg.data.rect) and not augment
        self.bucket: Optional[np.ndarray] = None
        self.bucket_shapes: list[tuple[int, int]] = []
        if self.rect:
            self.bucket_shapes = rect_bucket_shapes(self.imgsz)
            log_b = np.log([h / w for h, w in self.bucket_shapes])
            ars = np.array([
                (lambda hw: hw[0] / hw[1])(image_size(p)) for p in self.img_files
            ])
            self.bucket = np.abs(np.log(ars)[:, None] - log_b[None, :]).argmin(1)

    def __len__(self) -> int:
        return len(self.img_files)

    # ---- raw sample loading ----

    def _npy_sidecar(self, i: int) -> Path:
        # decoded image saved next to the original (reference
        # cache_images_to_disk, base.py:199-203). The reference uses
        # <stem>.npy, which collides when a.jpg and a.png coexist — we keep
        # the full name (<name>.<ext>.npy) so each file gets its own sidecar.
        p = self.img_files[i]
        return p.with_name(p.name + ".npy")

    def _decode_image(self, i: int) -> np.ndarray:
        path = self.img_files[i]
        if self.cache_mode == "disk":
            npy = self._npy_sidecar(i)
            if npy.exists():
                try:
                    return np.load(npy)
                except (OSError, ValueError):
                    npy.unlink(missing_ok=True)  # corrupt sidecar: re-decode
        img = cv2.imread(str(path))
        if img is None:
            raise FileNotFoundError(path)
        return img

    def _cache_images(self) -> None:
        """Eagerly populate the cache (reference base.py cache_images)."""
        from concurrent.futures import ThreadPoolExecutor

        n = len(self.img_files)
        workers = max(1, min(8, self.cfg.data.workers))
        if self.cache_mode == "ram":
            with ThreadPoolExecutor(max_workers=workers) as pool:
                # drain without accumulating: keeping the returned copies
                # would transiently double the RAM the check budgeted
                for _ in pool.map(self.load_raw, range(n)):
                    pass
        else:  # disk: write missing .npy sidecars once

            def write(i: int) -> None:
                npy = self._npy_sidecar(i)
                if not npy.exists():
                    img = cv2.imread(str(self.img_files[i]))
                    if img is not None:
                        np.save(str(npy), img)

            with ThreadPoolExecutor(max_workers=workers) as pool:
                list(pool.map(write, range(n)))

    def load_raw(self, i: int) -> T.Sample:
        if self.cache_mode == "ram" and i in self._cache:
            img, cls, boxes, mask = self._cache[i]
            return {"img": img.copy(), "cls": cls.copy(), "boxes": boxes.copy(),
                    "mask": None if mask is None else mask.copy()}
        img = self._decode_image(i)
        h, w = img.shape[:2]
        cls, boxes = rows_to_labels(self._labels[i], w, h)
        if self.cfg.data.single_cls:
            cls = np.zeros_like(cls)
        mask = None
        mp = self.mask_paths[i]
        if mp is not None:
            mask = mask_ops.load_binary_mask(mp)
            if mask.shape[:2] != (h, w):
                mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
        if self.cache_mode == "ram":
            self._cache[i] = (img, cls, boxes, mask)
            return {"img": img.copy(), "cls": cls.copy(), "boxes": boxes.copy(),
                    "mask": None if mask is None else mask.copy()}
        return {"img": img, "cls": cls, "boxes": boxes, "mask": mask}

    # ---- augmentation pipeline ----

    def _train_sample(
        self, i: int, rng: np.random.Generator, use_mosaic: bool, size: Optional[int] = None
    ) -> T.Sample:
        aug = self.cfg.augment
        s = size or self.imgsz
        if use_mosaic and rng.random() < aug.mosaic:
            n = aug.mosaic_n if aug.mosaic_n in (3, 4, 9) else 4
            idxs = [i] + list(rng.integers(0, len(self), n - 1))
            parts = [
                T.letterbox(self.load_raw(j), s, scaleup=True, center=False) for j in idxs
            ]
            mosaic_fn = {3: T.mosaic3, 4: T.mosaic4, 9: T.mosaic9}[n]
            sample = mosaic_fn(parts, rng, s)
            border = (-s // 2, -s // 2)
            sample = T.random_affine(sample, rng, aug, border=border)
            if aug.mixup and rng.random() < aug.mixup:
                other = self._train_sample(int(rng.integers(0, len(self))), rng, use_mosaic, s)
                sample = T.mixup(sample, other, rng)
            elif aug.cutmix and rng.random() < aug.cutmix:
                other = self._train_sample(int(rng.integers(0, len(self))), rng, use_mosaic, s)
                sample = T.cutmix(sample, other, rng)
        else:
            sample = T.letterbox(self.load_raw(i), s, scaleup=True)
            sample = T.random_affine(sample, rng, aug)
        if aug.albumentations:
            # reference order: Albumentations before HSV/flip (v8_transforms)
            sample = T.albumentations(sample, rng, aug.albumentations)
        sample = T.random_hsv(sample, rng, aug.hsv_h, aug.hsv_s, aug.hsv_v)
        sample = T.random_flip(sample, rng, aug.fliplr, aug.flipud)
        return sample

    def get(
        self,
        i: int,
        rng: Optional[np.random.Generator] = None,
        use_mosaic: bool = True,
        imgsz: Optional[int] = None,
    ) -> dict:
        """One fixed-shape training/val sample (numpy).

        ``imgsz`` overrides the configured size for bucketed multi-scale
        training (reference `multi_scale`, models/yolo/detect/train.py:92-118 —
        on TPU the sizes come from a small static bucket set so each bucket
        compiles once).
        """
        size = imgsz or self.imgsz
        if self.augment:
            rng = rng or np.random.default_rng()
            sample = self._train_sample(i, rng, use_mosaic, size)
            return self.finalize(sample, i, imgsz=size)
        shape = self.bucket_shapes[self.bucket[i]] if self.rect else (size, size)
        # eval samples are deterministic per (i, shape): with cache="ram" the
        # fully-processed sample (letterbox + GT pad + mask pyramid) is
        # memoized, so per-epoch validation skips decode+resize entirely.
        # Consumers never mutate samples (collate np.stack copies), so the
        # cached arrays are shared, not copied.
        if self.cache_mode == "ram":
            key = (i, shape)
            hit = self._final_cache.get(key)
            if hit is None:
                sample = T.letterbox(self.load_raw(i), shape, scaleup=False)
                hit = self.finalize(sample, i, shape=shape)
                self._final_cache[key] = hit
            return dict(hit)
        sample = T.letterbox(self.load_raw(i), shape, scaleup=False)
        return self.finalize(sample, i, shape=shape)

    def finalize(
        self,
        sample: T.Sample,
        index: int = -1,
        imgsz: Optional[int] = None,
        shape: Optional[tuple[int, int]] = None,
    ) -> dict:
        """Pad GT, build the mask pyramid, emit static-shape arrays.

        ``shape`` is an (h, w) rect-bucket target; otherwise square ``imgsz``.
        """
        hs, ws = shape if shape is not None else ((imgsz or self.imgsz),) * 2
        img = sample["img"]
        assert img.shape[:2] == (hs, ws), f"pipeline produced {img.shape}, expected {(hs, ws)}"

        n = min(len(sample.get("boxes", ())), self.max_boxes)
        gt_boxes = np.zeros((self.max_boxes, 4), np.float32)
        gt_cls = np.zeros((self.max_boxes,), np.int32)
        gt_valid = np.zeros((self.max_boxes,), np.float32)
        if n:
            order = np.arange(len(sample["boxes"]))[:n]
            gt_boxes[:n] = sample["boxes"][order]
            gt_cls[:n] = sample["cls"][order].astype(np.int32)
            gt_valid[:n] = 1.0

        mask = sample.get("mask")
        mcfg = self.cfg.mask
        if mcfg.save_aug_masks and self._aug_dumped < mcfg.save_max and mask is not None:
            # debug dump of augmented image/mask pairs
            # (reference MGA_SAVE_AUG_MASKS, dataset.py:106-131)
            dump = Path(self.cfg.train.project) / self.cfg.train.name / "aug_debug"
            dump.mkdir(parents=True, exist_ok=True)
            n = self._aug_dumped
            cv2.imwrite(str(dump / f"aug_{n}_img.png"), img)
            cv2.imwrite(str(dump / f"aug_{n}_mask.png"), (mask * 255).astype(np.uint8))
            self._aug_dumped += 1
        masks = []
        if mask is None:
            mask = np.zeros((hs, ws), np.uint8)
        if mcfg.prob_mode:
            pyr = {
                st: mask_ops.downsample_mask_prob(mask, st, mcfg.prob_method) for st in STRIDES
            }
        else:
            pyr = mask_ops.downsample_mask_multi(mask, STRIDES, mcfg)
        for st in STRIDES:
            m = pyr[st].astype(np.float32)
            hw = (hs // st, ws // st)
            if m.shape != hw:  # defensive: ceil vs exact division
                m = cv2.resize(m, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)
            masks.append(m[..., None])

        return {
            "image": np.ascontiguousarray(img),          # (S,S,3) uint8 BGR
            "gt_boxes": gt_boxes,                        # (M,4) xyxy px
            "gt_labels": gt_cls,                         # (M,)
            "mask_gt": gt_valid,                         # (M,)
            "masks": masks,                              # [(S/8,S/8,1), (S/16..), (S/32..)]
            "index": np.int32(index),
        }


def collate(samples: Sequence[dict]) -> dict:
    """Stack fixed-shape samples into a batch of numpy arrays."""
    out = {
        "image": np.stack([s["image"] for s in samples]),
        "gt_boxes": np.stack([s["gt_boxes"] for s in samples]),
        "gt_labels": np.stack([s["gt_labels"] for s in samples]),
        "mask_gt": np.stack([s["mask_gt"] for s in samples]),
        "index": np.stack([s["index"] for s in samples]),
    }
    out["masks"] = [
        np.stack([s["masks"][k] for s in samples]) for k in range(len(samples[0]["masks"]))
    ]
    return out
