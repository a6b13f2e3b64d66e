"""Device-side augmentation (data/device_augment.py) vs the host cv2 pipeline.

The host path is itself alignment-tested against the reference fork's
augment.py (test_data_pipeline.py), so host/device equivalence here chains to
reference parity. Both paths consume the same np.random.Generator stream, so
given one seed the geometry must match exactly; pixel values may differ by a
grey level (float bilinear/HSV vs cv2's fixed-point tables).
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from mga_yolo_tpu.config import MGAConfig, MaskPipelineConfig
from mga_yolo_tpu.data import device_augment as DA
from mga_yolo_tpu.data import mask_ops
from mga_yolo_tpu.data import transforms as T
from mga_yolo_tpu.data.dataset import MGADataset
from mga_yolo_tpu.data.loader import DataLoader
from tests.synth import create_synthetic_dataset


def _cfg(data_yaml, **aug) -> MGAConfig:
    cfg = MGAConfig()
    cfg.data.data = str(data_yaml)
    cfg.data.imgsz = 64
    cfg.data.max_boxes = 16
    for k, v in aug.items():
        setattr(cfg.augment, k, v)
    return cfg


# ---------------- unit: warp kernels vs cv2 ----------------


@pytest.mark.parametrize("perspective", [0.0, 0.0005])
def test_warp_bilinear_matches_cv2(perspective):
    rng = np.random.default_rng(0)
    img = cv2.GaussianBlur(rng.integers(0, 256, (96, 96, 3)).astype(np.uint8), (5, 5), 1.5)
    M, _ = T._affine_matrix(
        np.random.default_rng(1), (64, 64), img.shape, 10.0, 0.1, 0.5, 5.0, perspective
    )
    minv = np.linalg.inv(M.astype(np.float64)).astype(np.float32)
    if perspective:
        ref = cv2.warpPerspective(img, M, (64, 64), borderValue=(114,) * 3)
    else:
        ref = cv2.warpAffine(img, M[:2], (64, 64), borderValue=(114,) * 3)
    out = DA._warp_bilinear(jnp.asarray(img), jnp.asarray(minv), (64, 64), bool(perspective))
    out = np.clip(np.floor(np.asarray(out) + 0.5), 0, 255).astype(np.uint8)
    d = np.abs(out.astype(int) - ref.astype(int))
    # measured bit-exact on this input; allow one grey level of headroom for
    # cv2's 5-bit fixed-point interpolation weights on other platforms
    assert d.max() <= 1, d.max()


def test_warp_nearest_matches_cv2():
    rng = np.random.default_rng(0)
    mask = cv2.dilate(
        (rng.uniform(0, 1, (96, 96)) > 0.7).astype(np.uint8), np.ones((3, 3), np.uint8)
    )
    M, _ = T._affine_matrix(
        np.random.default_rng(2), (64, 64), (96, 96, 3), 10.0, 0.1, 0.5, 5.0, 0.0
    )
    minv = np.linalg.inv(M.astype(np.float64)).astype(np.float32)
    ref = cv2.warpAffine(mask, M[:2], (64, 64), flags=cv2.INTER_NEAREST, borderValue=0)
    out = np.asarray(
        DA._warp_nearest(jnp.asarray(mask[..., None]), jnp.asarray(minv), (64, 64), False)
    )
    assert (out != ref).mean() < 0.005  # measured 0 — rounding headroom only


def test_hsv_jitter_matches_cv2_luts():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    for trial in range(3):
        r = (np.random.default_rng(trial).uniform(-1, 1, 3) * (0.015, 0.7, 0.4) + 1).astype(
            np.float32
        )

        class _R:  # feeds random_hsv exactly our gains
            def uniform(self, a, b, n):
                return (r - 1) / np.array([0.015, 0.7, 0.4])

        ref = T.random_hsv({"img": img.copy()}, _R(), 0.015, 0.7, 0.4)["img"]
        out = np.asarray(
            DA._hsv_jitter(jnp.asarray(img, jnp.float32), jnp.asarray(r))
        ).astype(np.uint8)
        d = np.abs(out.astype(int) - ref.astype(int))
        # float HSV math vs cv2's fixed-point conversion tables
        assert np.percentile(d, 99) <= 2 and d.mean() < 1.0, (d.mean(), d.max())


# ---------------- unit: mask pyramid parity (exact) ----------------


@pytest.mark.parametrize(
    "method,bridge,prob,pm",
    [
        ("maxpool", False, False, ""),
        ("area", True, False, ""),
        ("area", False, False, ""),
        ("nearest", False, False, ""),
        ("skeleton_bresenham", True, False, ""),
        ("skeleton_bresenham", False, False, ""),
        ("area", False, True, "area"),
        ("area", False, True, "avgpool"),
        ("area", False, True, "nearest"),
    ],
)
def test_downsample_batch_matches_mask_ops(method, bridge, prob, pm):
    rng = np.random.default_rng(0)
    m = (rng.uniform(0, 1, (64, 64)) > 0.8).astype(np.uint8)
    mcfg = MaskPipelineConfig(
        method=method, bridge=bridge, prob_mode=prob, prob_method=pm or "area", thresh=0.0
    )
    mb = jnp.asarray(m[None].astype(np.float32))
    for st in (8, 16, 32):
        ref = (
            mask_ops.downsample_mask_prob(m, st, pm)
            if prob
            else mask_ops.downsample_mask(m, st, mcfg).astype(np.float32)
        )
        out = np.asarray(DA.downsample_batch(mb, st, mcfg))[0]
        np.testing.assert_allclose(out, ref, atol=1e-6)


# ---------------- capability gating ----------------


def test_supported_gating(tmp_path):
    data_yaml = create_synthetic_dataset(tmp_path, n=2, size=48)
    ok, _ = DA.supported(_cfg(data_yaml))  # default: skeleton_bresenham non-strict
    assert ok
    for field, val in (("mixup", 0.2), ("cutmix", 0.2), ("albumentations", 0.5)):
        cfg = _cfg(data_yaml, **{field: val})
        ok, why = DA.supported(cfg)
        assert not ok and why
    cfg = _cfg(data_yaml)
    cfg.mask.skeleton_strict = True
    ok, why = DA.supported(cfg)
    assert not ok and "host-only" in why
    cfg = _cfg(data_yaml)
    cfg.mask.prob_mode = True  # default prob_method=area is device-able
    assert DA.supported(cfg)[0]


# ---------------- end-to-end: host pipeline vs device program ----------------


@pytest.mark.parametrize("use_mosaic", [True, False])
def test_device_augment_equals_host_pipeline(tmp_path, use_mosaic):
    data_yaml = create_synthetic_dataset(tmp_path, n=6, size=80, seed=3)
    cfg = _cfg(
        data_yaml, degrees=10.0, shear=3.0, flipud=0.3, mosaic=0.7
    )  # fractional mosaic: mixed batch exercises the plain-in-2S embed
    ds = MGADataset(cfg, "train", augment=True)
    aug_fn = DA.make_augment_fn(cfg, cfg.data.max_boxes)

    hosts, raws = [], []
    for i in range(6):
        seed = 1000 + i
        hosts.append(ds.get(i, np.random.default_rng(seed), use_mosaic=use_mosaic))
        raws.append(DA.build_raw_sample(ds, i, np.random.default_rng(seed), use_mosaic))
    batch = DA.collate_raw(raws)
    cm = DA.canvas_multiplier(cfg.augment, use_mosaic)
    assert batch["canvas"].shape[1] == cm * cfg.data.imgsz
    out = aug_fn(batch, batch["canvas"].shape[1] // cm)

    for i, host in enumerate(hosts):
        np.testing.assert_allclose(
            np.asarray(out["gt_boxes"][i]), host["gt_boxes"], atol=1e-3
        )
        assert (np.asarray(out["gt_labels"][i]) == host["gt_labels"]).all()
        assert (np.asarray(out["mask_gt"][i]) == host["mask_gt"]).all()
        d = np.abs(np.asarray(out["image"][i]).astype(int) - host["image"].astype(int))
        assert d.max() <= 2 and d.mean() < 1.0, (i, d.mean(), d.max())
        for k in range(3):
            np.testing.assert_array_equal(
                np.asarray(out["masks"][k][i])[..., 0], host["masks"][k][..., 0]
            )


def test_trainer_on_device_smoke(tmp_path):
    """2-epoch train with augment.on_device: epoch 0 runs mosaic (2S canvas),
    epoch 1 hits close_mosaic (S canvas) — both jit specializations execute."""
    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.train.trainer import MGATrainer

    data_yaml = create_synthetic_dataset(tmp_path / "ds", n=8, size=96)
    cfg = load_config(
        {
            "data": str(data_yaml),
            "imgsz": 64,
            "max_boxes": 8,
            "batch": 4,
            "epochs": 2,
            "close_mosaic": 1,
            "mosaic": 1.0,
            "on_device": True,
            "workers": 2,
            "val": False,
            "plots": False,
            "project": str(tmp_path / "runs"),
            "name": "devaug",
        }
    )
    trainer = MGATrainer(cfg)
    assert trainer._dev_augment is not None and trainer.train_loader.raw_mode
    trainer.train()
    import csv

    rows = list(csv.DictReader(open(cfg.save_dir / "results.csv")))
    assert len(rows) == 2
    tot = [float(r["train/det/total"]) + float(r["train/seg/total"]) for r in rows]
    assert all(np.isfinite(tot))


def test_loader_raw_mode_shapes(tmp_path):
    data_yaml = create_synthetic_dataset(tmp_path, n=4, size=48)
    cfg = _cfg(data_yaml)
    ds = MGADataset(cfg, "train", augment=True)
    loader = DataLoader(ds, batch_size=4, workers=2, seed=0)
    loader.raw_mode = True
    batch = next(iter(loader))
    S = cfg.data.imgsz
    assert batch["canvas"].shape == (4, 2 * S, 2 * S, 3) and batch["canvas"].dtype == np.uint8
    assert batch["mask_canvas"].shape == (4, 2 * S, 2 * S)
    assert batch["pboxes"].shape == (4, 2 * cfg.data.max_boxes, 4)
    assert batch["mfwd"].shape == (4, 3, 3) and batch["minv"].shape == (4, 3, 3)
    assert batch["hsv"].shape == (4, 3) and batch["flips"].shape == (4, 2)
