"""Data pipeline tests: mask ops, transforms, dataset, loader."""

import numpy as np
import pytest

from mga_yolo_tpu.config import MGAConfig, MaskPipelineConfig, load_config
from mga_yolo_tpu.data import mask_ops
from mga_yolo_tpu.data import transforms as T
from mga_yolo_tpu.data.dataset import MGADataset, collate
from mga_yolo_tpu.data.loader import DataLoader
from tests.synth import create_synthetic_dataset


# ---------------- mask ops ----------------


def test_downsample_methods_shapes():
    m = np.zeros((64, 64), np.uint8)
    m[10:30, 10:30] = 1
    for method in ("nearest", "area", "maxpool", "pyrdown", "gaussian_maxpool", "skeleton_bresenham"):
        cfg = MaskPipelineConfig(method=method)
        out = mask_ops.downsample_mask(m, 8, cfg)
        assert out.shape == (8, 8), method
        assert out.dtype == np.uint8
        assert out.max() <= 1


def test_skeleton_strict_preserves_connectivity():
    # thin diagonal vessel, 1-2 px wide
    m = np.zeros((128, 128), np.uint8)
    for i in range(118):
        m[i + 4, i + 4] = 1
        m[i + 5, i + 4] = 1
    assert mask_ops.connected_components(m) == 1
    cfg = MaskPipelineConfig(method="skeleton_bresenham", skeleton_strict=True)
    for stride in (8, 16, 32):
        out = mask_ops.downsample_mask(m, stride, cfg)
        assert out.any()
        assert mask_ops.connected_components(out) == 1, f"stride {stride} broke the vessel"


def test_downsample_prob_range():
    m = np.zeros((64, 64), np.uint8)
    m[0:4, 0:4] = 1  # exactly half of one 8x8 block? -> 16/64 = 0.25
    p = mask_ops.downsample_mask_prob(m, 8, "avgpool")
    assert p.shape == (8, 8)
    assert abs(float(p[0, 0]) - 16 / 64) < 1e-6
    assert float(p.max()) <= 1.0 and float(p.min()) >= 0.0


def test_multi_matches_single():
    rng = np.random.default_rng(1)
    m = (rng.uniform(0, 1, (96, 96)) > 0.8).astype(np.uint8)
    cfg = MaskPipelineConfig(method="skeleton_bresenham", skeleton_strict=True)
    multi = mask_ops.downsample_mask_multi(m, (8, 16, 32), cfg)
    for s in (8, 16, 32):
        single = mask_ops.downsample_mask(m, s, cfg)
        np.testing.assert_array_equal(multi[s], single)


# ---------------- transforms ----------------


def _toy_sample(size=80):
    img = np.zeros((size, size, 3), np.uint8)
    img[20:40, 30:60] = 200
    mask = np.zeros((size, size), np.uint8)
    mask[20:40, 30:60] = 1
    boxes = np.array([[30, 20, 60, 40]], np.float32)
    cls = np.array([0.0], np.float32)
    return {"img": img, "boxes": boxes, "cls": cls, "mask": mask}


def test_letterbox_alignment():
    s = _toy_sample(80)
    out = T.letterbox(s, 128)
    assert out["img"].shape == (128, 128, 3)
    assert out["mask"].shape == (128, 128)
    # mask must cover exactly the bright image region
    bright = (out["img"][..., 0] > 100).astype(np.uint8)
    inter = (bright & out["mask"]).sum()
    union = (bright | out["mask"]).sum()
    assert inter / union > 0.95


def test_flip_alignment():
    rng = np.random.default_rng(0)
    s = _toy_sample(64)
    out = T.random_flip(s, rng, fliplr=1.0, flipud=1.0)
    x1, y1, x2, y2 = out["boxes"][0].astype(int)
    sub = out["mask"][y1:y2, x1:x2]
    assert sub.mean() > 0.99  # box still frames the mask after both flips
    assert out["mask"].sum() == s["mask"].sum()


def test_affine_mask_follows_image():
    from mga_yolo_tpu.config import AugmentConfig

    rng = np.random.default_rng(3)
    s = _toy_sample(96)
    cfg = AugmentConfig(degrees=15, translate=0.1, scale=0.3, shear=5)
    out = T.random_affine(s, rng, cfg)
    bright = (out["img"][..., 0] > 150).astype(np.uint8)
    m = out["mask"]
    if m.sum() > 0:
        inter = (bright & m).sum()
        assert inter / m.sum() > 0.9  # warped mask stays glued to warped square


def test_mosaic4_shapes():
    rng = np.random.default_rng(0)
    parts = [T.letterbox(_toy_sample(64), 64, center=False) for _ in range(4)]
    out = T.mosaic4(parts, rng, 64)
    assert out["img"].shape == (128, 128, 3)
    assert out["mask"].shape == (128, 128)
    assert len(out["boxes"]) >= 1


# ---------------- dataset + loader ----------------


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthds")
    data_yaml = create_synthetic_dataset(root, n=6, size=96)
    cfg = load_config(
        {"data": str(data_yaml), "imgsz": 64, "max_boxes": 8, "batch": 2, "mosaic": 0.5}
    )
    return cfg


def test_dataset_fixed_shapes(synth_cfg):
    ds = MGADataset(synth_cfg, "train", augment=True)
    assert len(ds) == 6
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["image"].shape == (64, 64, 3) and s["image"].dtype == np.uint8
    assert s["gt_boxes"].shape == (8, 4)
    assert s["gt_labels"].shape == (8,)
    assert s["mask_gt"].shape == (8,)
    assert [m.shape for m in s["masks"]] == [(8, 8, 1), (4, 4, 1), (2, 2, 1)]
    assert s["mask_gt"].sum() >= 1


def test_val_mask_alignment(synth_cfg):
    """GT boxes should frame mask-positive regions after val letterboxing."""
    ds = MGADataset(synth_cfg, "val", augment=False)
    s = ds.get(1)
    n = int(s["mask_gt"].sum())
    # P3 mask (stride 8): each valid box center should land on/near mask
    m = s["masks"][0][..., 0]
    hits = 0
    for b in s["gt_boxes"][:n]:
        cx = int((b[0] + b[2]) / 2 / 8)
        cy = int((b[1] + b[3]) / 2 / 8)
        region = m[max(0, cy - 1) : cy + 2, max(0, cx - 1) : cx + 2]
        hits += region.max() > 0
    assert hits == n


def test_loader_batches_and_sharding(synth_cfg):
    ds = MGADataset(synth_cfg, "train", augment=True)
    dl = DataLoader(ds, batch_size=4, seed=0, workers=2)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["masks"][0].shape == (4, 8, 8, 1)

    # sharded loaders partition the same global batch deterministically
    dl0 = DataLoader(ds, batch_size=4, seed=0, workers=1, num_shards=2, shard_index=0)
    dl1 = DataLoader(ds, batch_size=4, seed=0, workers=1, num_shards=2, shard_index=1)
    b0, b1 = next(iter(dl0)), next(iter(dl1))
    assert b0["image"].shape == (2, 64, 64, 3)
    joint = np.sort(np.concatenate([b0["index"], b1["index"]]))
    np.testing.assert_array_equal(joint, np.sort(b["index"]))


def test_loader_deterministic(synth_cfg):
    ds = MGADataset(synth_cfg, "train", augment=True)
    a = next(iter(DataLoader(ds, batch_size=4, seed=7, workers=2)))
    b = next(iter(DataLoader(ds, batch_size=4, seed=7, workers=2)))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])


def test_multiscale_buckets(synth_cfg):
    ds = MGADataset(synth_cfg, "train", augment=True)
    dl = DataLoader(ds, batch_size=2, seed=0, workers=1, drop_last=False)
    dl.size_buckets = [64, 128]
    sizes = set()
    for epoch in range(4):
        dl.set_epoch(epoch)
        for b in dl:
            s = b["image"].shape[1]
            sizes.add(s)
            assert b["image"].shape[1] == b["image"].shape[2]
            assert b["masks"][0].shape[1] == s // 8
            assert b["masks"][2].shape[1] == s // 32
    assert sizes == {64, 128}


def test_mosaic3_shapes_and_alignment():
    """mosaic3 (reference augment.py:596-662): 2s output, mask glued to image."""
    rng = np.random.default_rng(1)
    parts = [T.letterbox(_toy_sample(64), 64, center=False) for _ in range(3)]
    out = T.mosaic3(parts, rng, 64)
    assert out["img"].shape == (128, 128, 3)
    assert out["mask"].shape == (128, 128)
    assert len(out["boxes"]) >= 1
    # the toy sample's bright square and its mask must coincide on the canvas
    bright = (out["img"][..., 0] > 150).astype(np.uint8)
    m = out["mask"]
    assert m.sum() > 0
    assert (bright & m).sum() / m.sum() > 0.9


def test_albumentations_identity_without_dep():
    """Import-guarded adapter: exact identity when the dep is missing
    (this image has no albumentations), never an error."""
    rng = np.random.default_rng(0)
    s = _toy_sample(64)
    out = T.albumentations(s, rng, p=1.0)
    try:
        import albumentations  # noqa: F401
        # dep present: output is a valid image of the same shape
        assert out["img"].shape == s["img"].shape
    except ImportError:
        np.testing.assert_array_equal(out["img"], s["img"])


def test_label_cache_roundtrip(tmp_path):
    """On-disk label cache (reference data/dataset.py:49-318): second load
    hits the cache file; label edits invalidate it."""
    from mga_yolo_tpu.data import dataset as D

    data_yaml = create_synthetic_dataset(tmp_path, n=3, size=64)
    cfg = load_config({"data": str(data_yaml), "imgsz": 64, "max_boxes": 4})
    ds1 = MGADataset(cfg, "train", augment=False)
    cache_files = list((tmp_path / "labels" / "train").glob(".mga_labels_*.cache.npz"))
    assert len(cache_files) == 1
    labels_direct = [D.parse_yolo_label_file(D.label_path_for(p)) for p in ds1.img_files]
    ds2 = MGADataset(cfg, "train", augment=False)  # loads from cache
    for a, b in zip(ds2._labels, labels_direct):
        np.testing.assert_array_equal(a, b)
    # invalidation: rewrite one label file -> cache rebuilt with new content
    lp = D.label_path_for(ds1.img_files[0])
    lp.write_text("0 0.5 0.5 0.25 0.25\n")
    ds3 = MGADataset(cfg, "train", augment=False)
    np.testing.assert_allclose(ds3._labels[0], [[0, 0.5, 0.5, 0.25, 0.25]])
