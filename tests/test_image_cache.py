"""Image cache modes (reference `cache: ram|disk`, base.py:131-143).

- "ram": eager decoded-image cache; samples identical to uncached, and
  mutating a returned sample must not corrupt the cache.
- "disk": .npy sidecars written next to the images (reference
  cache_images_to_disk) and loaded back pixel-identical.
- config surface: True -> ram, "disk" survives the YAML bool coercion.
"""

from pathlib import Path

import numpy as np
import pytest

from mga_yolo_tpu.config import load_config
from mga_yolo_tpu.data.dataset import MGADataset, resolve_cache_mode
from tests.synth import create_synthetic_dataset


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cacheds")
    create_synthetic_dataset(root, n=4, size=64)
    return root


def _cfg(root: Path, cache):
    return load_config({"data": str(root / "data.yaml"), "imgsz": 64,
                        "max_boxes": 4, "cache": cache})


def test_resolve_cache_mode():
    assert resolve_cache_mode(False) is None
    assert resolve_cache_mode(None) is None
    assert resolve_cache_mode(True) == "ram"
    assert resolve_cache_mode("ram") == "ram"
    assert resolve_cache_mode("disk") == "disk"
    assert resolve_cache_mode("none") is None


def test_cache_yaml_coercion(ds_root):
    # load_config normalizes via resolve_cache_mode (True -> "ram") so the
    # string modes never pass through the generic bool coercion
    assert _cfg(ds_root, "disk").data.cache == "disk"
    assert _cfg(ds_root, True).data.cache == "ram"
    assert _cfg(ds_root, "false").data.cache is False
    # the cache special case must not leak into other bool fields
    from mga_yolo_tpu.config import load_config

    assert load_config({"rect": "disk"}).data.rect is False


def test_ram_cache_matches_uncached(ds_root):
    plain = MGADataset(_cfg(ds_root, False), split="train", augment=False)
    ram = MGADataset(_cfg(ds_root, True), split="train", augment=False)
    assert ram.cache_mode == "ram" and len(ram._cache) == len(ram)
    for i in range(len(plain)):
        a, b = plain.load_raw(i), ram.load_raw(i)
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
        if a["mask"] is not None:
            np.testing.assert_array_equal(a["mask"], b["mask"])
    # mutating a returned sample must not poison the cache
    s = ram.load_raw(0)
    s["img"][:] = 0
    assert ram.load_raw(0)["img"].any()


def test_eval_final_sample_memo(ds_root):
    plain = MGADataset(_cfg(ds_root, False), split="train", augment=False)
    ram = MGADataset(_cfg(ds_root, True), split="train", augment=False)
    a = plain.get(1)
    b1 = ram.get(1)
    assert (1, (64, 64)) in ram._final_cache
    b2 = ram.get(1)
    for k in ("image", "gt_boxes", "gt_labels", "mask_gt", "index"):
        np.testing.assert_array_equal(a[k], b1[k])
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    for m_a, m_b in zip(a["masks"], b1["masks"]):
        np.testing.assert_array_equal(m_a, m_b)


def test_disk_cache_sidecars(ds_root):
    plain = MGADataset(_cfg(ds_root, False), split="train", augment=False)
    disk = MGADataset(_cfg(ds_root, "disk"), split="train", augment=False)
    assert disk.cache_mode == "disk"
    sidecars = [disk._npy_sidecar(i) for i in range(len(disk))]
    assert all(p.exists() for p in sidecars)
    for i in range(len(plain)):
        np.testing.assert_array_equal(plain.load_raw(i)["img"], disk.load_raw(i)["img"])
    # a second dataset reuses the sidecars (no rewrite: mtimes unchanged)
    mtimes = [p.stat().st_mtime_ns for p in sidecars]
    again = MGADataset(_cfg(ds_root, "disk"), split="train", augment=False)
    assert [p.stat().st_mtime_ns for p in sidecars] == mtimes
    np.testing.assert_array_equal(
        again.load_raw(0)["img"], plain.load_raw(0)["img"]
    )
    for p in sidecars:
        p.unlink()
