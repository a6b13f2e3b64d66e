"""Native C++ mask-ops kernels: build + parity with the numpy reference paths."""

import numpy as np
import pytest

from mga_yolo_tpu import native
from mga_yolo_tpu.data import mask_ops


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _np_block_max(m, k):
    h, w = m.shape
    ph, pw = (-h) % k, (-w) % k
    mp = np.pad(m, ((0, ph), (0, pw)))
    H, W = mp.shape
    return mp.reshape(H // k, k, W // k, k).max(axis=(1, 3))


def test_block_reduce_parity(lib):
    rng = np.random.default_rng(0)
    m = (rng.uniform(0, 1, (100, 130)) > 0.8).astype(np.uint8)
    for k in (8, 16, 32):
        np.testing.assert_array_equal(native.block_reduce_max(m, k), _np_block_max(m, k))
        mean_native = native.block_reduce_mean(m, k)
        h, w = m.shape
        ph, pw = (-h) % k, (-w) % k
        mp = np.pad(m, ((0, ph), (0, pw))).astype(np.float32)
        H, W = mp.shape
        mean_np = mp.reshape(H // k, k, W // k, k).mean(axis=(1, 3))
        np.testing.assert_allclose(mean_native, mean_np, atol=1e-6)


def test_thin_parity(lib):
    m = np.zeros((64, 64), np.uint8)
    m[10:50, 20:26] = 1  # thick bar
    sk_native = native.zhang_suen_thin(m)
    sk_np = mask_ops.zhang_suen_thin(m)
    np.testing.assert_array_equal(sk_native, sk_np)
    # 1-px wide: interior rows (skeleton endpoints erode) have exactly one pixel
    rows = sk_native[15:45].sum(axis=1)
    assert (rows == 1).all()


def test_rasterize_edges(lib):
    edges = np.array([[0, 0, 32, 32]], np.int32)  # fine-coords diagonal
    out = np.zeros((8, 8), np.uint8)
    assert native.rasterize_edges(edges, 4, out)
    # projected (0,0) -> (8,8): clipped diagonal should be set
    assert out[0, 0] == 1
    for i in range(8):
        assert out[i, i] == 1


def test_skeleton_bresenham_uses_native(lib):
    """End-to-end strict path still preserves connectivity with native kernels."""
    from mga_yolo_tpu.config import MaskPipelineConfig

    m = np.zeros((128, 128), np.uint8)
    for i in range(118):
        m[i + 4, i + 4] = 1
        m[i + 5, i + 4] = 1
    cfg = MaskPipelineConfig(method="skeleton_bresenham", skeleton_strict=True)
    for stride in (8, 16, 32):
        out = mask_ops.downsample_mask(m, stride, cfg)
        assert mask_ops.connected_components(out) == 1
