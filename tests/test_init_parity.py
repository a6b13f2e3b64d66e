"""Init-distribution parity with the torch reference.

The reference keeps torch's *default* Conv2d/Linear init for every
backbone/neck/head conv (initialize_weights leaves Conv2d untouched,
reference `utils/torch_utils.py:564-574`): kaiming_uniform(a=sqrt(5)) ==
U(-1/sqrt(fan_in), +1/sqrt(fan_in)).  Flax's default (lecun_normal) has 3x
the variance; that mismatch was the top suspect for the residual mAP50-95
training-parity gap (BASELINE.md round 2).  These tests pin the corrected
distributions so a regression is loud.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _uniform_stats(arr, fan_in):
    """Return (is_bounded, std_ratio) vs U(+-1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    a = np.asarray(arr)
    expected_std = bound / np.sqrt(3.0)
    return float(np.abs(a).max()) <= bound * 1.0001, float(a.std() / expected_std)


def test_convbn_kernel_matches_torch_default():
    from mga_yolo_tpu.models.layers import ConvBN

    m = ConvBN(64, k=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 32)))
    k = v["params"]["conv"]["kernel"]  # (3,3,32,64)
    fan_in = 3 * 3 * 32
    bounded, ratio = _uniform_stats(k, fan_in)
    assert bounded, "kernel exceeds torch kaiming_uniform(a=sqrt(5)) bound"
    assert 0.9 < ratio < 1.1, f"kernel std off by {ratio:.3f}x vs torch default"


def test_cbam_dense_matches_torch_linear_default():
    from mga_yolo_tpu.models.attention import MaskCBAM

    C = 128
    m = MaskCBAM(channels=C)
    v = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, C)), jnp.zeros((1, 8, 8, 1))
    )
    fc1 = v["params"]["cam_fc1"]
    bounded, ratio = _uniform_stats(fc1["kernel"], C)
    assert bounded and 0.85 < ratio < 1.15
    # torch Linear bias: U(+-1/sqrt(fan_in)) as well
    b_bounded, _ = _uniform_stats(fc1["bias"], C)
    assert b_bounded
    assert float(np.abs(np.asarray(fc1["bias"])).max()) > 0, "bias should not be all-zero"


def test_mask_head_keeps_kaiming_fan_out():
    # MGAMaskHead explicitly uses Kaiming-normal fan_out in the reference
    # (segmentation.py:96-105) — must NOT be switched to the torch default.
    from mga_yolo_tpu.models.heads import MGAMaskHead

    m = MGAMaskHead(hidden=64)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256)))
    k = np.asarray(v["params"]["proj"]["kernel"])  # (1,1,256,64), fan_out=64
    expected_std = np.sqrt(2.0 / 64)
    assert 0.85 < k.std() / expected_std < 1.15
    assert np.allclose(np.asarray(v["params"]["head"]["bias"]), 0.0)
