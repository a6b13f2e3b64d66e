"""Fused masked-pool kernel: parity with the XLA reference implementation.

The pallas path itself is exercised in interpret mode on CPU (the TPU
compiled path shares the same kernel body); gradients of the custom VJP are
checked against jax autodiff of the inline XLA implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mga_yolo_tpu.models.attention import masked_avg_pool, masked_max_pool
from mga_yolo_tpu.ops.pallas import masked_pool as mp


def _data(b=2, h=16, w=16, c=64, seed=0, tiny=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
    if tiny:
        m = jnp.zeros((b, h, w, 1), jnp.float32)
    else:
        m = jnp.asarray((rng.uniform(0, 1, (b, h, w, 1)) ** 2).astype(np.float32))
    return x, m


def _reference(x, m):
    return masked_avg_pool(x, m), masked_max_pool(x, m)


def test_xla_fallback_parity():
    x, m = _data()
    avg_f, max_f = mp.masked_pool_fused(x, m, use_pallas=False)
    avg_r, max_r = _reference(x, m)
    np.testing.assert_allclose(np.asarray(avg_f), np.asarray(avg_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(max_f), np.asarray(max_r), rtol=1e-5, atol=1e-6)


def test_tiny_mask_fallback_parity():
    x, m = _data(tiny=True)
    avg_f, max_f = mp.masked_pool_fused(x, m, use_pallas=False)
    avg_r, max_r = _reference(x, m)
    np.testing.assert_allclose(np.asarray(avg_f), np.asarray(avg_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(max_f), np.asarray(max_r), rtol=1e-5, atol=1e-6)


def test_pallas_interpret_parity():
    """Run the actual kernel body via the interpreter and compare."""
    x, m = _data(b=2, h=8, w=8, c=32)
    x2 = x.reshape(2, 64, 32)
    m2 = m.reshape(2, 64, 1)

    from jax.experimental import pallas as pl

    import mga_yolo_tpu.ops.pallas.masked_pool as mod

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    mod.pl.pallas_call = interp_call
    try:
        reds_k = mod._reductions_pallas(x2, m2, rows_tile=16)
    finally:
        mod.pl.pallas_call = orig
    reds_x = mod._reductions_xla(x2, m2)
    for a, b in zip(reds_k, reds_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    x, m = _data(b=2, h=8, w=8, c=16, seed=3)

    def f_fused(x, m):
        a, mx = mp.masked_pool_fused(x, m, use_pallas=False)
        return jnp.sum(a * 1.7) + jnp.sum(mx * 0.3)

    def f_ref(x, m):
        a = masked_avg_pool(x, m)
        mx = masked_max_pool(x, m)
        return jnp.sum(a * 1.7) + jnp.sum(mx * 0.3)

    gx_f, gm_f = jax.grad(f_fused, argnums=(0, 1))(x, m)
    gx_r, gm_r = jax.grad(f_ref, argnums=(0, 1))(x, m)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm_f), np.asarray(gm_r), rtol=1e-4, atol=1e-5)


def test_model_with_pallas_flag_builds():
    from mga_yolo_tpu.models.yolo import create_model

    model, _ = create_model("configs/models/yolov8_cbam.yaml", scale="n", use_pallas=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out["det"][0].shape[0] == 1


# ---------------------------------------------------------------- fused CAM


def _cam_params(c=32, r=16, seed=7):
    rng = np.random.default_rng(seed)
    h = max(1, c // r)
    return (
        jnp.asarray(rng.normal(0, 0.2, (c, h)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (h,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (h, c)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (c,)).astype(np.float32)),
    )


def _cam_manual(x, m, w1, b1, w2, b2):
    """Inline composition matching MaskCBAM's XLA CAM branch."""
    avg = masked_avg_pool(x, m)
    mx = masked_max_pool(x, m)

    def mlp(d):
        return jnp.maximum(d @ w1 + b1, 0.0) @ w2 + b2

    return jax.nn.sigmoid(mlp(avg) + mlp(mx))


def test_cam_gate_xla_fallback_parity():
    x, m = _data(c=32)
    w1, b1, w2, b2 = _cam_params()
    got = mp.cam_gate_fused(x, m, w1, b1, w2, b2, use_pallas=False)
    want = _cam_manual(x, m, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_cam_gate_kernel_interpret_parity():
    """Actual fused kernel body (reductions + MLP + sigmoid) via interpreter."""
    x, m = _data(b=2, h=8, w=8, c=32)
    w1, b1, w2, b2 = _cam_params()

    from jax.experimental import pallas as pl

    import mga_yolo_tpu.ops.pallas.masked_pool as mod

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    mod.pl.pallas_call = interp_call
    try:
        got = mod._cam_gate_pallas(
            x.reshape(2, 64, 32), m.reshape(2, 64, 1), w1, b1, w2, b2,
            tiny_thr=1e-4, eps=1e-6, rows_tile=16,
        )
    finally:
        mod.pl.pallas_call = orig
    want = _cam_manual(x, m, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cam_gate_vjp_matches_autodiff():
    x, m = _data(b=2, h=8, w=8, c=16, seed=5)
    w1, b1, w2, b2 = _cam_params(c=16)

    def f_fused(x, m, w1, b1, w2, b2):
        return jnp.sum(mp.cam_gate_fused(x, m, w1, b1, w2, b2, use_pallas=False) * 1.3)

    def f_ref(x, m, w1, b1, w2, b2):
        return jnp.sum(_cam_manual(x, m, w1, b1, w2, b2) * 1.3)

    g_f = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4, 5))(x, m, w1, b1, w2, b2)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(x, m, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_cbam_module_fused_path_matches_xla(tmp_path):
    """MaskCBAM with use_pallas=True (CPU -> XLA fallback inside
    cam_gate_fused) must equal use_pallas=False bit-for-bit given the same
    params — proves the param plumbing through get_variable is right."""
    from mga_yolo_tpu.models.attention import MaskCBAM

    rngk = jax.random.PRNGKey(0)
    x, m = _data(b=2, h=8, w=8, c=32, seed=9)
    mod_x = MaskCBAM(channels=32, use_pallas=False)
    mod_p = MaskCBAM(channels=32, use_pallas=True)
    variables = mod_x.init(rngk, x, m)
    out_x = mod_x.apply(variables, x, m)
    out_p = mod_p.apply(variables, x, m)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-6)
