"""Parity: Pallas fused-DFL backward kernel vs the jnp reference VJP.

The kernel (ops/pallas/dfl_bwd.py) must reproduce losses/detection.py
``_dfl_decode_ce_bwd``'s jnp math exactly (same f32 softmax, same
interpolated one-hot target) — interpret mode runs the kernel on CPU so the
parity holds in CI without a TPU.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mga_yolo_tpu.losses.detection import _dfl_decode_primal, _dfl_interp
from mga_yolo_tpu.ops.pallas.dfl_bwd import HAS_PALLAS, dfl_decode_ce_bwd_pallas


def _reference_dz(pd, ltrb, g_ltrb, g_ce, target):
    """The jnp branch of _dfl_decode_ce_bwd, inlined (keeps the test
    independent of the env-gated dispatch in the product code)."""
    reg_max = pd.shape[-1]
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    tl, tr, wl, wr = _dfl_interp(target.astype(jnp.float32), reg_max)
    p = jax.nn.softmax(pd.astype(jnp.float32), axis=-1)
    idx = jnp.arange(reg_max, dtype=jnp.int32)
    q = (
        jnp.where(idx == tl[..., None], wl[..., None], 0)
        + jnp.where(idx == tr[..., None], wr[..., None], 0)
    )
    g_side = (g_ce / 4.0)[..., None, None]
    dz = p * ((proj - ltrb[..., None]) * g_ltrb[..., None] + g_side) - q * g_side
    return dz.astype(pd.dtype)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dfl_bwd_kernel_matches_jnp(dtype):
    rng = np.random.default_rng(0)
    B, A, R = 2, 84, 16  # B*A*4*R = 10752 = 84 rows of 128
    pd = jnp.asarray(rng.normal(0, 3, (B, A, 4, R)), dtype)
    ltrb = _dfl_decode_primal(pd)
    g_ltrb = jnp.asarray(rng.normal(0, 1, (B, A, 4)), jnp.float32)
    g_ce = jnp.asarray(rng.uniform(0, 2, (B, A)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)
    # integer targets exercise the wl/wr == {1,0} edge; large/small logits
    # exercise the softmax max-subtraction
    target = target.at[0, :4].set(jnp.floor(target[0, :4]))
    pd = pd.at[0, 0].set(40.0).at[0, 1].set(-40.0)

    want = _reference_dz(pd, ltrb, g_ltrb, g_ce, target)
    got = dfl_decode_ce_bwd_pallas(pd, jnp.float32(1) * ltrb.astype(jnp.float32),
                                   g_ltrb, g_ce, target, interpret=True)
    assert got.dtype == pd.dtype and got.shape == pd.shape
    # bf16 output: an f32 intermediate one ulp apart can land on the other
    # side of a bf16 rounding boundary -> allow one bf16 ulp
    rtol, atol = (2e-6, 2e-6) if dtype == jnp.float32 else (8e-3, 2e-4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=rtol, atol=atol,
    )


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_dfl_bwd_kernel_ragged_rows():
    """M not a multiple of the 512-row tile: the pad/crop path."""
    rng = np.random.default_rng(1)
    B, A, R = 1, 1050, 16  # M = 1050*4*16/128 = 525 -> grid 2, pad 499
    pd = jnp.asarray(rng.normal(0, 2, (B, A, 4, R)), jnp.float32)
    ltrb = _dfl_decode_primal(pd)
    g_ltrb = jnp.asarray(rng.normal(0, 1, (B, A, 4)), jnp.float32)
    g_ce = jnp.asarray(rng.uniform(0, 2, (B, A)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)
    want = _reference_dz(pd, ltrb, g_ltrb, g_ce, target)
    got = dfl_decode_ce_bwd_pallas(pd, ltrb, g_ltrb, g_ce, target, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dfl_bwd_planar_kernel_matches_jnp(dtype):
    """v2 kernel (planar (4,B,A) aux, (nseg,M) zero-pad packing) must equal
    the jnp reference exactly like v1 — same math, different packing."""
    from mga_yolo_tpu.ops.pallas.dfl_bwd import dfl_decode_ce_bwd_pallas_planar

    rng = np.random.default_rng(2)
    B, A, R = 2, 84, 16
    pd = jnp.asarray(rng.normal(0, 3, (B, A, 4, R)), dtype)
    ltrb = _dfl_decode_primal(pd).astype(jnp.float32)
    g_ltrb = jnp.asarray(rng.normal(0, 1, (B, A, 4)), jnp.float32)
    g_ce = jnp.asarray(rng.uniform(0, 2, (B, A)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)
    target = target.at[0, :4].set(jnp.floor(target[0, :4]))
    pd = pd.at[0, 0].set(40.0).at[0, 1].set(-40.0)

    want = _reference_dz(pd, ltrb, g_ltrb, g_ce, target)
    got = dfl_decode_ce_bwd_pallas_planar(
        pd, ltrb.transpose(2, 0, 1), g_ltrb.transpose(2, 0, 1), g_ce,
        target.transpose(2, 0, 1), interpret=True,
    )
    assert got.dtype == pd.dtype and got.shape == pd.shape
    rtol, atol = (2e-6, 2e-6) if dtype == jnp.float32 else (8e-3, 2e-4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=rtol, atol=atol,
    )


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_dfl_bwd_planar_kernel_ragged_rows():
    from mga_yolo_tpu.ops.pallas.dfl_bwd import dfl_decode_ce_bwd_pallas_planar

    rng = np.random.default_rng(3)
    B, A, R = 1, 1050, 16  # M = 525 -> grid 2, pad 499
    pd = jnp.asarray(rng.normal(0, 2, (B, A, 4, R)), jnp.float32)
    ltrb = _dfl_decode_primal(pd)
    g_ltrb = jnp.asarray(rng.normal(0, 1, (B, A, 4)), jnp.float32)
    g_ce = jnp.asarray(rng.uniform(0, 2, (B, A)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)
    want = _reference_dz(pd, ltrb, g_ltrb, g_ce, target)
    got = dfl_decode_ce_bwd_pallas_planar(
        pd, ltrb.transpose(2, 0, 1), g_ltrb.transpose(2, 0, 1), g_ce,
        target.transpose(2, 0, 1), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)
