"""Fused masked average+max pooling — Pallas TPU kernel with custom VJP.

The hot inner op of the mask-guided attention blocks
(`/root/reference/mga_yolo/nn/modules/masked_cbam.py:87-121` masked avg/max,
`masked_eca.py:139-164` masked avg): on the XLA path the feature map is read
three times (masked sum, plain mean for the GAP fallback, masked max).  This
kernel computes all reductions in ONE pass over the (H*W, C) tile stream —
the op is HBM-bandwidth-bound, so one read instead of three is the win.

Semantics match the XLA reference implementation in
`mga_yolo_tpu.models.attention` exactly (tiny-mask GAP blend, masked-max
GAP fallback when no pixel has m > 0.5); a parity test pins them together.

Backward: analytic VJP in plain XLA ops (reductions backward = cheap
broadcasts), so the kernel is usable in training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; fall back gracefully elsewhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

_NEG = -3.0e38  # sentinel (finfo(f32).min rounds badly in bf16)


def _kernel(x_ref, m_ref, msum_ref, wsum_ref, gsum_ref, mmax_ref, cnt_ref):
    """One (1, rows_tile, C) block: accumulate all five reductions.

    Grid: (B, n_row_tiles). Outputs indexed by batch only — accumulated
    across the row-tile grid dimension (sequential on TPU).
    """
    r = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)       # (T, C)
    m = m_ref[0].astype(jnp.float32)       # (T, 1)

    part_wsum = jnp.sum(x * m, axis=0, keepdims=True)          # (1, C)
    part_gsum = jnp.sum(x, axis=0, keepdims=True)              # (1, C)
    part_msum = jnp.sum(m, axis=0, keepdims=True)              # (1, 1)
    sel = m > 0.5
    part_cnt = jnp.sum(sel.astype(jnp.float32), axis=0, keepdims=True)
    part_max = jnp.max(jnp.where(sel, x, _NEG), axis=0, keepdims=True)

    @pl.when(r == 0)
    def _():
        wsum_ref[0] = part_wsum
        gsum_ref[0] = part_gsum
        msum_ref[0] = part_msum
        cnt_ref[0] = part_cnt
        mmax_ref[0] = part_max

    @pl.when(r != 0)
    def _():
        wsum_ref[0] += part_wsum
        gsum_ref[0] += part_gsum
        msum_ref[0] += part_msum
        cnt_ref[0] += part_cnt
        mmax_ref[0] = jnp.maximum(mmax_ref[0], part_max)


def _rows_tile_for(N: int, cap: int = 1024, default: int = 512) -> int:
    """Largest multiple-of-16 divisor of N up to ``cap`` — a row tile that
    divides N exactly needs NO host-side pad. The jnp.pad fallback copies
    the whole (B,N,C) tensor (2x 0.64 ms at P3 b128/640 — the two biggest
    non-conv rows of the round-5 eval attribution, docs/perf/attr_eval_r5.txt);
    every standard YOLO grid (80²=6400 -> 800, 40²=1600 -> 800, 20²=400 ->
    400) has an exact tile, so the pad path survives only for odd shapes."""
    for t in range(min(cap, N) // 16 * 16, 15, -16):
        if N % t == 0:
            return t
    return default


def _reductions_pallas(x2: jax.Array, m2: jax.Array, rows_tile: int = 512):
    """x2 (B, N, C), m2 (B, N, 1) -> (msum, wsum, gsum, mmax, cnt) per batch."""
    B, N, C = x2.shape
    if N % rows_tile:
        rows_tile = _rows_tile_for(N, default=rows_tile)
    n_tiles = max(1, -(-N // rows_tile))
    pad = n_tiles * rows_tile - N
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, pad), (0, 0)))
        m2 = jnp.pad(m2, ((0, 0), (0, pad), (0, 0)))

    out_shapes = (
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),   # msum
        jax.ShapeDtypeStruct((B, 1, C), jnp.float32),   # wsum
        jax.ShapeDtypeStruct((B, 1, C), jnp.float32),   # gsum
        jax.ShapeDtypeStruct((B, 1, C), jnp.float32),   # mmax
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),   # cnt
    )
    grid = (B, n_tiles)
    in_specs = [
        pl.BlockSpec((1, rows_tile, C), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows_tile, 1), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
    )

    msum, wsum, gsum, mmax, cnt = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
    )(x2, m2)
    return (
        msum[:, 0, 0:1],      # (B,1)
        wsum[:, 0, :],        # (B,C)
        gsum[:, 0, :],        # (B,C)
        mmax[:, 0, :],        # (B,C)
        cnt[:, 0, 0:1],       # (B,1)
    )


def _reductions_xla(x2, m2):
    x32 = x2.astype(jnp.float32)
    m32 = m2.astype(jnp.float32)
    msum = jnp.sum(m32, axis=1)[:, 0:1]
    wsum = jnp.sum(x32 * m32, axis=1)
    gsum = jnp.sum(x32, axis=1)
    sel = m32 > 0.5
    mmax = jnp.max(jnp.where(sel, x32, _NEG), axis=1)
    cnt = jnp.sum(sel.astype(jnp.float32), axis=1)[:, 0:1]
    return msum, wsum, gsum, mmax, cnt


def _combine(reds, N: int, tiny_thr: float, eps: float, dtype):
    msum, wsum, gsum, mmax, cnt = reds
    gap = gsum / N
    mavg = wsum / jnp.maximum(msum, eps)
    valid = (msum / N >= tiny_thr).astype(jnp.float32)          # (B,1)
    avg_desc = mavg * valid + gap * (1.0 - valid)
    any_valid = cnt > 0
    max_desc = jnp.where(any_valid, mmax, gap)
    return avg_desc.astype(dtype), max_desc.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def masked_pool_fused(
    x: jax.Array, m: jax.Array, tiny_thr: float = 1e-4, eps: float = 1e-6,
    use_pallas: bool = True,
):
    """(B,H,W,C) features + (B,H,W,1) mask probs -> (avg_desc, max_desc) (B,C).

    Reference-equivalent to masked_avg_pool + masked_max_pool in
    `mga_yolo_tpu.models.attention`.
    """
    B, H, W, C = x.shape
    x2 = x.reshape(B, H * W, C)
    m2 = m.reshape(B, H * W, 1)
    on_tpu = HAS_PALLAS and jax.default_backend() == "tpu"
    reds = _reductions_pallas(x2, m2) if (use_pallas and on_tpu) else _reductions_xla(x2, m2)
    return _combine(reds, H * W, tiny_thr, eps, x.dtype)


def _fwd(x, m, tiny_thr, eps, use_pallas):
    out = masked_pool_fused(x, m, tiny_thr, eps, use_pallas)
    return out, (x, m)


def _bwd(tiny_thr, eps, use_pallas, res, g):
    """Analytic backward in XLA ops (cheap broadcast math)."""
    x, m = res
    g_avg, g_max = g
    B, H, W, C = x.shape
    N = H * W
    x32 = x.astype(jnp.float32)
    m32 = m.astype(jnp.float32)

    msum = jnp.sum(m32, axis=(1, 2))                      # (B,1)
    denom = jnp.maximum(msum, eps)                        # (B,1)
    valid = (msum / N >= tiny_thr).astype(jnp.float32)    # (B,1)
    sel = m32 > 0.5
    mmax = jnp.max(jnp.where(sel, x32, _NEG), axis=(1, 2))  # (B,C)
    any_valid = jnp.any(sel, axis=(1, 2))                 # (B,1)

    ga = g_avg.astype(jnp.float32)
    gm = g_max.astype(jnp.float32)

    # avg branch: valid -> d x = m * ga / denom ; dm = (x - mavg) * ga... / denom
    wsum = jnp.sum(x32 * m32, axis=(1, 2))                # (B,C)
    mavg = wsum / denom
    v4 = valid[:, None, None, :]
    dx = v4 * m32 * (ga / denom)[:, None, None, :]
    # invalid -> GAP: dx += (1-valid)/N * ga
    dx = dx + (1.0 - v4) * (ga[:, None, None, :] / N)
    # dm from the masked average (sum over channels)
    dm = v4 * jnp.sum(
        (x32 - mavg[:, None, None, :]) * (ga / denom)[:, None, None, :],
        axis=-1, keepdims=True,
    )

    # max branch: grad to argmax positions (ties split), fallback GAP
    is_max = sel & (x32 == mmax[:, None, None, :])
    n_ties = jnp.maximum(jnp.sum(is_max, axis=(1, 2)), 1.0)  # (B,C)
    av4 = any_valid[:, None, None, :]
    dx = dx + jnp.where(
        av4 & is_max, (gm / n_ties)[:, None, None, :], 0.0
    )
    dx = dx + jnp.where(av4, 0.0, gm[:, None, None, :] / N)

    return dx.astype(x.dtype), dm.astype(m.dtype)


masked_pool_fused.defvjp(_fwd, _bwd)


# ------------------------------------------------------------------ fused CAM


def _cam_kernel_factory(n_tiles: int, n_real: int, tiny_thr: float, eps: float):
    """Kernel computing the 5 reductions AND, on the last row tile, the full
    CAM gate: combine -> shared MLP (C->C/r->C) on avg & max descriptors ->
    sigmoid(sum). One pass over HBM for the whole channel-attention branch
    (reference masked_cbam.py:87-130 pools + MLP + _cam)."""

    def kernel(x_ref, m_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               msum_ref, wsum_ref, gsum_ref, mmax_ref, cnt_ref, gate_ref):
        r = pl.program_id(1)

        x = x_ref[0].astype(jnp.float32)       # (T, C)
        m = m_ref[0].astype(jnp.float32)       # (T, 1)

        part_wsum = jnp.sum(x * m, axis=0, keepdims=True)
        part_gsum = jnp.sum(x, axis=0, keepdims=True)
        part_msum = jnp.sum(m, axis=0, keepdims=True)
        sel = m > 0.5
        part_cnt = jnp.sum(sel.astype(jnp.float32), axis=0, keepdims=True)
        part_max = jnp.max(jnp.where(sel, x, _NEG), axis=0, keepdims=True)

        @pl.when(r == 0)
        def _():
            wsum_ref[0] = part_wsum
            gsum_ref[0] = part_gsum
            msum_ref[0] = part_msum
            cnt_ref[0] = part_cnt
            mmax_ref[0] = part_max

        @pl.when(r != 0)
        def _():
            wsum_ref[0] += part_wsum
            gsum_ref[0] += part_gsum
            msum_ref[0] += part_msum
            cnt_ref[0] += part_cnt
            mmax_ref[0] = jnp.maximum(mmax_ref[0], part_max)

        @pl.when(r == n_tiles - 1)
        def _():
            msum = msum_ref[0]                                   # (1,1)
            gap = gsum_ref[0] / n_real                           # (1,C)
            mavg = wsum_ref[0] / jnp.maximum(msum, eps)
            valid = (msum / n_real >= tiny_thr).astype(jnp.float32)
            avg_desc = mavg * valid + gap * (1.0 - valid)
            max_desc = jnp.where(cnt_ref[0] > 0, mmax_ref[0], gap)

            w1 = w1_ref[:].astype(jnp.float32)                   # (C, h)
            b1 = b1_ref[:].astype(jnp.float32)                   # (1, h)
            w2 = w2_ref[:].astype(jnp.float32)                   # (h, C)
            b2 = b2_ref[:].astype(jnp.float32)                   # (1, C)

            def mlp(d):
                h = jnp.maximum(
                    jnp.dot(d, w1, preferred_element_type=jnp.float32) + b1, 0.0
                )
                return jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2

            gate_ref[0] = jax.nn.sigmoid(mlp(avg_desc) + mlp(max_desc))

    return kernel


def _cam_gate_pallas(x2, m2, w1, b1, w2, b2, tiny_thr, eps, rows_tile: int = 512):
    B, N, C = x2.shape
    hidden = w1.shape[1]
    if N % rows_tile:
        rows_tile = _rows_tile_for(N, default=rows_tile)
    n_tiles = max(1, -(-N // rows_tile))
    pad = n_tiles * rows_tile - N
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, pad), (0, 0)))
        m2 = jnp.pad(m2, ((0, 0), (0, pad), (0, 0)))
    b1r = b1.reshape(1, hidden)
    b2r = b2.reshape(1, C)

    outs = pl.pallas_call(
        _cam_kernel_factory(n_tiles, N, tiny_thr, eps),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, rows_tile, C), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_tile, 1), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
    )(x2, m2, w1, b1r, w2, b2r)
    return outs[-1][:, 0, :]  # (B, C) gate


def _cam_gate_ref(x, m, w1, b1, w2, b2, tiny_thr, eps):
    """XLA reference composition (pools + shared MLP + sigmoid)."""
    B, H, W, C = x.shape
    x2 = x.reshape(B, H * W, C)
    m2 = m.reshape(B, H * W, 1)
    reds = _reductions_xla(x2, m2)
    avg, mx = _combine(reds, H * W, tiny_thr, eps, jnp.float32)

    def mlp(d):
        h = jnp.maximum(d.astype(jnp.float32) @ w1.astype(jnp.float32) + b1.astype(jnp.float32), 0.0)
        return h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)

    return jax.nn.sigmoid(mlp(avg) + mlp(mx))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def cam_gate_fused(x, m, w1, b1, w2, b2, tiny_thr: float = 1e-4, eps: float = 1e-6,
                   use_pallas: bool = True):
    """Fully-fused CAM channel gate: (B,H,W,C) x (B,H,W,1) -> (B,C) float32.

    Forward = ONE Pallas pass (reductions + MLP + sigmoid); backward
    recomputes through the XLA reference composition (the activations are
    O(B*C) — recompute is cheaper than storing per-tile state)."""
    on_tpu = HAS_PALLAS and jax.default_backend() == "tpu"
    if use_pallas and on_tpu:
        B, H, W, C = x.shape
        return _cam_gate_pallas(
            x.reshape(B, H * W, C), m.reshape(B, H * W, 1), w1, b1, w2, b2, tiny_thr, eps
        )
    return _cam_gate_ref(x, m, w1, b1, w2, b2, tiny_thr, eps)


def _cam_fwd(x, m, w1, b1, w2, b2, tiny_thr, eps, use_pallas):
    return cam_gate_fused(x, m, w1, b1, w2, b2, tiny_thr, eps, use_pallas), (x, m, w1, b1, w2, b2)


def _cam_bwd(tiny_thr, eps, use_pallas, res, g):
    x, m, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: _cam_gate_ref(*a, tiny_thr, eps), x, m, w1, b1, w2, b2)
    return vjp(g.astype(jnp.float32))


cam_gate_fused.defvjp(_cam_fwd, _cam_bwd)
