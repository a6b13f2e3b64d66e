"""Fused DFL decode+CE *backward* — Pallas TPU kernel.

The combined DFL cotangent (losses/detection.py ``_dfl_decode_ce_bwd``)

    dz = p * ((proj - ltrb) * g_ltrb + g_ce/4) - q * g_ce/4,
    p = softmax(pd, axis=-1),  q = wl*onehot(tl) + wr*onehot(tl+1)

is pure elementwise math plus a 16-wide segment softmax over the big
(B, A, 4, R) distribution tensor, yet on the XLA path it lowered to a 3.3
ms/step kLoop fusion at b128/640 (round-4 per-op table, BASELINE.md) — XLA
placed BATCH as the minor dim, so the R-axis softmax strides across tiles
(~9x off the HBM speed-of-light for its ~340 MB of traffic). The reference
never faced this choice: torch autograd materializes both separate backward
streams (`/root/reference/.../ultralytics/utils/loss.py` DFLoss + decode).

Kernel layout: the tensor is viewed as (M, 128) rows — 128 consecutive
elements = 8 complete R=16 segments (8 sides = 2 anchors), so every lane is
useful and the segment softmax never leaves the row:

 - per-side aux values arrive as (M, 8) and are broadcast to (M, 128) with
   a one-hot (8, 128) matmul on the MXU (segment-id expand),
 - segment sums take the transposed matmul (M,128)@(128,8),
 - the segment max (numerical stability) is 8 static 16-lane slices.

Traffic: pd in + dz out + 4 aux = ~340 MB at b128/640 -> ~0.45 ms at
speed-of-light (standalone micro-bench: tools/scripts/bench_dfl_bwd.py);
in the full train step the interleaved A/B measured −1.3 ms/step vs the
XLA path (the 3.3 ms fusion partially overlapped with other work).

Used by ``losses/detection._dfl_decode_ce_bwd`` on TPU when R == 16 and
B*A*4*R % 128 == 0; the jnp path stays as the CPU/odd-shape fallback and
as the parity oracle (tests/test_dfl_bwd_pallas.py).
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

_ROWS = 512  # rows per grid step; VMEM: (512,128) in/out + 4x(512,8) aux


def _kernel(pd_ref, ltrb_ref, g_ref, gs_ref, tgt_ref, out_ref, *, R: int):
    x = pd_ref[:].astype(jnp.float32)                 # (T, 128)
    T = x.shape[0]
    nseg = 128 // R                                   # segments per row (8)

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    proj = (lane % R).astype(jnp.float32)             # within-segment bin id

    # one-hot segment matrix S[s, l] = (l // R == s), f32 (built in-regs)
    seg_of_lane = jax.lax.broadcasted_iota(jnp.int32, (nseg, 128), 1) // R
    seg_id = jax.lax.broadcasted_iota(jnp.int32, (nseg, 128), 0)
    S = (seg_of_lane == seg_id).astype(jnp.float32)   # (nseg, 128)

    def expand(a8):  # (T, nseg) -> (T, 128), lane value of its segment
        return jax.lax.dot_general(
            a8, S, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # segment max for softmax stability: 8 static 16-lane slices
    m8 = jnp.concatenate(
        [jnp.max(x[:, s * R:(s + 1) * R], axis=1, keepdims=True) for s in range(nseg)],
        axis=1,
    )                                                  # (T, nseg)
    e = jnp.exp(x - expand(m8))
    z8 = jax.lax.dot_general(                          # segment sums (T, nseg)
        e, S.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = e / expand(z8)

    # EXACTLY _dfl_interp's math (clip, trunc, wl = tr - target) so the
    # kernel is bit-compatible with the jnp VJP path
    tgt = jnp.clip(expand(tgt_ref[:].astype(jnp.float32)), 0.0, R - 1 - 0.01)
    tl = jnp.floor(tgt)
    wl = (tl + 1.0) - tgt
    q = jnp.where(proj == tl, wl, 0.0) + jnp.where(proj == tl + 1.0, 1.0 - wl, 0.0)

    ltrb = expand(ltrb_ref[:].astype(jnp.float32))
    g = expand(g_ref[:].astype(jnp.float32))
    gs = expand(gs_ref[:].astype(jnp.float32))
    dz = p * ((proj - ltrb) * g + gs) - q * gs
    out_ref[:] = dz.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dfl_decode_ce_bwd_pallas(
    pd: jax.Array,       # (B, A, 4, R) any float dtype — dz returned in same
    ltrb: jax.Array,     # (B, A, 4) f32 — decoded expectation (fwd residual)
    g_ltrb: jax.Array,   # (B, A, 4) f32 — decode-output cotangent
    g_ce: jax.Array,     # (B, A) f32 — per-anchor CE cotangent
    target: jax.Array,   # (B, A, 4) f32 — DFL regression target
    interpret: bool = False,
) -> jax.Array:
    """dz with the same shape/dtype as ``pd``. Requires 128 % (4*R) == 0 or
    (4*R) % 128 == 0 with whole segments per row; R=16 is the YOLO default."""
    B, A, four, R = pd.shape
    total = B * A * four * R
    assert four == 4 and 128 % R == 0 and total % 128 == 0, (pd.shape,)
    M = total // 128
    nseg = 128 // R

    pd2 = pd.reshape(M, 128)
    aux = lambda a: a.reshape(M, nseg).astype(jnp.float32)
    gs = jnp.broadcast_to((g_ce / 4.0)[..., None], (B, A, 4))

    grid = (M + _ROWS - 1) // _ROWS
    pad = grid * _ROWS - M
    if pad:  # ragged tail: pad rows (outputs for them are dropped)
        pd2 = jnp.pad(pd2, ((0, pad), (0, 0)))
        padded = lambda a: jnp.pad(aux(a), ((0, pad), (0, 0)))
    else:
        padded = aux

    dz = pl.pallas_call(
        functools.partial(_kernel, R=R),
        out_shape=jax.ShapeDtypeStruct((grid * _ROWS, 128), pd.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, nseg), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, nseg), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, nseg), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, nseg), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pd2, padded(ltrb), padded(g_ltrb), padded(gs), padded(target))
    return dz[:M].reshape(B, A, four, R)


# ---------------------------------------------------------------- planar v2
#
# Round-5: the loss carries (·,·,4) quantities PLANAR as (4,B,A) f32
# (ops/boxes.py layout note). The v1 wrapper above reshapes each aux to
# (M, 8) — minor dim 8 lane-pads 16x, so its four aux streams cost ~1.1 GB
# of the train step (whole-step byte census, BASELINE.md round 5) and the
# planar A/B measured the v1 path SLOWER than XLA's fusion (119.2 vs
# 114.8 ms/step). v2 takes the planar tensors directly: aux are packed
# host-side into (nseg, M) f32 — minor dim M, zero pad — by a cheap 17 MB
# relayout, and the kernel's segment-expand contracts over dim 0 instead
# of transposing. Same math, same S matrix, bit-identical dz.


def _kernel_planar(pd_ref, ltrb_ref, g_ref, gs_ref, tgt_ref, out_ref, *, R: int):
    x = pd_ref[:].astype(jnp.float32)                 # (T, 128)
    T = x.shape[0]
    nseg = 128 // R

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    proj = (lane % R).astype(jnp.float32)

    seg_of_lane = jax.lax.broadcasted_iota(jnp.int32, (nseg, 128), 1) // R
    seg_id = jax.lax.broadcasted_iota(jnp.int32, (nseg, 128), 0)
    S = (seg_of_lane == seg_id).astype(jnp.float32)   # (nseg, 128)

    def expand_t(a8t):  # (nseg, T) -> (T, 128): contract the seg dim with S
        return jax.lax.dot_general(
            a8t, S, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    m8 = jnp.concatenate(
        [jnp.max(x[:, s * R:(s + 1) * R], axis=1, keepdims=True) for s in range(nseg)],
        axis=1,
    )                                                  # (T, nseg)
    e = jnp.exp(x - jax.lax.dot_general(               # expand via (T,nseg)@S
        m8, S, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    z8 = jax.lax.dot_general(
        e, S.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = e / jax.lax.dot_general(
        z8, S, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    tgt = jnp.clip(expand_t(tgt_ref[:].astype(jnp.float32)), 0.0, R - 1 - 0.01)
    tl = jnp.floor(tgt)
    wl = (tl + 1.0) - tgt
    q = jnp.where(proj == tl, wl, 0.0) + jnp.where(proj == tl + 1.0, 1.0 - wl, 0.0)

    ltrb = expand_t(ltrb_ref[:].astype(jnp.float32))
    g = expand_t(g_ref[:].astype(jnp.float32))
    gs = expand_t(gs_ref[:].astype(jnp.float32))
    dz = p * ((proj - ltrb) * g + gs) - q * gs
    out_ref[:] = dz.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dfl_decode_ce_bwd_pallas_planar(
    pd: jax.Array,        # (B, A, 4, R) any float dtype — dz returned in same
    ltrb_p: jax.Array,    # (4, B, A) f32 planar decode expectation
    g_ltrb_p: jax.Array,  # (4, B, A) f32 planar decode-output cotangent
    g_ce: jax.Array,      # (B, A) f32 per-anchor CE cotangent
    target_p: jax.Array,  # (4, B, A) f32 planar DFL target
    interpret: bool = False,
) -> jax.Array:
    """dz (B,A,4,R) from PLANAR aux. Mapping proof: pd2 row t lane l is bin
    l%R of side-index i = (128t+l)//R = nseg*t + l//R; packing a planar aux
    (4, B*A) via reshape(4, M, par).transpose(par, 4, M).reshape(nseg, M)
    puts aux_host[j, m] = aux_p[j % 4, par*m_stride...] = side 8m+j's value,
    exactly segment j of row m (par = j // 4, s = j % 4,
    i = (par*m... ) = nseg*m + j). Bit-identical to the v1 (M,8) packing."""
    B, A, four, R = pd.shape
    total = B * A * four * R
    assert four == 4 and 128 % R == 0 and total % 128 == 0, (pd.shape,)
    M = total // 128
    nseg = 128 // R
    par = nseg // four  # sides per row / 4 coords = anchor pairs per row (2)

    pd2 = pd.reshape(M, 128)

    def pack(a_p):  # (4, B, A) f32 -> (nseg, M), minor dim M: zero lane pad
        # parity-strided slices instead of reshape(4,M,par).transpose(...):
        # the (4,M,par) view puts par=2 on the MINOR dim (64x lane pad) and
        # its transpose materialized as two 0.76 ms copies (round-5 trace).
        # lax.slice with stride keeps the minor dim M -> no padded
        # intermediate; rows [q*4+s] = a_p[s, q::par] is exactly the
        # packing proven in the docstring.
        flat = a_p.reshape(four, M * par).astype(jnp.float32)
        groups = [
            jax.lax.slice(flat, (0, q), (four, M * par), (1, par))
            for q in range(par)
        ]
        return jnp.concatenate(groups, axis=0)  # (nseg, M)

    gs_p = jnp.broadcast_to((g_ce / 4.0)[None], (four, B, A))

    grid = (M + _ROWS - 1) // _ROWS
    pad = grid * _ROWS - M
    if pad:
        pd2 = jnp.pad(pd2, ((0, pad), (0, 0)))
        packed = lambda a: jnp.pad(pack(a), ((0, 0), (0, pad)))
    else:
        packed = pack

    dz = pl.pallas_call(
        functools.partial(_kernel_planar, R=R),
        out_shape=jax.ShapeDtypeStruct((grid * _ROWS, 128), pd.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nseg, _ROWS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nseg, _ROWS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nseg, _ROWS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nseg, _ROWS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pd2, packed(ltrb_p), packed(g_ltrb_p), packed(gs_p), packed(target_p))
    return dz[:M].reshape(B, A, four, R)
