"""Conv-backward formulation microbench — attack the sub-50% SoL dgrad rows.

The round-5 speed-of-light table (BASELINE.md, tools/scripts/sol_conv.py)
shows the worst per-conv efficiency in the train step concentrated in
input-gradient (dgrad) convolutions: l16_Conv dgrad 22%, l28_Detect dgrads
28–45%, l1_Conv dgrad 38%, l2_C2f dgrads 38–50% — together ~10 ms/step of
the ~20 ms conv gap at b128/640. This measures, per real shape, whether
XLA's native transposed-conv lowering can be beaten by re-formulating:

  * stride-1 dgrad: conv of the cotangent with the spatially-flipped,
    IO-transposed kernel (mathematically identical; tests whether the
    'slow dgrad' rows are real or trace-attribution noise — if the manual
    form times the same as XLA's, the lowering was already optimal).
  * stride-2 dgrad: PHASE DECOMPOSITION — instead of XLA's zero-dilated
    cotangent (lhs_dilation=2, 3/4 of multiplies hit inserted zeros), split
    dx by (row, col) parity into 4 phases; each phase is a DENSE stride-1
    conv of the cotangent with a small sub-kernel (1x1 / 1x2 / 2x1 / 2x2
    taps of the flipped kernel), then interleave. Same multiply-adds, no
    zero work, no dilated operand.

All arms are timed interleaved in one process (chain-difference timing, as
tools/scripts/bench_ab_train.py) so tunnel drift cancels. Value parity of
every alternative form vs jax.vjp is asserted on-device before timing.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_dgrad.py
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")
K1, K2, REPS = 2, 20, 5


def conv_fwd(x, w, s, pad=1):
    return lax.conv_general_dilated(x, w, (s, s), ((pad, pad), (pad, pad)),
                                    dimension_numbers=DN)


def dgrad_xla(g, x_shape, w, s, pad=1):
    """XLA's own lowering: vjp of the forward conv wrt x."""
    x0 = jnp.zeros(x_shape, g.dtype)
    _, vjp = jax.vjp(lambda x: conv_fwd(x, w, s, pad), x0)
    return vjp(g)[0]


def dgrad_manual_s1(g, w):
    """stride-1 dgrad == conv(g, flip_hw(w) with I/O transposed), same pad."""
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (kh,kw,co,ci)
    return conv_fwd(g, wt, 1, pad=w.shape[0] // 2)


def dgrad_phase_s2(g, w):
    """stride-2 k=3 pad=1 dgrad via 4 dense phase convs + interleave.

    Derivation (1-D, even input size H = 2*H_out): with forward
    y[o] = sum_k x[2o + k - 1] w[k],
      dx[2a]   = g[a] w[1]                       (only k=1 lands on even ih)
      dx[2a+1] = g[a+1] w[0] + g[a] w[2]         (k in {0,2})
    so the even phase is a 1-tap conv of g with w[1] and the odd phase a
    2-tap conv with kernel (w[2], w[0]) and high-side padding 1 (the g[a+1]
    read at a = H_out-1 falls off the grid -> zero). 2-D is the tensor
    product of the two 1-D rules; every kernel contracts co -> ci via the
    IO-transposed taps. The interleave is a (b,Ho,2,Wo,2,c) stack+reshape —
    lane dim untouched, so no c-minor relayout.
    """
    b, ho, wo, co = g.shape
    ci = w.shape[2]
    wt = w.transpose(0, 1, 3, 2)  # (kh,kw,co,ci)

    def pconv(kern, pad_h, pad_w):
        return lax.conv_general_dilated(g, kern, (1, 1), (pad_h, pad_w),
                                        dimension_numbers=DN)

    # sub-kernels: rows/cols of the flipped kernel that land on each parity
    k_ee = wt[1:2, 1:2]                                    # (1,1,co,ci)
    k_eo = jnp.stack([wt[1, 2], wt[1, 0]], axis=0)[None]   # (1,2,co,ci)
    k_oe = jnp.stack([wt[2, 1], wt[0, 1]], axis=0)[:, None]  # (2,1,co,ci)
    k_oo = jnp.stack(
        [jnp.stack([wt[2, 2], wt[2, 0]], 0), jnp.stack([wt[0, 2], wt[0, 0]], 0)], 0
    )  # (2,2,co,ci)

    p_ee = pconv(k_ee, (0, 0), (0, 0))
    p_eo = pconv(k_eo, (0, 0), (0, 1))
    p_oe = pconv(k_oe, (0, 1), (0, 0))
    p_oo = pconv(k_oo, (0, 1), (0, 1))

    row_e = jnp.stack([p_ee, p_eo], axis=3).reshape(b, ho, 2 * wo, ci)
    row_o = jnp.stack([p_oe, p_oo], axis=3).reshape(b, ho, 2 * wo, ci)
    return jnp.stack([row_e, row_o], axis=2).reshape(b, 2 * ho, 2 * wo, ci)


def wgrad_xla(g, x, w_shape, s, pad=1):
    w0 = jnp.zeros(w_shape, g.dtype)
    _, vjp = jax.vjp(lambda w: conv_fwd(x, w, s, pad), w0)
    return vjp(g)[0]


def wgrad_phase_s2(g, x, w_shape):
    """stride-2 k=3 wgrad via per-tap phase slices — no window-dilated conv.

    dw[kh,kw,ci,co] = sum_{a,b} x[2a+kh-1, 2b+kw-1, ci] g[a,b,co]: for each
    of the 9 taps this is ONE dense (B*Ho*Wo, ci)x(B*Ho*Wo, co) matmul over
    a parity-strided slice of x (XLA's native wgrad instead dilates the
    window by 2). Slices of even/odd grids keep the lane dim contiguous.
    """
    b, ho, wo, co = g.shape
    kh, kw, ci, _ = w_shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.reshape(-1, co)
    taps = []
    for i in range(kh):
        row = []
        for j in range(kw):
            xs = lax.slice(xp, (0, i, j, 0), (b, i + 2 * ho, j + 2 * wo, ci),
                           (1, 2, 2, 1))
            row.append(jnp.einsum("nc,no->co", xs.reshape(-1, ci).astype(jnp.float32),
                                  gf.astype(jnp.float32)))
        taps.append(jnp.stack(row, 0))
    return jnp.stack(taps, 0).astype(g.dtype)


def timed_chain(fn, args, n):
    """n dependent applications; dependency via a scalar scale on the first
    arg, output collapsed by sum (same overhead for every arm)."""

    @jax.jit
    def run(c0, *a):
        def body(c, _):
            # scale must be DATA-DEPENDENT on the carry: (1 + c*0) constant-
            # folds to 1 and XLA hoists the whole op out of the scan (first
            # run of this bench timed empty loops — 0.1 ms "dgrads" with
            # 419 MB outputs). 1 + c*1e-30 rounds to exactly 1.0 in bf16 at
            # runtime but is not provably 1 at compile time.
            scale = (1 + c * 1e-30).astype(a[0].dtype)
            out = fn(a[0] * scale, *a[1:])
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        return lax.scan(body, c0, None, length=n)[0]

    r = run(jnp.float32(0.0), *args)
    jax.block_until_ready(r)
    return functools.partial(run, jnp.float32(0.0), *args)


CASES = [
    # (label, x_shape, w_shape, stride)  — the sub-50% rows of the SoL table
    ("l28_s1_64x64@80", (128, 80, 80, 64), (3, 3, 64, 64), 1),
    ("l2m_s1_16x16@160", (128, 160, 160, 16), (3, 3, 16, 16), 1),
    ("l1_s2_16to32@320", (128, 320, 320, 16), (3, 3, 16, 32), 2),
    ("l16_s2_64x64@80", (128, 80, 80, 64), (3, 3, 64, 64), 2),
    ("l3_s2_32to64@160", (128, 160, 160, 32), (3, 3, 32, 64), 2),
]


def main() -> None:
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    out = {}
    for label, xs, ws, s in CASES:
        x = jnp.asarray(rng.standard_normal(xs), dt)
        w = jnp.asarray(rng.standard_normal(ws) * 0.1, dt)
        gshape = (xs[0], xs[1] // s, xs[2] // s, ws[3])
        g = jnp.asarray(rng.standard_normal(gshape), dt)

        # NOTE: every big tensor must be an explicit ARG — a closed-over
        # device array is lifted to an HLO constant, and the l1-case x
        # (419 MB) blows the remote-compile tunnel's request-size limit
        # (HTTP 413). Closing over w (a few KB) is fine.
        arms = {"dgrad_xla": (lambda gg: dgrad_xla(gg, xs, w, s), (g,))}
        if s == 1:
            arms["dgrad_manual"] = (lambda gg: dgrad_manual_s1(gg, w), (g,))
        else:
            arms["dgrad_phase"] = (lambda gg: dgrad_phase_s2(gg, w), (g,))
            arms["wgrad_xla"] = (lambda gg, xx: wgrad_xla(gg, xx, ws, s), (g, x))
            arms["wgrad_phase"] = (lambda gg, xx: wgrad_phase_s2(gg, xx, ws), (g, x))
        arms["fwd_ref"] = (lambda xx: conv_fwd(xx, w, s), (x,))  # context row

        # value parity of alternative forms vs XLA's vjp — computed ON DEVICE
        # at a small batch (fetching the full-b128 dgrad would pull GBs over
        # the tunnel; formulation correctness is batch-independent) and only
        # the scalar relative error crosses the wire.
        nb = 4
        xsm, gsm = x[:nb], g[:nb]
        xs_sm = (nb,) + xs[1:]

        @jax.jit
        def _relerr(a, b):
            a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
            return jnp.max(jnp.abs(a32 - b32)) / (jnp.max(jnp.abs(a32)) + 1e-9)

        ref_d = dgrad_xla(gsm, xs_sm, w, s)
        alt = dgrad_manual_s1(gsm, w) if s == 1 else dgrad_phase_s2(gsm, w)
        err = float(_relerr(ref_d, alt))
        assert err < 2e-2, f"{label}: dgrad parity {err}"  # bf16 reassoc noise
        if s == 2:
            rw = wgrad_xla(gsm, xsm, ws, s)
            aw = wgrad_phase_s2(gsm, xsm, ws)
            werr = float(_relerr(rw, aw))
            assert werr < 2e-2, f"{label}: wgrad parity {werr}"

        runners = {}
        for name, (fn, a) in arms.items():
            runners[name] = (timed_chain(fn, a, K1), timed_chain(fn, a, K2))

        res = {name: [] for name in runners}
        for _ in range(REPS):
            for name, (r1, r2) in runners.items():
                t0 = time.perf_counter(); jax.block_until_ready(r1()); d1 = time.perf_counter() - t0
                t0 = time.perf_counter(); jax.block_until_ready(r2()); d2 = time.perf_counter() - t0
                res[name].append((d2 - d1) / (K2 - K1))
        out[label] = {n: round(float(np.median(v)) * 1e3, 3) for n, v in res.items()}
        print(label, out[label], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
