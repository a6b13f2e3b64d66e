"""Micro-bench: Pallas fused-DFL backward vs the XLA jnp path, b128 shapes.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_dfl_bwd.py
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.losses.detection import _dfl_decode_primal
from mga_yolo_tpu.ops.pallas.dfl_bwd import dfl_decode_ce_bwd_pallas

B, A, R = int(os.environ.get("MGA_BENCH_BATCH", "128")), 8400, 16


def _jnp_dz(pd, ltrb, g_ltrb, g_ce, target):
    from mga_yolo_tpu.losses.detection import _dfl_interp

    proj = jnp.arange(R, dtype=jnp.float32)
    tl, tr, wl, wr = _dfl_interp(target, R)
    p = jax.nn.softmax(pd.astype(jnp.float32), axis=-1)
    idx = jnp.arange(R, dtype=jnp.int32)
    q = (jnp.where(idx == tl[..., None], wl[..., None], 0)
         + jnp.where(idx == tr[..., None], wr[..., None], 0))
    gsd = (g_ce / 4.0)[..., None, None]
    return (p * ((proj - ltrb[..., None]) * g_ltrb[..., None] + gsd) - q * gsd).astype(pd.dtype)


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    pd = jnp.asarray(rng.normal(0, 3, (B, A, 4, R)), jnp.bfloat16)
    ltrb = _dfl_decode_primal(pd).astype(jnp.float32)
    g_ltrb = jnp.asarray(rng.normal(0, 1, (B, A, 4)), jnp.float32)
    g_ce = jnp.asarray(rng.uniform(0, 2, (B, A)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, R - 1, (B, A, 4)), jnp.float32)

    jfn = jax.jit(_jnp_dz)
    t_x = bench(jfn, pd, ltrb, g_ltrb, g_ce, target)
    t_p = bench(dfl_decode_ce_bwd_pallas, pd, ltrb, g_ltrb, g_ce, target)
    d_x = jfn(pd, ltrb, g_ltrb, g_ce, target)
    d_p = dfl_decode_ce_bwd_pallas(pd, ltrb, g_ltrb, g_ce, target)
    err = float(jnp.max(jnp.abs(d_x.astype(jnp.float32) - d_p.astype(jnp.float32))))
    bytes_mb = (pd.size * 2 * 2 + 4 * B * A * 4 * 4) / 1e6
    print(f"standalone jnp/XLA : {t_x:.3f} ms")
    print(f"standalone pallas  : {t_p:.3f} ms  ({t_x / t_p:.2f}x)  max|diff|={err:.2e}")
    print(f"traffic ~{bytes_mb:.0f} MB -> SoL ~{bytes_mb / 819e3 * 1e3:.3f} ms @819GB/s")


if __name__ == "__main__":
    main()
