"""On-chip A/B: lane-packed (W folded into channels) vs plain small-C ops.

bench_c2f_bisect measured a ~16x per-FLOP gap between C=16@160^2 conv shapes
and FLOPs-matched C=128 shapes — consistent with XLA TPU lane padding (minor
dim padded to 128) inflating HBM traffic 8x for C=16 tensors. This probes the
fix: fold W into the lane dim (channel-major pack, X'[...,w',c*f+s] =
X[...,f*w'+s,c]) and run the conv as a folded conv with sparse-expanded
weights. Times fwd and fwd+bwd (grads wrt params+input) of both forms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_lanepack_probe.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

BATCH = 64
K1, K2, REPS = 2, 8, 3


def time_chain(run_one) -> float:
    def chain(n):
        salt = jnp.asarray(0.0, jnp.bfloat16)
        for _ in range(n):
            salt = run_one(salt)
        return float(salt)

    chain(1)
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)


def bench_pair(name, H, W, Cin, Cout, k, s, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, H, W, Cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, k, Cin, Cout)) * 0.1, jnp.bfloat16)

    def plain(wv, xx, salt):
        y = jax.lax.conv_general_dilated(
            xx + salt, wv, (s, s), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jax.nn.silu(y).astype(jnp.float32))

    def folded(wv, xx, salt):
        Kk = expand_kernel_jax(wv, f, s)
        y = jax.lax.conv_general_dilated(
            xx + salt, Kk, (s, 1), ((k // 2, k // 2), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jax.nn.silu(y).astype(jnp.float32))

    # jit-friendly expansion: scatter via one-hot matmuls is overkill — build
    # index maps once and use .at[].add in fp32 (tiny: kh*3*Cin*f*Cout*fo)
    fo = f // s
    pad = k // 2
    idx = []
    for t in range(fo):
        for dw in range(k):
            rel = s * t + dw - pad
            idx.append((rel // f + 1, rel % f, dw, t))

    def expand_kernel_jax(wv, f_, s_):
        K = jnp.zeros((k, 3, Cin * f_, Cout * fo), wv.dtype)
        for bwo, s_in, dw, t in idx:
            K = K.at[:, bwo, s_in * Cin:(s_in + 1) * Cin, t * Cout:(t + 1) * Cout].add(
                wv[:, dw, :, :])
        return K

    # NOTE: packing order here is (s*Cin + c) block layout for the jax expand
    # (contiguous slices) — rebuild xp to match
    xp = jnp.asarray(
        np.asarray(x).reshape(BATCH, H, W // f, f, Cin)
        .reshape(BATCH, H, W // f, f * Cin)
    )

    jp = jax.jit(plain)
    jf = jax.jit(folded)
    gp = jax.jit(jax.grad(plain, argnums=(0, 1)))
    gf = jax.jit(jax.grad(folded, argnums=(0, 1)))

    # numerical sanity on-chip (sum equality within bf16 tolerance)
    a = float(jp(w, x, jnp.asarray(0.0, jnp.bfloat16)))
    b = float(jf(w, xp, jnp.asarray(0.0, jnp.bfloat16)))
    ok = abs(a - b) / (abs(a) + 1e-6) < 2e-2

    def runner(fn, *args):
        def run(salt):
            out = fn(*args, salt)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (jnp.sum(leaf) * 1e-20).astype(jnp.bfloat16)
        return run

    tpf = time_chain(runner(jp, w, x)) * 1e3
    tff = time_chain(runner(jf, w, xp)) * 1e3
    tpg = time_chain(runner(gp, w, x)) * 1e3
    tfg = time_chain(runner(gf, w, xp)) * 1e3
    print(f"[lanepack] {name:28s} plain fwd {tpf:6.2f} bwd+ {tpg:6.2f} | "
          f"folded fwd {tff:6.2f} bwd+ {tfg:6.2f} | match={ok}", flush=True)


def bench_elementwise():
    rng = np.random.default_rng(0)
    flat = rng.standard_normal(64 * 160 * 160 * 16).astype(np.float32)
    a = jnp.asarray(flat.reshape(64, 160, 160, 16), jnp.bfloat16)
    b = jnp.asarray(flat.reshape(64, 160, 20, 128), jnp.bfloat16)

    for name, t in [("silu_(64,160,160,16)", a), ("silu_(64,160,20,128)", b)]:
        fn = jax.jit(lambda x, s: jnp.sum(jax.nn.silu(x + s).astype(jnp.float32)))

        def run(salt, fn=fn, t=t):
            return (fn(t, salt) * 1e-20).astype(jnp.bfloat16)

        ms = time_chain(run) * 1e3
        print(f"[lanepack] {name:28s} {ms:6.2f} ms", flush=True)


def main() -> None:
    bench_elementwise()
    bench_pair("conv3x3_16_160_f8", 160, 160, 16, 16, 3, 1, 8)
    bench_pair("conv1x1_32_160_f4", 160, 160, 32, 32, 1, 1, 4)
    bench_pair("conv3x3s2_16to32_320_f8", 320, 320, 16, 32, 3, 2, 8)
    bench_pair("stem3to16_640_f40", 640, 640, 3, 16, 3, 2, 40)
    bench_pair("conv3x3_32_80_f4", 80, 80, 32, 32, 3, 1, 4)


if __name__ == "__main__":
    main()
