"""Bisect WHAT is slow inside the backward of the hot C2f/Conv layers.

bench_layerwise named the offenders (l2 C2f @160x160xC32 bwd 12.95 ms, l4 C2f
@80x80xC64 bwd 10.28 ms, Detect bwd 9.45 ms, stem convs ~12 ms — b64@640).
This times the *constituent ops* of those blocks standalone (fwd and fwd+bwd,
grads wrt params+input, train-mode BN, bf16) plus FLOPs-matched MXU-friendly
calibration shapes, so the penalty factor of small-C high-res tensors is a
measured number, not a theory. K-chain difference timing as in bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_c2f_bisect.py
Env: MGA_BENCH_BATCH (64).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("MGA_BENCH_BATCH", "64"))
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


def bench_module(name, module, in_shape, rows):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, *in_shape)), jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0), x, train=True)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables.get("params", {}),
    )
    bs = variables.get("batch_stats", {})

    def fwd(p, xx, salt):
        mv = {"params": p}
        kw = {}
        if bs:
            mv["batch_stats"] = bs
            out = module.apply(mv, xx + salt, train=True, mutable=["batch_stats"], **kw)[0]
        else:
            out = module.apply(mv, xx + salt, train=True, **kw)
        return jnp.sum(out.astype(jnp.float32))

    jfwd = jax.jit(fwd)
    jgrad = jax.jit(jax.grad(fwd, argnums=(0, 1)))

    def run_f(salt):
        v = jfwd(params, x, salt)
        return (v * 1e-20).astype(jnp.bfloat16)

    def run_g(salt):
        g, gx = jgrad(params, x, salt)
        leaf = jax.tree_util.tree_leaves(g)[0] if jax.tree_util.tree_leaves(g) else gx
        return (jnp.sum(leaf) * 1e-20).astype(jnp.bfloat16)

    tf = time_chain(run_f) * 1e3
    tg = time_chain(run_g) * 1e3
    rows.append({"name": name, "in": list(in_shape), "fwd_ms": round(tf, 2),
                 "fwd_bwd_ms": round(tg, 2), "bwd_ms": round(tg - tf, 2)})
    print(f"[bisect] {name:34s} in={str(in_shape):18s} fwd {tf:6.2f} ms  "
          f"fwd+bwd {tg:6.2f} ms  bwd {tg - tf:6.2f} ms", flush=True)


class PlainConv(nn.Module):
    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        p = self.k // 2
        return nn.Conv(self.c2, (self.k, self.k), (self.s, self.s),
                       padding=((p, p), (p, p)), use_bias=False, name="conv")(x)


class ConvSiLU(PlainConv):
    @nn.compact
    def __call__(self, x, train=False):
        p = self.k // 2
        x = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False, name="conv")(x)
        return nn.silu(x)


class BNOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.97,
                            epsilon=1e-3, name="bn")(x)


class SplitConcat(nn.Module):
    """The C2f dataflow skeleton without any convs."""

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1] // 2
        ys = [x[..., :c], x[..., c:]]
        ys.append(ys[-1] * 1.0001 + ys[-2][..., :c])
        return jnp.concatenate(ys, axis=-1)


def main() -> None:
    from mga_yolo_tpu.models.layers import C2f, ConvBN

    rows = []
    # ---- the l2 C2f decomposed (in 160x160x32, c=16 bottleneck) ----
    bench_module("C2f_l2_full", C2f(32, n=1, shortcut=True), (160, 160, 32), rows)
    bench_module("ConvBN_3x3_16_160", ConvBN(16, 3), (160, 160, 16), rows)
    bench_module("PlainConv_3x3_16_160", PlainConv(16, 3), (160, 160, 16), rows)
    bench_module("ConvSiLU_3x3_16_160", ConvSiLU(16, 3), (160, 160, 16), rows)
    bench_module("BN_16_160", BNOnly(), (160, 160, 16), rows)
    bench_module("ConvBN_1x1_32_160", ConvBN(32, 1), (160, 160, 32), rows)
    bench_module("SplitConcat_32_160", SplitConcat(), (160, 160, 32), rows)

    # ---- FLOPs-matched MXU-friendly calibrations ----
    # 3x3 16ch @160^2 == 3x3 128ch @ 56^2 roughly in MACs (16^2*160^2 vs 128^2*57^2 /8... )
    # exact: C^2*HW match: 16^2*160^2 = 6.55e6 ; 128^2*40^2 = 2.62e7 (4x) -> use 64ch@80^2 = 2.62e7 (4x)
    bench_module("CAL_PlainConv_3x3_128_40", PlainConv(128, 3), (40, 40, 128), rows)
    bench_module("CAL_ConvBN_3x3_128_40", ConvBN(128, 3), (40, 40, 128), rows)
    bench_module("CAL_PlainConv_3x3_64_80", PlainConv(64, 3), (80, 80, 64), rows)

    # ---- the l4 C2f (in 80x80x64, c=32) and l0/l1 stem convs ----
    bench_module("C2f_l4_full", C2f(64, n=2, shortcut=True), (80, 80, 64), rows)
    bench_module("ConvBN_3x3_32_80", ConvBN(32, 3), (80, 80, 32), rows)
    bench_module("Stem_l0_3x3s2_3to16_640", ConvBN(16, 3, 2), (640, 640, 3), rows)
    bench_module("Stem_l1_3x3s2_16to32_320", ConvBN(32, 3, 2), (320, 320, 16), rows)

    # ---- Detect-head constituent convs (nc=1 tail) ----
    bench_module("Det_cls_tail_64to1_80", PlainConv(1, 1), (80, 80, 64), rows)
    bench_module("Det_cv_3x3_64_80", ConvBN(64, 3), (80, 80, 64), rows)

    print(json.dumps({"batch": BATCH, "rows": rows}, indent=1), flush=True)


if __name__ == "__main__":
    main()
