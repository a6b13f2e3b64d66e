"""A/B: lax.top_k (sort-based) vs lax.approx_max_k(recall=1.0) (PartialReduce)
for the assigner's kth-value computation over (B, M, A) — values only.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_topk.py
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("MGA_BENCH_BATCH", "128"))
M, A, K = 28, 8400, 10
K1, K2, REPS = 2, 10, 5


def timeit(fn, *args):
    def chain(n):
        salt = jnp.asarray(0.0, jnp.float32)
        for _ in range(n):
            salt = fn(*args, salt) * 1e-20
        return float(salt)

    chain(1)
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)


def main() -> None:
    rng = np.random.default_rng(0)
    # assigner-like sparsity: most entries zero, a few hundred positives/gt
    metric = np.zeros((B, M, A), np.float32)
    nz = rng.integers(0, A, (B, M, 300))
    for b in range(0, B, 16):
        metric[b, np.arange(M)[:, None], nz[b]] = rng.random((M, 300))
    metric = jnp.asarray(metric)

    @jax.jit
    def f_sort(m, salt):
        return jax.lax.top_k(m + salt, K)[0][..., -1].sum()

    @jax.jit
    def f_approx(m, salt):
        v = jax.lax.approx_max_k(m + salt, K, recall_target=1.0)[0]
        return v[..., -1].sum()

    a = float(f_sort(metric, 0.0))
    b = float(f_approx(metric, 0.0))
    print(f"kth-sum sort={a:.4f} approx={b:.4f} match={abs(a - b) < 1e-3}")
    t_sort = timeit(f_sort, metric) * 1e3
    t_approx = timeit(f_approx, metric) * 1e3
    print(f"top_k(sort) {t_sort:.2f} ms   approx_max_k(recall=1.0) {t_approx:.2f} ms")


if __name__ == "__main__":
    main()
