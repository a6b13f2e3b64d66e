"""Microbenchmark: fused Pallas CAM gate vs XLA composition on real TPU.

Measures the full MaskCBAM CAM branch (masked avg/max pooling + shared MLP +
sigmoid) at P3 scale (B, 80, 80, C) three ways:
  xla      — masked_avg_pool/masked_max_pool + Dense MLP (pure XLA)
  pool     — round-1 fused reductions kernel + XLA MLP (masked_pool_fused)
  cam      — round-2 fully-fused kernel (cam_gate_fused, one HBM pass)
K-chain difference timing (async tunnel). One JSON line per variant.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

B, H, W, C, R = 32, 80, 80, 256, 16
K1, K2, REPS = 2, 10, 7


def main() -> None:
    from mga_yolo_tpu.models.attention import masked_avg_pool, masked_max_pool
    from mga_yolo_tpu.ops.pallas.masked_pool import cam_gate_fused, masked_pool_fused

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), dtype)
    m = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), dtype)
    hidden = C // R
    w1 = jnp.asarray(rng.normal(0, 0.1, (C, hidden)), dtype)
    b1 = jnp.asarray(np.zeros(hidden), dtype)
    w2 = jnp.asarray(rng.normal(0, 0.1, (hidden, C)), dtype)
    b2 = jnp.asarray(np.zeros(C), dtype)

    def mlp(d):
        h = jnp.maximum(d.astype(jnp.float32) @ w1.astype(jnp.float32) + b1.astype(jnp.float32), 0.0)
        return h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)

    def gate_xla(x, m):
        return jax.nn.sigmoid(mlp(masked_avg_pool(x, m)) + mlp(masked_max_pool(x, m)))

    def gate_pool(x, m):
        a, mx = masked_pool_fused(x, m)
        return jax.nn.sigmoid(mlp(a) + mlp(mx))

    def gate_cam(x, m):
        return cam_gate_fused(x, m, w1, b1, w2, b2)

    def chained(fn, n):
        @jax.jit
        def run(x, m):
            s = jnp.asarray(0.0, jnp.float32)
            out = None
            for _ in range(n):
                out = fn(x + (s * 1e-20).astype(x.dtype), m)
                s = s + jnp.sum(out)
            return s

        return run

    for name, fn in (("xla", gate_xla), ("pool_fused", gate_pool), ("cam_fused", gate_cam)):
        f1, f2 = chained(fn, K1), chained(fn, K2)
        float(f1(x, m)); float(f2(x, m))
        t1s, t2s = [], []
        for _ in range(REPS):
            t0 = time.perf_counter(); float(f1(x, m)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(f2(x, m)); t2s.append(time.perf_counter() - t0)
        per = (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)
        print(json.dumps({"metric": f"cam_{name} us (B{B} {H}x{W}x{C})",
                          "value": round(per * 1e6, 1), "unit": "us"}))


if __name__ == "__main__":
    main()
