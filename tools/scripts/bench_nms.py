"""Benchmark: XLA nms_jax vs Pallas nms_jax_pallas at validation settings.

Val settings = decoded YOLOv8n@640 output: (B, 8400, 4+nc), conf 0.001,
iou 0.7, max_nms 1024, max_det 300. Uses the same K-chain difference timing
as bench.py (the device tunnel is async). Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

B, A, NC = 16, 8400, 1
CONF, IOU, MAX_DET, MAX_NMS = 0.001, 0.7, 300, 1024
K1, K2, REPS = 1, 4, 7


def chained(nms_fn, n_chain):
    @jax.jit
    def run(pred):
        s = jnp.asarray(0.0, jnp.float32)
        out = None
        for _ in range(n_chain):
            boxes, scores, cls = nms_fn(pred + s * 1e-20)
            out = jnp.sum(scores)
            s = s + out * 1e-20  # serialize iterations
        return out

    return run


def measure(nms_fn, pred) -> float:
    f1, f2 = chained(nms_fn, K1), chained(nms_fn, K2)
    float(f1(pred)); float(f2(pred))
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); float(f1(pred)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(pred)); t2s.append(time.perf_counter() - t0)
    per = (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)
    return per / B * 1e3  # ms per image


def main() -> None:
    from functools import partial

    from mga_yolo_tpu.ops.nms import nms_jax
    from mga_yolo_tpu.ops.pallas.nms import nms_jax_pallas

    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 640, (B, A, 2))
    wh = rng.uniform(4, 120, (B, A, 2))
    probs = rng.uniform(0, 1, (B, A, NC)) ** 4
    pred = jnp.asarray(np.concatenate([xy, wh, probs], -1).astype(np.float32))

    kw = dict(conf_thres=CONF, iou_thres=IOU, max_det=MAX_DET, max_nms=MAX_NMS)
    for name, fn in (("xla", nms_jax), ("pallas", nms_jax_pallas)):
        ms = measure(partial(fn, **kw), pred)
        print(json.dumps({"metric": f"nms_{name} ms/img (B{B}, A{A}, k{MAX_NMS})",
                          "value": round(ms, 3), "unit": "ms"}))


if __name__ == "__main__":
    main()
