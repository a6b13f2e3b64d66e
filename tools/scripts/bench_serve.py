"""Serving latency/throughput curve (ROADMAP r3: serving surface).

Drives the in-process InferenceEngine + MicroBatcher (no HTTP overhead) at
increasing offered concurrency and reports per-request latency percentiles
and sustained throughput, one JSON line per point.

Usage:
    python -m tools.scripts.bench_serve [--imgsz 640] [--batch 8] \
        [--concurrency 1,4,8,16] [--requests 64] [--weights ckpt]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def run_point(batcher, imgsz: int, concurrency: int, n_requests: int) -> dict:
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 255, (imgsz, imgsz, 3)).astype(np.uint8) for _ in range(8)
    ]
    latencies: list[float] = []
    lock = threading.Lock()
    sem = threading.Semaphore(concurrency)
    done = threading.Event()
    remaining = [n_requests]

    def worker(i: int) -> None:
        t0 = time.perf_counter()
        try:
            batcher.submit(imgs[i % len(imgs)], timeout=120)
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                latencies.append(dt)
                remaining[0] -= 1
                if remaining[0] == 0:
                    done.set()
            sem.release()

    t_start = time.perf_counter()
    for i in range(n_requests):
        sem.acquire()
        threading.Thread(target=worker, args=(i,), daemon=True).start()
    done.wait(timeout=600)
    wall = time.perf_counter() - t_start
    lat = np.asarray(latencies)
    return {
        "concurrency": concurrency,
        "throughput_img_s": round(n_requests / wall, 1),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
        "latency_ms_max": round(float(lat.max()), 1),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser("bench-serve")
    p.add_argument("--weights", default=None, help="checkpoint; fresh-init model if omitted")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--concurrency", default="1,4,8,16,32")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--depths", default="4", help="pipeline depths to A/B, e.g. 1,4")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mga_yolo_tpu.serve import InferenceEngine, MicroBatcher

    if args.weights:
        from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

        model, variables, meta = rebuild_from_checkpoint(args.weights)
    else:
        from mga_yolo_tpu.models.yolo import create_model

        model, _ = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1,
                                use_pallas=True)
        variables = dict(
            jax.jit(lambda r, x: model.init(r, x, train=False))(
                jax.random.PRNGKey(0), np.zeros((1, 256, 256, 3), np.float32)
            )
        )
    engine = InferenceEngine(model, variables, imgsz=args.imgsz, batch=args.batch)
    print(f"[bench-serve] compile: {engine.warmup():.1f}s", flush=True)
    for depth in (int(d) for d in args.depths.split(",")):
        batcher = MicroBatcher(engine, max_wait_ms=args.max_wait_ms, depth=depth)
        try:
            for c in (int(x) for x in args.concurrency.split(",")):
                point = run_point(batcher, args.imgsz, c, args.requests)
                point["batch"] = args.batch
                point["imgsz"] = args.imgsz
                point["depth"] = depth
                print(json.dumps(point), flush=True)
        finally:
            batcher.close()


if __name__ == "__main__":
    main()
