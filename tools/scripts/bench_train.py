"""Train-step throughput + MFU on one chip (VERDICT r2: record a train-step
time / MFU figure, not just inference).

Times the full jitted train step (forward + multi-task loss + optimizer +
EMA, donated state) with the same K-chain difference method as bench.py:
state_{i+1} = step(state_i) is naturally data-dependent, so chaining K steps
and differencing cancels the async tunnel latency.

Prints one JSON line per batch size with img/s, step ms, and estimated MFU
(fwd-FLOPs from jax cost_analysis; train step ~= 3x forward FLOPs).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

IMGSZ = int(__import__("os").environ.get("MGA_BENCH_IMGSZ", "640"))
BATCHES = tuple(int(b) for b in __import__("os").environ.get("MGA_BENCH_BATCHES", "32,64,128").split(","))
# long chains: the K-difference must sit well above the tunnel's per-call
# jitter (tens of ms) or the measurement is noise
K1, K2, REPS = 2, 14, 7
PEAK_TFLOPS = 197.0  # v5e bf16


def make_batch(batch: int, imgsz: int, m: int = 8):
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (batch, imgsz, imgsz, 3)).astype(np.uint8),
        "gt_boxes": np.tile(np.array([[60.0, 60.0, 300.0, 300.0]], np.float32), (batch, m, 1)),
        "gt_labels": np.zeros((batch, m), np.int32),
        "mask_gt": np.concatenate(
            [np.ones((batch, 1), np.float32), np.zeros((batch, m - 1), np.float32)], axis=1
        ),
        "masks": [np.ones((batch, imgsz // s, imgsz // s, 1), np.float32) for s in (8, 16, 32)],
    }


def main() -> None:
    from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S

    cfg = load_config({})
    variant = os.environ.get("MGA_BENCH_VARIANT", "cbam")
    scale = os.environ.get("MGA_BENCH_SCALE", "n")
    # defaults mirror the SHIPPED trainer path ("auto" resolution, models/
    # yolo.py resolvers) so the headline number is the number users get;
    # env overrides exist for A/B isolation
    model, spec = create_model(f"configs/models/yolov8_{variant}.yaml", scale=scale, nc=1,
                               use_pallas=os.environ.get("MGA_BENCH_PALLAS", "auto"),
                               lane_pack=os.environ.get("MGA_BENCH_LANEPACK", "auto"),
                               lane_pack_regions=os.environ.get("MGA_BENCH_REGIONS", "auto"),
                               remat=os.environ.get("MGA_BENCH_REMAT", "auto"))
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    mesh = S.data_mesh(jax.devices()[:1])
    step_fn = S.jit_train_step(
        S.make_train_step(
            model, (8, 16, 32), spec.nc, det_loss_config(cfg), seg_loss_config(cfg),
            weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
            compute_dtype=jnp.bfloat16,
        ),
        mesh,
    )

    # forward GFLOPs estimate for MFU (train ~= 3x forward)
    try:
        x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
        variables = {"params": {k: v for k, v in st.params.items() if k != "mtl_log_vars"}}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(variables, x)
        an = lowered.cost_analysis()
        if not an or not an.get("flops"):
            an = lowered.compile().cost_analysis()
        fwd_gflops = ((an.get("flops") if an else 0.0) or 0.0) / 1e9
    except Exception:
        fwd_gflops = 0.0

    rngk = jax.random.PRNGKey(1)

    for batch in BATCHES:
        # batch resident on device once — per-call host numpy would re-send
        # ~150 MB over the tunnel every step and measure H2D, not compute
        data = S.host_local_to_global(make_batch(batch, IMGSZ), mesh)
        jax.block_until_ready(data["image"])

        def chain(n):
            s = st
            # fresh state copy per run (donation consumes buffers)
            s = jax.tree_util.tree_map(jnp.copy, s)
            for i in range(n):
                s, metrics = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
            # value fetch, NOT block_until_ready: the async tunnel returns
            # early from block_until_ready (see bench.py timing notes)
            return float(metrics["loss"])

        try:
            chain(1)  # compile
            t1s, t2s = [], []
            for _ in range(REPS):
                t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
            per_step = (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)
        except Exception as e:
            print(f"[bench_train] batch {batch}: failed ({type(e).__name__}: {e})", file=sys.stderr)
            continue
        ips = batch / per_step
        mfu = (3.0 * fwd_gflops * ips) / (PEAK_TFLOPS * 1e3) if fwd_gflops else None
        print(json.dumps({
            "metric": f"train img/s/chip at {IMGSZ}px (bf16, batch {batch}, {variant}-{scale})",
            "value": round(ips, 1), "unit": "img/s",
            "step_ms": round(per_step * 1e3, 2),
            "fwd_gflops_per_img": round(fwd_gflops, 2),
            "est_mfu": round(mfu, 3) if mfu is not None else None,
        }))


if __name__ == "__main__":
    main()
