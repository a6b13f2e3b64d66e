"""Capture a jax.profiler device trace of the train step (per-op attribution).

Writes a TensorBoard trace to /tmp/mga_trace; if the axon tunnel backend
returns op-less traces (as in round 2), the fallback remains ablation timing
(bench_step_parts.py / bench_ab_train.py). On success, summarize the top ops
by self-time from the .trace.json.gz / .xplane.pb artifacts.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/profile_step.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

TRACE_DIR = os.environ.get("MGA_TRACE_DIR", "/tmp/mga_trace")
IMGSZ = int(os.environ.get("MGA_BENCH_IMGSZ", "640"))
BATCH = int(os.environ.get("MGA_BENCH_BATCH", "128"))


def main() -> None:
    from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S
    from tools.scripts.bench_train import make_batch

    cfg = load_config({})
    model, spec = create_model(
        "configs/models/yolov8_cbam.yaml", scale="n", nc=1,
        use_pallas=os.environ.get("MGA_BENCH_PALLAS", "0"),
        lane_pack=os.environ.get("MGA_BENCH_LANEPACK", "0"),
    )
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    mesh = S.data_mesh(jax.devices()[:1])
    data = S.host_local_to_global(make_batch(BATCH, IMGSZ), mesh)
    jax.block_until_ready(data["image"])
    rngk = jax.random.PRNGKey(1)
    step_fn = S.jit_train_step(
        S.make_train_step(
            model, (8, 16, 32), spec.nc, det_loss_config(cfg), seg_loss_config(cfg),
            weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
            compute_dtype=jnp.bfloat16,
        ),
        mesh,
    )
    # warm up / compile outside the trace
    s = st
    for _ in range(3):
        s, m = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            s, m = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
        jax.block_until_ready(m["loss"])

    arts = sorted(glob.glob(f"{TRACE_DIR}/**/*", recursive=True))
    print(json.dumps({"artifacts": [a for a in arts if os.path.isfile(a)]}, indent=1))

    # try the trace-event json first (human-greppable)
    for tj in [a for a in arts if a.endswith(".trace.json.gz")]:
        with gzip.open(tj, "rt") as f:
            data = json.load(f)
        evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and e.get("dur")]
        agg: dict[str, float] = {}
        for e in evs:
            agg[e["name"]] = agg.get(e["name"], 0.0) + e["dur"]
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
        print(f"== {tj}: {len(evs)} events ==")
        for name, dur in top:
            print(f"{dur/1e3:10.3f} ms  {name[:140]}")


if __name__ == "__main__":
    main()
