"""Interleaved train-step A/B on one chip — variance-proof arm comparison.

Cross-process A/Bs through the TPU tunnel drift by +-15% run to run
(BASELINE.md round-3 notes: the same xla-plain b128 config measured 1139
then 988 img/s two hours apart), which swamps 5-10% effects. This harness
builds every arm in ONE process, compiles all step functions up front, then
interleaves the timed chains arm-by-arm per repetition so slow-drift affects
all arms equally. Report: per-arm median step ms + img/s.

Arms come from MGA_AB_ARMS (JSON list of {label, pallas, lanepack, regions,
remat}); batch from MGA_AB_BATCH (default 128), image size MGA_AB_IMGSZ.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_ab_train.py
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

IMGSZ = int(os.environ.get("MGA_AB_IMGSZ", "640"))
BATCH = int(os.environ.get("MGA_AB_BATCH", "128"))
K1, K2 = 2, 12
REPS = int(os.environ.get("MGA_AB_REPS", "7"))
DEFAULT_ARMS = [
    {"label": "plain", "pallas": 0, "lanepack": "0", "regions": "auto", "remat": "0"},
    {"label": "lanepack_prefix", "pallas": 0, "lanepack": "auto", "regions": "prefix", "remat": "0"},
]


def main() -> None:
    from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S
    from tools.scripts.bench_train import make_batch

    arms = json.loads(os.environ.get("MGA_AB_ARMS", "")) if os.environ.get("MGA_AB_ARMS") else DEFAULT_ARMS
    cfg = load_config({})
    mesh = S.data_mesh(jax.devices()[:1])
    # default batch data; arms may override with {"batch": N} (per-arm data
    # cached by size so two arms at the same batch share one upload)
    _data_cache: dict[int, object] = {}

    def data_for(b: int):
        if b not in _data_cache:
            d = S.host_local_to_global(make_batch(b, IMGSZ), mesh)
            jax.block_until_ready(d["image"])
            _data_cache[b] = d
        return _data_cache[b]

    data = data_for(BATCH)
    rngk = jax.random.PRNGKey(1)

    runners = []
    for arm in arms:
        # per-arm env knobs (e.g. MGA_PACKED_SPLIT_IMPL) — read at TRACE time
        # by the modules, so setting them just before create_model/compile
        # lets one process compare env-selected implementations fairly
        os.environ.update({k: str(v) for k, v in arm.get("env", {}).items()})
        model, spec = create_model(
            "configs/models/yolov8_cbam.yaml", scale="n", nc=1,
            use_pallas=bool(arm.get("pallas", 0)),
            lane_pack=str(arm.get("lanepack", "0")),
            lane_pack_regions=str(arm.get("regions", "auto")),
            remat=str(arm.get("remat", "0")),
        )
        st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
        step_fn = S.jit_train_step(
            S.make_train_step(
                model, (8, 16, 32), spec.nc, det_loss_config(cfg), seg_loss_config(cfg),
                weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
                compute_dtype=jnp.bfloat16,
            ),
            mesh,
        )

        arm_batch = int(arm.get("batch", BATCH))
        arm_data = data_for(arm_batch)

        def chain(n, _step=step_fn, _st=st, _d=arm_data):
            s = jax.tree_util.tree_map(jnp.copy, _st)
            m = None
            for _ in range(n):
                s, m = _step(s, _d, 0.01, 0.01, 0.9, rngk)
            return float(m["loss"])

        print(f"[ab] compiling {arm['label']}", flush=True)
        try:
            chain(1)
        except Exception as e:  # e.g. HBM OOM at large batches
            print(f"[ab] arm {arm['label']} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        runners.append((arm["label"], chain, arm_batch))

    results = {label: {"t1": [], "t2": []} for label, _, _ in runners}
    for rep in range(REPS):
        for label, chain, _ in runners:
            t0 = time.perf_counter(); chain(K1); results[label]["t1"].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); chain(K2); results[label]["t2"].append(time.perf_counter() - t0)
        print(f"[ab] rep {rep + 1}/{REPS} done", flush=True)

    out = {"batch": BATCH, "imgsz": IMGSZ, "arms": {}}
    arm_batches = {label: b for label, _, b in runners}
    for label, r in results.items():
        # per-rep step estimates, so the output shows spread (is an arm gap
        # bigger than the within-process rep-to-rep noise?)
        per_rep = [(b - a) / (K2 - K1) * 1e3 for a, b in zip(r["t1"], r["t2"])]
        per_step = float(np.median(per_rep))
        out["arms"][label] = {"step_ms": round(per_step, 2),
                              "batch": arm_batches[label],
                              "img_s": round(arm_batches[label] / per_step * 1e3, 1),
                              "rep_ms": [round(t, 1) for t in per_rep]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
