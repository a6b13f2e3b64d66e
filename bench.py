"""Benchmark: YOLOv8n-MGA (CBAM) throughput at 640 px on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
headline value is inference img/s (as in every prior round), plus a "train"
sub-object {img_s, step_ms, batch} measuring the full shipped-default train
step (fwd + multi-task loss + bwd + SGD + EMA, donated state) at b128 — the
round-3 verdict asked for the train number to be driver-visible, not
self-reported (VERDICT.md r3 next #2).
Baseline = the torch reference measured on this sandbox's CPU:
6.54 img/s (640 px, batch 1, eval forward — see BASELINE.md).

Measurement notes:
* This environment's device tunnel is fully async — ``block_until_ready``
  returns early — so wall-timing single dispatches is meaningless.  Instead we
  time two jitted programs that chain K1 and K2 *data-dependent* forwards and
  take (t_K2 - t_K1) / (K2 - K1): tunnel latency and fetch cost cancel out.
* bf16 params + activations (v5e MXU native), batch 32.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compile cache: first-ever compile of the 640px graph is slow on
# the remote-compile tunnel; cache it next to the repo for later runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 6.54  # torch reference, CPU, 640px b1 (BASELINE.md)
IMGSZ = 640
# throughput-vs-batch sweep (VERDICT r2 item: pick the throughput-optimal
# batch instead of assuming 32); override with MGA_BENCH_BATCHES=32,64
BATCHES = tuple(
    int(b) for b in os.environ.get("MGA_BENCH_BATCHES", "32,64,128").split(",")
)
K1, K2 = 1, 5
REPS = 7


def make_chained_forward(model, n_chain: int, dtype):
    @jax.jit
    def forward(v, x):
        s = jnp.asarray(0, dtype)
        out = None
        for _ in range(n_chain):
            out = model.apply(v, x + s, train=False)["det"][0]
            s = s + (jnp.sum(out) * 1e-20).astype(dtype)  # serialize iterations
        return jnp.sum(out)

    return forward


def measure(f1, f2, v, x, batch: int) -> float:
    """Median K-chain-difference throughput (img/s) for one batch size."""
    float(f1(v, x))  # compile / cache load
    float(f2(v, x))
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(f1(v, x))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f2(v, x))
        t2s.append(time.perf_counter() - t0)
    per_forward = (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)
    return batch / per_forward


def _fail(msg: str) -> None:
    print(json.dumps({
        "metric": "YOLOv8n-MGA images/sec/chip at 640px",
        "value": 0.0, "unit": "img/s", "vs_baseline": 0.0, "error": msg,
    }), flush=True)
    os._exit(1)


def _require_devices(timeout_s: float = 600.0):
    """Fail fast with an explicit JSON error when the TPU tunnel is down.

    Device init over a dead axon tunnel blocks indefinitely; a hung bench
    would stall the whole driver. The probe runs in a daemon thread so the
    process can still exit if it never returns."""
    import threading

    out: dict = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report any backend failure
            out["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        _fail(out.get("error", f"device init exceeded {timeout_s:.0f}s (tunnel down?)"))
    return out["devices"]


def measure_train(batch: int = 128) -> dict:
    """Full-train-step throughput on the SHIPPED default path (auto
    resolvers: plain-XLA attention under grad, lane-pack off since round 4,
    remat per resolve_remat) with the same K-chain difference method. Returns
    {img_s, step_ms, batch} or {"error": ...} — a train-bench failure must
    not take down the inference headline."""
    import numpy as np_

    from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S
    from tools.scripts.bench_train import make_batch

    k1, k2, reps = 2, 12, 5
    cfg = load_config({})
    model, spec = create_model(
        "configs/models/yolov8_cbam.yaml", scale="n", nc=1,
        use_pallas="auto", lane_pack="auto", lane_pack_regions="auto",
        remat="auto", training=True,
    )
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    mesh = S.data_mesh(jax.devices()[:1])
    data = S.host_local_to_global(make_batch(batch, IMGSZ), mesh)
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

    def chain(n):
        s = jax.tree_util.tree_map(jnp.copy, st)
        m = None
        for _ in range(n):
            s, m = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
        return float(m["loss"])  # value fetch — see async-tunnel timing notes

    chain(1)  # compile
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); chain(k1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(k2); t2s.append(time.perf_counter() - t0)
    per_step = (float(np_.median(t2s)) - float(np_.median(t1s))) / (k2 - k1)
    return {
        "img_s": round(batch / per_step, 1),
        "step_ms": round(per_step * 1e3, 2),
        "batch": batch,
    }


def main() -> None:
    _require_devices()
    # hard ceiling on total runtime: emit an explicit error instead of a hang
    import threading

    watchdog = threading.Timer(2700.0, _fail, args=("bench exceeded 45 min",))
    watchdog.daemon = True
    watchdog.start()

    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S

    dtype = jnp.bfloat16
    # the DEFAULT shipped inference path: use_pallas="auto" resolves exactly as
    # mga-predict/mga-serve/mga-val do (fused Pallas attention on TPU), so the
    # headline number is the number users get
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1,
                               use_pallas="auto", training=False)
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    variables = {"params": {k: v for k, v in st.params.items() if k != "mtl_log_vars"}}
    if st.batch_stats:
        variables["batch_stats"] = st.batch_stats
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, variables
    )
    f1 = make_chained_forward(model, K1, dtype)
    f2 = make_chained_forward(model, K2, dtype)

    rng = np.random.default_rng(0)
    best_ips, best_batch = 0.0, BATCHES[0]
    for batch in BATCHES:
        x = jnp.asarray(rng.random((batch, IMGSZ, IMGSZ, 3)), dtype)
        try:
            ips = measure(f1, f2, v, x, batch)
        except Exception as e:  # e.g. HBM OOM at large batch
            print(f"[bench] batch {batch}: failed ({type(e).__name__})", file=sys.stderr)
            continue
        print(f"[bench] batch {batch}: {ips:.0f} img/s", file=sys.stderr)
        if ips > best_ips:
            best_ips, best_batch = ips, batch
        del x

    try:
        train = measure_train()
    except Exception as e:  # noqa: BLE001 — keep the inference headline alive
        train = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
    print(f"[bench] train: {train}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"YOLOv8n-MGA images/sec/chip at 640px (bf16, batch {best_batch})",
                "value": round(best_ips, 1),
                "unit": "img/s",
                "vs_baseline": round(best_ips / BASELINE_IMG_S, 2),
                "train": train,
            }
        )
    )


if __name__ == "__main__":
    main()
