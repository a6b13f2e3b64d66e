"""Worker for the 2-process SPMD test: one jax.distributed process.

Launched by tests/test_multiprocess_spmd.py as
``python -m tests._dist_worker <pid> <nprocs> <port> <data_yaml> <project> <out_json>``.
Each process owns 4 virtual CPU devices (set via env by the parent) and runs
the REAL trainer end-to-end, which exercises the otherwise-dead multi-process
branches: DataLoader host sharding, ``jax.make_array_from_process_local_data``
batch assembly (train/state.py host_local_to_global), the validator's
global-row offset slicing, ``MetricAccumulator.gather_across_hosts`` ragged
allgather, and host-0-only CSV/checkpoint gating — the replacement for the
reference's DDP launcher (`/root/reference/.../engine/trainer.py:209-252`,
`utils/dist.py:29-117`).
"""

import json
import os
import sys
from pathlib import Path


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_yaml, project, out_json = sys.argv[4], sys.argv[5], sys.argv[6]

    # XLA:CPU can create same-clique Gloo collective contexts CONCURRENTLY —
    # from parallel thunks inside one program and from async-dispatched
    # overlapping programs — and two processes then number/rendezvous their
    # contexts in different orders: crossed KV keys, "Gloo context
    # initialization failed: DEADLINE_EXCEEDED" after the hardcoded 30 s KV
    # wait. Both concurrency sources must be closed (measured: either one
    # alone still deadlocks): serialize the thunk scheduler via XLA_FLAGS
    # (before backend init) AND disable async dispatch. TPU runtimes order
    # collectives at compile time, so this is a CPU-backend-only quirk.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_timeout_seconds=600"
        + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    ).strip()

    import jax

    jax.config.update("jax_cpu_enable_async_dispatch", False)

    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
        )

    import yaml

    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.train.trainer import MGATrainer
    from tests.test_remat import MINI_CFG

    # mini graph, not the full cbam-n: XLA:CPU's Gloo gives each collective
    # context a hardcoded 30 s rendezvous window at FIRST execution, and on a
    # 1-core host the full model's per-program compile/AOT-load skew between
    # the two workers can exceed it (measured: big-model runs flake, a
    # minimal 2-process psum is rock solid). The multi-process branches this
    # test proves (input assembly, ragged allgather, rank gating) are
    # model-size-independent.
    mini_yaml = Path(project) / "mini_model.yaml"
    mini_yaml.parent.mkdir(parents=True, exist_ok=True)
    mini_yaml.write_text(yaml.safe_dump(MINI_CFG))

    cfg = load_config(
        dict(
            model=str(mini_yaml),
            data=data_yaml, imgsz=32, max_boxes=4, batch=8, nbs=8, epochs=2,
            mosaic=0.0, workers=0, project=project, name="dist", exist_ok=True,
            seed=0, plots=False, save=True, amp=False, lr0=0.01,
        )
    )
    trainer = MGATrainer(cfg)

    rows = []
    trainer.callbacks.add("on_fit_epoch_end", lambda **kw: rows.append(dict(kw["row"])))
    result = trainer.train()

    run_dir = Path(project) / "dist"
    out = {
        "process_id": pid,
        "num_devices": jax.device_count(),
        "local_devices": len(jax.local_devices()),
        "rows": rows,
        "final": result.results_dict(),
        "csv_exists": (run_dir / "results.csv").exists(),
        "ckpt_exists": (run_dir / "weights" / "best").exists(),
    }
    Path(out_json).write_text(json.dumps(out))
    # align both workers before interpreter exit: jax's atexit shutdown
    # barrier has a short window, and end-of-run skew (host 0 writes
    # CSV/ckpt/final-eval artifacts; compiles contend on a 1-core sandbox)
    # otherwise kills the cluster AFTER all real work succeeded — the exact
    # failure observed on a loaded box (Shutdown::* DEADLINE_EXCEEDED, 1/2).
    # host_barrier goes through the coordination service with an explicit
    # generous timeout, so the fast worker just waits.
    from mga_yolo_tpu.train import state as S

    S.host_barrier("dist-worker:done", timeout_ms=30 * 60 * 1000)
    print(f"[dist-worker {pid}] done")


if __name__ == "__main__":
    main()
