"""On-chip A/B of device-side augmentation (VERDICT r3 "Next #4").

Round 3 measured `augment.on_device` only on the 1-core CPU host
(22.5 -> 99.3 img/s host-pipeline work, bit-exact geometry); no real-TPU
training ever ran with it. This runs the SAME short training twice on the
real chip through the full CLI path — host augmentation vs device
augmentation — and reports per-epoch wall time, steady-state train
throughput, and the per-epoch loss columns side by side (the convergence
check: device aug is bit-exact for geometry/masks and <=1 grey level for
HSV, so losses must track within noise).

The reference has no device-aug equivalent (its augment.py is all host
cv2, `/root/reference/.../data/augment.py`): this measures the "beat" axis
on the host-bound regime a 1-core TPU-VM host represents.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_device_aug_tpu.py
"""

from __future__ import annotations

import csv
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

OUT = Path(os.environ.get("MGA_DEVAUG_OUT", "/tmp/devaug_ab"))
N = int(os.environ.get("MGA_DEVAUG_N", "192"))
IMGSZ = int(os.environ.get("MGA_DEVAUG_IMGSZ", "640"))
EPOCHS = int(os.environ.get("MGA_DEVAUG_EPOCHS", "3"))
BATCH = int(os.environ.get("MGA_DEVAUG_BATCH", "32"))


def run_arm(name: str, on_device: bool, data_yaml: Path) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    # the trainer's resolve_save_dir increments colliding names (host_aug ->
    # host_aug2); a stale dir from a previous bench run would silently serve
    # its old results.csv — clear it so the read below is this run's
    run_dir = OUT / "runs" / name
    if run_dir.exists():
        shutil.rmtree(run_dir)
    t0 = time.perf_counter()
    cmd = [
        sys.executable, "-m", "mga_yolo_tpu.cli.train",
        "--data", str(data_yaml), "--imgsz", str(IMGSZ),
        "--epochs", str(EPOCHS), "--batch", str(BATCH),
        "--workers", "2", "--cache", "ram",
        "--on_device", "true" if on_device else "false",
        "--project", str(OUT / "runs"), "--name", name,
        "--seed", "0", "--plots", "false",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=3000)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"arm {name} failed")
    if on_device and "augment.on_device disabled" in r.stdout:
        # the trainer silently falls back to host augmentation when the
        # config needs host-only pieces — two identical host arms would
        # masquerade as a valid A/B
        line = next(l for l in r.stdout.splitlines() if "on_device disabled" in l)
        raise SystemExit(f"arm {name} fell back to host augmentation: {line}")
    rows = list(csv.DictReader(open(run_dir / "results.csv")))
    return {"wall_s": round(wall, 1), "rows": rows}


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from tests.synth import create_synthetic_dataset

    data_yaml = create_synthetic_dataset(OUT / "ds", n=N, size=IMGSZ)
    arms = {}
    for name, dev in (("host_aug", False), ("device_aug", True)):
        arms[name] = run_arm(name, dev, data_yaml)
        print(f"[devaug] {name}: wall {arms[name]['wall_s']}s", flush=True)

    report = {"n": N, "imgsz": IMGSZ, "epochs": EPOCHS, "batch": BATCH}
    for name, a in arms.items():
        ep_times = [float(r["time"]) for r in a["rows"] if r.get("time")]
        # steady state = epochs after the first (compile + cache warmup)
        steady = ep_times[1:] or ep_times
        report[name] = {
            "wall_s": a["wall_s"],
            "epoch_s": [round(t, 1) for t in ep_times],
            "steady_img_s": round(N * len(steady) / sum(steady), 1) if steady else None,
            "losses": [
                {k: round(float(r[k]), 4) for k in r
                 if k.startswith(("train/", "val/")) and r[k] not in ("", None)}
                for r in a["rows"]
            ],
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
