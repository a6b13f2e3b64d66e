"""Hermetic environment for subprocess (e2e) tests.

The sandbox preloads an experimental TPU-tunnel JAX plugin via
``PYTHONPATH=/root/.axon_site`` + ``PALLAS_AXON_*`` env vars; a fresh python
process that inherits those re-registers the plugin and can stall minutes on
tunnel init even with ``JAX_PLATFORMS=cpu`` (measured: the same ``mga-ckpt``
command takes 6m42s with the tunnel env present, 1m12s without). Subprocess
tests must therefore *strip* every tunnel-related variable instead of merely
overriding the platform — mirrors the reference's hermetic-suite property
(`/root/reference/pytest.ini:1-4`, whose tests never inherit CUDA env state).
"""

import os
import sys


def cpu_subprocess_env(device_count: int = 2, compile_cache_dir: str | None = None) -> dict:
    """Environment for a CPU-only child python, with the TPU tunnel stripped.

    ``compile_cache_dir`` enables the JAX persistent compilation cache (all
    thresholds zeroed). Multi-process CPU tests MUST share one cache dir
    across all workers and retries: XLA:CPU's Gloo rendezvous waits only 30 s
    (hardcoded) in GetKeyValue, and on this 1-core box two workers compiling
    ~120 identical programs serially accumulate far more compile skew than
    that — the laggard then times out mid-cluster. A shared cache lets the
    laggard hit the leader's entries and collapses the skew.
    """
    env = {
        k: v
        for k, v in os.environ.items()
        if not (k.startswith("PALLAS_AXON") or k.startswith("AXON_"))
    }
    # PYTHONPATH exists solely to inject the tunnel's sitecustomize; replace it
    # with the repo root so `python -m mga_yolo_tpu...` works from any cwd.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    base_flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        base_flags + f" --xla_force_host_platform_device_count={device_count}"
    ).strip()
    if compile_cache_dir is not None:
        env["JAX_COMPILATION_CACHE_DIR"] = str(compile_cache_dir)
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    return env


PYTHON = sys.executable
