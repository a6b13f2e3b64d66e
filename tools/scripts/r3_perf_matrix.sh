#!/bin/bash
# One-command TPU perf matrix for the round-3 backward-pass attack.
# Run when the axon tunnel is up:  bash tools/scripts/r3_perf_matrix.sh [outfile]
# Appends one labeled JSON line per experiment; safe to re-run (compile cache).
set -u
OUT="${1:-/tmp/r3_perf_matrix.jsonl}"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # label, timeout_s, env pairs..., -- cmd...
  local label="$1" t="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  echo "=== $label" >&2
  local line
  line=$(env "${envs[@]}" timeout "$t" "$@" 2>/tmp/r3pm_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"label\": \"$label\", \"result\": $line}" >> "$OUT"
    echo "$line" >&2
  else
    echo "{\"label\": \"$label\", \"result\": null}" >> "$OUT"
    tail -3 /tmp/r3pm_err.log >&2
  fi
}

# step decomposition with the BN-eval probe (b64 then b128)
run stepparts_b64  2400 MGA_BENCH_BATCH=64  MGA_BENCH_PALLAS=0 -- python tools/scripts/bench_step_parts.py
run stepparts_b128 2400 MGA_BENCH_BATCH=128 MGA_BENCH_PALLAS=0 -- python tools/scripts/bench_step_parts.py

# train throughput A/B: baseline vs remat at b128; remat enables b256
# (bench_train reads MGA_BENCH_BATCHES — a comma list, not MGA_BENCH_BATCH)
run train_b128_base  2400 MGA_BENCH_BATCHES=128 -- python tools/scripts/bench_train.py
run train_b128_remat 2400 MGA_BENCH_BATCHES=128 MGA_BENCH_REMAT=1 -- python tools/scripts/bench_train.py
run train_b256_remat 2400 MGA_BENCH_BATCHES=256 MGA_BENCH_REMAT=1 -- python tools/scripts/bench_train.py

# shipped-default inference headline (outer timeout > bench.py's own
# 2700 s watchdog so the explicit JSON error can fire before SIGTERM)
run bench_default 3000 -- python bench.py

echo "results in $OUT" >&2
cat "$OUT"
