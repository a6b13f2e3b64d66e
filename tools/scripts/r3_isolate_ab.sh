#!/bin/bash
# Isolate the train-step cost of pallas attention / lane packing / remat at
# b128 @640 with the bench_train harness (apples-to-apples vs the matrix):
# the step-parts full step measured 49 ms with pallas=0 lanepack=0 while the
# default config measured 158 ms — this grid names the factor.
set -u
OUT="${1:-/tmp/r3_isolate_ab.jsonl}"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MGA_BENCH_BATCHES=128

run() { # label, env pairs..., -- cmd...
  local label="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  echo "=== $label" >&2
  local line
  line=$(env "${envs[@]}" timeout 2400 "$@" 2>/tmp/r3ab_err.log | tail -1)
  if [ -n "$line" ]; then
    echo "{\"label\": \"$label\", \"result\": $line}" >> "$OUT"
    echo "$line" >&2
  else
    echo "{\"label\": \"$label\", \"result\": null}" >> "$OUT"
    tail -3 /tmp/r3ab_err.log >&2
  fi
}

B=tools/scripts/bench_train.py
run xla_plain      MGA_BENCH_PALLAS=0 MGA_BENCH_LANEPACK=0    MGA_BENCH_REMAT=0 -- python $B
run xla_remat      MGA_BENCH_PALLAS=0 MGA_BENCH_LANEPACK=0    MGA_BENCH_REMAT=1 -- python $B
run lanepack_only  MGA_BENCH_PALLAS=0 MGA_BENCH_LANEPACK=auto MGA_BENCH_REMAT=0 -- python $B
run pallas_only    MGA_BENCH_PALLAS=1 MGA_BENCH_LANEPACK=0    MGA_BENCH_REMAT=0 -- python $B
# the b256 row the matrix missed (env-name bug): remat-enabled big batch
run xla_b256_remat MGA_BENCH_BATCHES=256 MGA_BENCH_PALLAS=0 MGA_BENCH_LANEPACK=0 MGA_BENCH_REMAT=1 -- python $B
cat "$OUT"
