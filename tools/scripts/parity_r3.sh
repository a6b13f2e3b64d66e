#!/bin/bash
# Round-3 mAP parity evidence chain (VERDICT r2 "Next round" #5):
# >=96-train/48-val fixture at 256 px, training seeds {0,1,2}, both stacks
# on CPU fp32 (removes the bf16 confound; reference protocol
# /root/reference/mga_yolo/engine/train.py:10). Sequential + nice'd: the
# sandbox has one CPU core and this must not starve foreground work.
# Usage: bash tools/scripts/parity_r3.sh [epochs] [imgsz] [ntrain] [nval]
set -u
EPOCHS=${1:-150}
IMGSZ=${2:-256}
NTRAIN=${3:-96}
NVAL=${4:-48}
cd /root/repo
for SEED in 0 1 2; do
  OUT=/tmp/parity_r3_s${SEED}
  echo "[parity-r3] seed ${SEED} -> ${OUT} ($(date))"
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
      -u PALLAS_AXON_TPU_GEN -u AXON_LOOPBACK_RELAY \
      PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      nice -n 19 python -m tools.scripts.map_parity \
      --epochs "${EPOCHS}" --imgsz "${IMGSZ}" --n "${NTRAIN}" --n-val "${NVAL}" \
      --seed "${SEED}" --out "${OUT}" \
      > "${OUT}.log" 2>&1
  echo "[parity-r3] seed ${SEED} done, rc=$? ($(date))"
done
echo "[parity-r3] all seeds done ($(date))"
