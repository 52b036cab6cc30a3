#!/bin/bash
# 10M-doc dedup/ANN rehearsal, ONE LEG PER PROCESS (r7 verdict #4).
# Local-mode shuffle files accumulate until the context ends, so the
# full suite at 10M fills the container disk; a fresh JVM per leg frees
# the spill between legs. 48g driver heap per leg (the machine has
# 125G; legs run sequentially).
set -eo pipefail
cd "$(dirname "$0")/.."
N=${1:-10000000}
export SPARK_GRAFT_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-48g}
for leg in buckets pairs families ann; do
  echo "=== leg $leg @ $N docs ==="
  # full per-leg log (failures must stay diagnosable), quiet console
  python tools/scale_rehearsal.py "$N" --leg "$leg" \
    --out "/tmp/r08_10m_$leg.json" > "/tmp/r08_10m_$leg.log" 2>&1 \
    || { echo "LEG $leg FAILED — see /tmp/r08_10m_$leg.log"; exit 1; }
  tail -1 "/tmp/r08_10m_$leg.log"
done
python tools/merge_rehearsal.py REHEARSAL_r08_10m.json \
  /tmp/r08_10m_buckets.json /tmp/r08_10m_pairs.json \
  /tmp/r08_10m_families.json /tmp/r08_10m_ann.json
echo "=== merged -> REHEARSAL_r08_10m.json ==="
