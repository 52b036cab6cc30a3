#!/bin/bash
# Memory-pressure rehearsal (r8 verdict #5): the three heaviest legs
# under deliberately small heaps, one fresh JVM per leg (local-mode
# shuffle files persist until the context ends). The floors below are
# the DOCUMENTED minimums: each leg completes by spilling, not OOMing.
set -eo pipefail
cd "$(dirname "$0")/.."
run_leg() {
  local leg=$1 mem=$2; shift 2
  echo "=== leg $leg @ heap $mem ==="
  SPARK_GRAFT_DRIVER_MEM=$mem python tools/spill_rehearsal_r09.py \
    --leg "$leg" --out "/tmp/r09_spill_$leg.json" "$@" \
    > "/tmp/r09_spill_$leg.log" 2>&1 \
    || { echo "LEG $leg FAILED — see /tmp/r09_spill_$leg.log"; exit 1; }
  tail -1 "/tmp/r09_spill_$leg.log"
}
run_leg minhash 4g --n "${1:-3000000}"
run_leg winnow 4g --n 1000000
run_leg pagerank 1g
python - <<'EOF'
import json
legs = {}
for leg in ("minhash", "winnow", "pagerank"):
    legs[leg] = json.load(open(f"/tmp/r09_spill_{leg}.json"))
json.dump({"legs": legs}, open("REHEARSAL_r09_spill.json", "w"), indent=1)
print("merged -> REHEARSAL_r09_spill.json")
EOF
