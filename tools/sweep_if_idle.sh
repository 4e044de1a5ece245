#!/bin/bash
# Probe-gated bench sweep: run the full sf0.1 sweep only when the host
# probe is at or below the threshold (default 0.80) — the r12/r13
# protocol for committing an idle-window record without wasting a
# 6-minute sweep on a loaded window. Usage: sweep_if_idle.sh [thresh]
set -u
THRESH="${1:-0.80}"
cd "$(dirname "$0")/.."
PROBE=$(python - <<'EOF' 2>/dev/null
import bench
from mpg_data_warehouse_spark.session import get_spark
print(bench.host_ref_sec(get_spark(), reps=3))
EOF
)
PROBE=$(echo "$PROBE" | tail -1)
echo "probe: $PROBE (threshold $THRESH)"
ok=$(python -c "print(1 if float('$PROBE') <= float('$THRESH') else 0)")
if [ "$ok" != "1" ]; then
  echo "SKIP: host loaded"
  exit 2
fi
python bench.py 2>/dev/null | grep '^{'
