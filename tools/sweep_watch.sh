#!/bin/bash
# Poll the host probe and fire ONE full bench sweep the moment it dips
# to/below the threshold; exit after the sweep (or after max attempts).
# Usage: sweep_watch.sh [thresh] [max_attempts] [sf_dir]
set -u
THRESH="${1:-0.80}"
MAX="${2:-40}"
SF_DIR="${3:-}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$MAX"); do
  PROBE=$(python - <<'EOF' 2>/dev/null | tail -1
import bench
from mpg_data_warehouse_spark.session import get_spark
print(bench.host_ref_sec(get_spark(), reps=3))
EOF
)
  echo "[$(date +%H:%M:%S)] attempt $i probe=$PROBE"
  ok=$(python -c "print(1 if float('$PROBE') <= float('$THRESH') else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then
    echo "window open — sweeping"
    if [ -n "$SF_DIR" ]; then
      SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | grep '^{'
    else
      python bench.py 2>/dev/null | grep '^{'
    fi
    exit 0
  fi
  sleep 150
done
echo "no window found in $MAX attempts"
exit 2
