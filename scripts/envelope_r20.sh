#!/bin/bash
# Same-code envelope runs for the r20 close-out: N cold bench.py
# processes on an idle machine; totals feed BENCH_ENVELOPE.json
# (assembled by the close-out session, see BENCH_NOTES.md).
set -u
N=${1:-6}
OUT=${2:-/tmp/envelope_r20}
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python3 bench.py > "$OUT/run$i.out" 2> "$OUT/run$i.err"
  tail -1 "$OUT/run$i.out" | python3 -c "
import json,sys
d=json.loads(sys.stdin.readline())
print('run$i total', d['value'], 'calib', d['context']['calib_spin_ms'])
"
done
