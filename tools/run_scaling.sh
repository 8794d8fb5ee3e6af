#!/bin/bash
# Interleaved scaling evidence run (see tools/scaling_probe.py).
# Levels interleaved across rounds so one degraded-host window cannot
# own a level; min over all iterations = capability estimate.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/scaling_r5_raw.jsonl}
: > "$OUT"
for round in 0 1; do
  for c in 4 16 32; do
    echo "[scaling] round $round c$c" >&2
    python -u tools/scaling_probe.py "$c" >> "$OUT" 2>/dev/null
  done
done
# one extra c32/c16 pair (the knee is the contested number)
python -u tools/scaling_probe.py 32 >> "$OUT" 2>/dev/null
python -u tools/scaling_probe.py 16 >> "$OUT" 2>/dev/null
echo "[scaling] done -> $OUT" >&2
cat "$OUT"
