#!/bin/bash
# Remainder of the round-4 interleaved campaign (session died after probe b).
set -e
cd "$(dirname "$0")/.."
P () {
  python BENCH/scaling_alu.py --mode shuffle --chain 24 \
      --rows 60000000 --rounds 3 2>/dev/null | tail -1 \
      > "BENCH/probe_r4_$1.json"
}
echo "=== campaign2 start $(date) ==="
echo "--- crawl full10 run $(date) ---"
python BENCH/scaling.py --regime full10 --out scaling_result_r4_f10.json 2>/dev/null | tail -1
P c
echo "--- crawl default run 2 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_2.json 2>/dev/null | tail -1
P d
echo "=== campaign2 end $(date) ==="
