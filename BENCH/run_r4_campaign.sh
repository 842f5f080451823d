#!/bin/bash
# Round-4 interleaved scaling campaign: crawl legs bracketed by
# stringless ALU probes so every crawl efficiency can be read against
# the box's SAME-PHASE achievable ceiling (the box swings +-20-38% on
# multi-hour phases; round 3 proved pinning doesn't remove it).
#   probe  = scaling_alu.py --mode shuffle --chain 24 (wide exchange,
#            8-byte rows: scales ~0.97 in a fast phase, ~0.70 slow)
#   crawl  = scaling.py (default regime, the north-rule job)
#   full10 = scaling.py --regime full10 (every 10^10-scale knob on)
set -e
cd "$(dirname "$0")/.."
P () {  # one ALU probe, tagged
  python BENCH/scaling_alu.py --mode shuffle --chain 24 \
      --rows 60000000 --rounds 3 2>/dev/null | tail -1 \
      > "BENCH/probe_r4_$1.json"
  python - "$1" <<'EOF'
import json, sys
d = json.load(open(f"BENCH/probe_r4_{sys.argv[1]}.json"))
print(f"probe {sys.argv[1]}: eff={d['scaling_efficiency']}"
      f" N={d['N']['seconds']}s 4N={d['fourN']['seconds']}s", flush=True)
EOF
}
echo "=== campaign start $(date) ==="
P a
echo "--- crawl default run 1 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_1.json 2>/dev/null | tail -1
P b
echo "--- crawl full10 run $(date) ---"
python BENCH/scaling.py --regime full10 --out scaling_result_r4_f10.json 2>/dev/null | tail -1
P c
echo "--- crawl default run 2 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_2.json 2>/dev/null | tail -1
P d
echo "=== campaign end $(date) ==="
