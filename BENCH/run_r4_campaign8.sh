#!/bin/bash
# Round-4 campaign, leg 8: two further default-regime samples on an
# idle box, probe-bracketed like campaigns 4-7.  PRE-COMMITTED: runs
# 12-13 will be reported in BENCH/BASELINE.md and enter the round
# median regardless of outcome (the same commitment campaigns 5-7
# carried, all honored).  Rationale: the box's multi-hour phase drift
# dominates single runs (ALU ceiling spanned 0.81-0.97 within
# campaign7 alone), so every additional clean sample tightens the
# round median's confidence, whichever direction it moves it.
set -e
cd "$(dirname "$0")/.."
P () {
  python BENCH/scaling_alu.py --mode shuffle --chain 24 \
      --rows 60000000 --rounds 3 2>/dev/null | tail -1 \
      > "BENCH/probe_r4_$1.json"
  python - "$1" <<'EOG'
import json, sys
d = json.load(open(f"BENCH/probe_r4_{sys.argv[1]}.json"))
print(f"probe {sys.argv[1]}: eff={d['scaling_efficiency']}"
      f" N={d['N']['seconds']}s 4N={d['fourN']['seconds']}s", flush=True)
EOG
}
echo "=== campaign8 start $(date) ==="
P s
echo "--- crawl default run 12 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_12.json 2>/dev/null | tail -1
P t
echo "--- crawl default run 13 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_13.json 2>/dev/null | tail -1
P u
echo "=== campaign8 end $(date) ==="
