#!/bin/bash
# Round-5 campaign, leg 3: two default-regime samples on an idle box,
# probe-bracketed like round-4 campaigns 4-10.
# PRE-COMMITTED: runs r5-5 and r5-6 will be reported in
# BENCH/BASELINE.md and enter the round median regardless of outcome —
# the same commitment every round-4 campaign carried, all honored
# (including the ones that lowered the median).  Rationale unchanged:
# the box's multi-hour phase drift dominates single runs, so every
# clean sample tightens the round median's confidence, whichever
# direction it moves it.
set -e
cd "$(dirname "$0")/.."
P () {
  python BENCH/scaling_alu.py --mode shuffle --chain 24 \
      --rows 60000000 --rounds 3 2>/dev/null | tail -1 \
      > "BENCH/probe_r5_3$1.json"
  python - "$1" <<'EOG'
import json, sys
d = json.load(open(f"BENCH/probe_r5_3{sys.argv[1]}.json"))
print(f"probe {sys.argv[1]}: eff={d['scaling_efficiency']}"
      f" N={d['N']['seconds']}s 4N={d['fourN']['seconds']}s", flush=True)
EOG
}
echo "=== r5 campaign3 start $(date) ==="
P a
echo "--- crawl default run r5-5 $(date) ---"
python BENCH/scaling.py --out scaling_result_r5_5.json 2>/dev/null | tail -1
P b
echo "--- crawl default run r5-6 $(date) ---"
python BENCH/scaling.py --out scaling_result_r5_6.json 2>/dev/null | tail -1
P c
echo "=== r5 campaign3 end $(date) ==="
