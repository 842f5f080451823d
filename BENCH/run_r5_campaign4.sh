#!/bin/bash
# Round-5 campaign, leg 4: two default-regime samples on an idle box,
# probe-bracketed like every round-4/5 campaign.
# PRE-COMMITTED: runs r5-7 and r5-8 will be reported in
# BENCH/BASELINE.md and enter the round median regardless of outcome.
# This campaign and campaign5 were PRE-REGISTERED in BASELINE.md's
# campaign3 record, BEFORE any campaign4 run, as the round's final
# four samples — fixed in advance precisely because the 6-run
# normalized median had just crossed 0.8 and stopping there would
# have been optional-stopping bias.
set -e
cd "$(dirname "$0")/.."
P () {
  python BENCH/scaling_alu.py --mode shuffle --chain 24 \
      --rows 60000000 --rounds 3 2>/dev/null | tail -1 \
      > "BENCH/probe_r5_4$1.json"
  python - "$1" <<'EOG'
import json, sys
d = json.load(open(f"BENCH/probe_r5_4{sys.argv[1]}.json"))
print(f"probe {sys.argv[1]}: eff={d['scaling_efficiency']}"
      f" N={d['N']['seconds']}s 4N={d['fourN']['seconds']}s", flush=True)
EOG
}
echo "=== r5 campaign4 start $(date) ==="
P a
echo "--- crawl default run r5-7 $(date) ---"
python BENCH/scaling.py --out scaling_result_r5_7.json 2>/dev/null | tail -1
P b
echo "--- crawl default run r5-8 $(date) ---"
python BENCH/scaling.py --out scaling_result_r5_8.json 2>/dev/null | tail -1
P c
echo "=== r5 campaign4 end $(date) ==="
