#!/bin/bash
# Round-4 campaign, leg 9 (session 2): two further default-regime
# samples on an idle box, probe-bracketed like campaigns 4-8.
# PRE-COMMITTED: runs 14-15 will be reported in BENCH/BASELINE.md and
# enter the round median regardless of outcome — the same commitment
# campaigns 5-8 carried, all honored (including the two that lowered
# the median).  Rationale unchanged: the box's multi-hour phase drift
# dominates single runs, so every clean sample tightens the round
# median's confidence, whichever direction it moves it.
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
echo "=== campaign9 start $(date) ==="
P v
echo "--- crawl default run 14 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_14.json 2>/dev/null | tail -1
P w
echo "--- crawl default run 15 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_15.json 2>/dev/null | tail -1
P x
echo "=== campaign9 end $(date) ==="
