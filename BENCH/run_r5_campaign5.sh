#!/bin/bash
# Round-5 campaign, leg 5 (FINAL): the last two of the ten
# pre-registered round-5 samples (see the campaign3 record in
# BENCH/BASELINE.md).  PRE-COMMITTED: runs r5-9 and r5-10 will be
# reported and enter the round median regardless of outcome.
set -e
cd "$(dirname "$0")/.."
P () {
  python BENCH/scaling_alu.py --mode shuffle --chain 24 \
      --rows 60000000 --rounds 3 2>/dev/null | tail -1 \
      > "BENCH/probe_r5_5$1.json"
  python - "$1" <<'EOG'
import json, sys
d = json.load(open(f"BENCH/probe_r5_5{sys.argv[1]}.json"))
print(f"probe {sys.argv[1]}: eff={d['scaling_efficiency']}"
      f" N={d['N']['seconds']}s 4N={d['fourN']['seconds']}s", flush=True)
EOG
}
echo "=== r5 campaign5 start $(date) ==="
P a
echo "--- crawl default run r5-9 $(date) ---"
python BENCH/scaling.py --out scaling_result_r5_9.json 2>/dev/null | tail -1
P b
echo "--- crawl default run r5-10 $(date) ---"
python BENCH/scaling.py --out scaling_result_r5_10.json 2>/dev/null | tail -1
P c
echo "=== r5 campaign5 end $(date) ==="
