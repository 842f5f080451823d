#!/bin/bash
# Round-4 campaign, leg 6: two more probe-bracketed default runs,
# PRE-COMMITTED to be reported regardless of outcome (runs 8-9,
# giving the round a 9-run odd-count median).
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
echo "=== campaign6 start $(date) ==="
P m
echo "--- crawl default run 8 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_8.json 2>/dev/null | tail -1
P n
echo "--- crawl default run 9 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_9.json 2>/dev/null | tail -1
P o
echo "=== campaign6 end $(date) ==="
