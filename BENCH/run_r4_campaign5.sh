#!/bin/bash
# Round-4 campaign, leg 5: two final probe-bracketed default runs,
# PRE-COMMITTED to be reported regardless of outcome, giving the
# round a 7-run odd-count median.
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
echo "=== campaign5 start $(date) ==="
P j
echo "--- crawl default run 6 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_6.json 2>/dev/null | tail -1
P k
echo "--- crawl default run 7 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_7.json 2>/dev/null | tail -1
P l
echo "=== campaign5 end $(date) ==="
