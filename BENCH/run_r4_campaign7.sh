#!/bin/bash
# Round-4 campaign, leg 7: clean re-measurement of the campaign6 slots.
# Campaign6's pre-committed runs 8-9 were INVALIDATED as measurements:
# the session that launched them ran the full pytest suite and two
# long Spark test suites on the same box concurrently (runs 8-9 read
# 0.931 / 0.673 — both legs contaminated in opposite directions; see
# BENCH/BASELINE.md).  Runs 10-11 repeat the identical protocol on an
# otherwise-idle box and are PRE-COMMITTED to be reported regardless
# of outcome.
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
echo "=== campaign7 start $(date) ==="
P p
echo "--- crawl default run 10 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_10.json 2>/dev/null | tail -1
P q
echo "--- crawl default run 11 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_11.json 2>/dev/null | tail -1
P r
echo "=== campaign7 end $(date) ==="
