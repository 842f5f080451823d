#!/bin/bash
# Round-4 campaign, leg 4: two more probe-bracketed default crawl runs
# so the round-4 default-regime median rests on 5 runs.
set -e
cd "$(dirname "$0")/.."
P () {
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
echo "=== campaign4 start $(date) ==="
P g
echo "--- crawl default run 4 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_4.json 2>/dev/null | tail -1
P h
echo "--- crawl default run 5 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_5.json 2>/dev/null | tail -1
P i
echo "=== campaign4 end $(date) ==="
