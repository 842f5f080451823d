#!/bin/bash
# Round-4 campaign, leg 10 (session 3): two further default-regime
# samples, probe-bracketed like campaigns 4-9.
# PRE-COMMITTED: runs 16-17 will be reported in BENCH/BASELINE.md and
# enter the round median regardless of outcome — the same commitment
# campaigns 5-9 carried, all honored (including the two that lowered
# the median).  Campaign9 showed the box in its quietest, fastest
# phase of the round (probes 0.886-0.922, crawl 0.768/0.800 with the
# fastest absolute legs ever); these two samples test whether that
# phase persists.  Launched only after the full pytest suite finished
# (campaign6's contamination lesson).
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
echo "=== campaign10 start $(date) ==="
P y
echo "--- crawl default run 16 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_16.json 2>/dev/null | tail -1
P z
echo "--- crawl default run 17 $(date) ---"
python BENCH/scaling.py --out scaling_result_r4_17.json 2>/dev/null | tail -1
P z2
echo "=== campaign10 end $(date) ==="
