#!/bin/bash
# Alternating A/B comparator for optimization work on a noisy host.
# Runs `bench.py --isolate <queries>` N times in each repo, alternating
# A (current tree) and B (HEAD worktree at /tmp/head_repo), and reports
# per-query minima. Usage: tools/ab_compare.sh N q131 q186 ...
N=${1:?rounds}
shift
QUERIES="$@"
OUT=/tmp/ab_$$
mkdir -p $OUT
for i in $(seq 1 $N); do
  (cd /root/repo && python bench.py --isolate $QUERIES 2>/dev/null | tail -1 > $OUT/a_$i.json)
  (cd /tmp/head_repo && python bench.py --isolate $QUERIES 2>/dev/null | tail -1 > $OUT/b_$i.json)
done
python - "$OUT" <<'EOF'
import json, sys, glob
out = sys.argv[1]
def mins(pat):
    acc = {}
    for f in glob.glob(pat):
        try:
            q = json.load(open(f))["queries"]
        except Exception:
            continue
        for k, v in q.items():
            acc[k] = min(acc.get(k, v), v)
    return acc
a, b = mins(f"{out}/a_*.json"), mins(f"{out}/b_*.json")
print(f"{'query':40s} {'NEW(A)':>8s} {'HEAD(B)':>8s} {'ratio':>6s}")
for k in sorted(set(a) | set(b)):
    ra, rb = a.get(k, float('nan')), b.get(k, float('nan'))
    print(f"{k:40s} {ra:8.3f} {rb:8.3f} {ra/rb:6.2f}")
EOF
