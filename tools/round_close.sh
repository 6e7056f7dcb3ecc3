#!/bin/bash
# Round-close checklist (the r10 verdict's item 3): run AFTER the
# round's FINAL code commit, so the committed evidence matches HEAD.
#
#   ROUND=11 bash tools/round_close.sh
#
# 1. full test suite (must be green)
# 2. full-surface parity vs DuckDB -> CORRECTNESS_LOCAL_r${ROUND}.json
#    (every registered query, zero reds expected)
# 3. bench at sf0.1 -> BENCH_LOCAL.json (+ sentinel sanity line)
# 4. regenerate PLANS.md
# 5. fail unless PLANS.md covers every registered query
# 6. commit the artifacts
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${ROUND:?set ROUND=<n>}"

echo "== [1+2/6] pytest (8 lanes via tools/run_tests.sh) + full-surface parity (concurrent)"
# Three runners, 8 cores each (32 available), so the walls overlap
# instead of adding. The pytest sharding lives in tools/run_tests.sh
# (the default `make test` entry since r16 — one place to tune lane
# balance); the close runs it with -x beside the parity sweep.
mkdir -p /tmp/rc_parity_tmp
pytest_log=$(mktemp)
t0=$SECONDS
PYTEST_ARGS="-x" bash tools/run_tests.sh > "$pytest_log" 2>&1 &
pytest_pid=$!
set +e
TMPDIR=/tmp/rc_parity_tmp PARITY_OUT="CORRECTNESS_LOCAL_r${ROUND}.json" \
  PYTHONPATH=. python tools/check_parity.py /root/testdata/sf0.01
parity_rc=$?
wait "$pytest_pid"; pytest_rc=$?
echo "pytest shards done at $((SECONDS - t0))s"
set -e
tail -n 44 "$pytest_log"
if [ "$pytest_rc" -ne 0 ]; then
  echo "pytest FAILED (full log: $pytest_log)"; exit 1
fi
if [ "$parity_rc" -ne 0 ]; then
  echo "parity FAILED"; exit 1
fi

echo "== [3/6] bench (sf0.1)"
python bench.py

echo "== [4/6] PLANS.md"
PYTHONPATH=. python tools/explain_plans.py > /dev/null

echo "== [5/6] PLANS.md coverage guard"
# FAIL when any registered query lacks a '## name' section (r12
# verdict item 1 — the plan document must never trail the round).
PYTHONPATH=. python - <<'EOF'
import re, sys
from pg2kafka_spark.queries import QUERIES
have = set(re.findall(r"^## (\S+)$", open("PLANS.md").read(), re.M))
missing = [n for n in QUERIES if n not in have]
if missing:
    sys.exit(f"PLANS.md missing sections for {len(missing)} queries: {missing}")
print(f"PLANS.md covers all {len(QUERIES)} registered queries")
EOF

echo "== [6/6] commit artifacts"
git add "CORRECTNESS_LOCAL_r${ROUND}.json" BENCH_LOCAL.json PLANS.md
# guard: nothing staged (re-run after a green close) must not abort
# the script under set -e
git diff --cached --quiet || \
  git commit -m "round ${ROUND}: close-out artifacts (full-surface parity, bench, plans)"
echo "round_close done"
