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

echo "== [1+2/6] pytest (2 shards) + full-surface parity (concurrent)"
# Three runners, 8 cores each (32 available), so the walls overlap
# instead of adding. The pytest suite is SHARDED (r14 verdict 7c —
# 966 s single-process and growing): the streaming/stateful files
# (foreachBatch e2e, availableNow drains — wall-bound on trigger
# latency, not CPU) run in their own process beside the rest. Each
# runner gets its OWN TMPDIR: the at-rest stores
# (_ensure_bucketed_tables, _ensure_retention_store,
# _ensure_ann_index) key their paths off tempfile.gettempdir(), and
# two processes building the same store path concurrently would race
# the exists-check/overwrite window.
# Shard balance from the r15 close durations: rest 25:16 vs stream
# 14:06 — graph (fixpoint loops) and bpe (fold-equivalence corpus)
# move over to even the walls.
STREAM_SHARD="tests/test_streaming.py tests/test_retention.py \
tests/test_annindex.py tests/test_multimodal_real.py \
tests/test_graph.py tests/test_bpe_production.py"
mkdir -p /tmp/rc_pytest_tmp /tmp/rc_pytest_stream_tmp /tmp/rc_parity_tmp
pytest_log=$(mktemp)
stream_log=$(mktemp)
t0=$SECONDS
# shellcheck disable=SC2086  # STREAM_SHARD is a word list
TMPDIR=/tmp/rc_pytest_stream_tmp python -m pytest $STREAM_SHARD -x -q --durations=15 \
  > "$stream_log" 2>&1 &
stream_pid=$!
# shellcheck disable=SC2086
TMPDIR=/tmp/rc_pytest_tmp python -m pytest tests/ -x -q --durations=15 \
  $(for f in $STREAM_SHARD; do printf -- "--ignore=%s " "$f"; done) \
  > "$pytest_log" 2>&1 &
pytest_pid=$!
set +e
TMPDIR=/tmp/rc_parity_tmp PARITY_OUT="CORRECTNESS_LOCAL_r${ROUND}.json" \
  PYTHONPATH=. python tools/check_parity.py /root/testdata/sf0.01
parity_rc=$?
wait "$pytest_pid"; pytest_rc=$?
echo "rest-shard done at ${t1:=$((SECONDS - t0))}s"
wait "$stream_pid"; stream_rc=$?
echo "stream-shard done at $((SECONDS - t0))s"
set -e
tail -n 22 "$pytest_log"
tail -n 22 "$stream_log"
if [ "$pytest_rc" -ne 0 ]; then
  echo "pytest (rest shard) FAILED (full log: $pytest_log)"; exit 1
fi
if [ "$stream_rc" -ne 0 ]; then
  echo "pytest (stream shard) FAILED (full log: $stream_log)"; exit 1
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
