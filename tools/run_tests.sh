#!/bin/bash
# Default developer test entry (r15 verdict item 4): the full suite in
# TWO concurrent pytest lanes — the same sharding round_close.sh runs,
# promoted out of the round-close path so the everyday `make test`
# pays the overlapped wall (~8-12 min) instead of the 20+ min
# single-process run.
#
#   make test            # or: bash tools/run_tests.sh
#   PYTEST_ARGS="-k wire" bash tools/run_tests.sh   # forwarded to BOTH lanes
#
# Lane split: the streaming/stateful files (foreachBatch e2e,
# availableNow drains — wall-bound on trigger latency, not CPU) run in
# their own process beside the rest; graph (fixpoint loops) and bpe
# (fold-equivalence corpus) ride with them to even the walls.
# Measured r16: rest 12:58, stream 8:49 → 13:00 overlapped wall (vs
# ~22 min serial). Rebalance by moving a ~2 min file over when the
# rest lane's --durations tail grows. Each lane gets its OWN TMPDIR: the at-rest
# session stores (_ensure_bucketed_tables, _ensure_retention_store,
# _ensure_ann_index) key their paths off tempfile.gettempdir(), and
# two processes building the same store path concurrently would race
# the exists-check/overwrite window (the in-process build lock cannot
# reach across processes).
set -uo pipefail
cd "$(dirname "$0")/.."

STREAM_SHARD="tests/test_streaming.py tests/test_retention.py \
tests/test_annindex.py tests/test_multimodal_real.py \
tests/test_graph.py tests/test_bpe_production.py"
PYTEST_ARGS="${PYTEST_ARGS:-}"

mkdir -p /tmp/rt_pytest_tmp /tmp/rt_pytest_stream_tmp
rest_log=$(mktemp)
stream_log=$(mktemp)
t0=$SECONDS

# shellcheck disable=SC2086  # STREAM_SHARD/PYTEST_ARGS are word lists
TMPDIR=/tmp/rt_pytest_stream_tmp python -m pytest $STREAM_SHARD -q \
  --durations=10 $PYTEST_ARGS > "$stream_log" 2>&1 &
stream_pid=$!
# shellcheck disable=SC2086
TMPDIR=/tmp/rt_pytest_tmp python -m pytest tests/ -q --durations=10 \
  $(for f in $STREAM_SHARD; do printf -- "--ignore=%s " "$f"; done) \
  $PYTEST_ARGS > "$rest_log" 2>&1 &
rest_pid=$!

wait "$rest_pid"; rest_rc=$?
echo "rest shard done at $((SECONDS - t0))s (rc=$rest_rc)"
wait "$stream_pid"; stream_rc=$?
echo "stream shard done at $((SECONDS - t0))s (rc=$stream_rc)"

tail -n 18 "$rest_log"
tail -n 18 "$stream_log"
if [ "$rest_rc" -ne 0 ]; then
  echo "FAILED: rest shard (full log: $rest_log)"; exit 1
fi
if [ "$stream_rc" -ne 0 ]; then
  echo "FAILED: stream shard (full log: $stream_log)"; exit 1
fi
echo "OK: both shards green in $((SECONDS - t0))s"
