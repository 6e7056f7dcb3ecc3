"""Event-log stage forensics: the r12 stall playbook as one command.

Parses a Spark event log (written when ``SPARK_GRAFT_EVENTLOG=<dir>``
is set — session.py) and prints per-stage aggregates sorted by total
task CPU, so an intermittent stall rep can be attributed: a stage
whose task-CPU total is ~100× its wall × parallelism is the
interpreted-path class (r12: one exchange-map stage burned 500 CPU-s
across 32 tasks); a stall with LOW stage CPU but a long gap between
stages is driver-side (planning/compile — r13's AQE tree blowup).

Usage: python tools/evlog_stages.py /tmp/evlog_bench/<file> [top_n]
(Spark 4 writes rolling dirs ``eventlog_v2_<app>/``; pass the
``events_*`` file inside, or the directory — the newest events file
is picked.)
"""

from __future__ import annotations

import json
import os
import sys


def _events_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("events_") or f == os.path.basename(path)
    ]
    if not cands:  # single-file layout
        cands = [os.path.join(path, f) for f in os.listdir(path)]
    return max(cands, key=os.path.getmtime)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    path = _events_file(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages: dict[tuple, dict] = {}
    if path.endswith(".zstd"):
        # logs written before the compress=false default, or from a
        # foreign session: shell out to the zstd binary (no python
        # zstandard module in this container)
        import io
        import subprocess

        raw = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        ).stdout
        fh_ctx = io.StringIO(raw.decode())
    else:
        fh_ctx = open(path)
    with fh_ctx as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            kind = ev.get("Event", "")
            if kind.endswith("SparkListenerTaskEnd"):
                si = ev.get("Stage ID"), ev.get("Stage Attempt ID")
                m = (ev.get("Task Metrics") or {})
                st = stages.setdefault(
                    si,
                    {"cpu_ns": 0, "run_ms": 0, "gc_ms": 0, "tasks": 0,
                     "name": "", "wall_ms": 0},
                )
                st["cpu_ns"] += m.get("Executor CPU Time", 0)
                st["run_ms"] += m.get("Executor Run Time", 0)
                st["gc_ms"] += m.get("JVM GC Time", 0)
                st["tasks"] += 1
            elif kind.endswith("SparkListenerStageCompleted"):
                info = ev.get("Stage Info", {})
                si = info.get("Stage ID"), info.get("Stage Attempt ID")
                st = stages.setdefault(
                    si,
                    {"cpu_ns": 0, "run_ms": 0, "gc_ms": 0, "tasks": 0,
                     "name": "", "wall_ms": 0},
                )
                st["name"] = info.get("Stage Name", "")
                sub = info.get("Submission Time")
                comp = info.get("Completion Time")
                if sub and comp:
                    st["wall_ms"] = comp - sub
    rows = sorted(
        stages.items(), key=lambda kv: -kv[1]["cpu_ns"]
    )[:top_n]
    print(f"{'stage':>8} {'wall_s':>8} {'cpu_s':>9} {'run_s':>9} "
          f"{'gc_s':>6} {'tasks':>5}  name")
    for (sid, att), st in rows:
        print(
            f"{sid:>6}.{att} {st['wall_ms'] / 1e3:>8.2f} "
            f"{st['cpu_ns'] / 1e9:>9.2f} {st['run_ms'] / 1e3:>9.2f} "
            f"{st['gc_ms'] / 1e3:>6.2f} {st['tasks']:>5}  "
            f"{st['name'][:70]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
