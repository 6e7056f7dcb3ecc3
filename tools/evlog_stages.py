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
    """Resolve a log FILE from any layout: a file, a rolling
    ``eventlog_v2_<app>/`` dir, or a parent dir holding one."""
    if os.path.isfile(path):
        return path
    cands = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith("events_") or f.startswith("local-"):
                cands.append(os.path.join(root, f))
    if not cands:
        raise SystemExit(f"no event files under {path}")
    return max(cands, key=os.path.getmtime)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    path = _events_file(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages: dict[tuple, dict] = {}
    jobs: dict[int, dict] = {}
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
                     "name": "", "wall_ms": 0, "max_task_ms": 0},
                )
                st["cpu_ns"] += m.get("Executor CPU Time", 0)
                st["run_ms"] += m.get("Executor Run Time", 0)
                st["gc_ms"] += m.get("JVM GC Time", 0)
                st["tasks"] += 1
                st["max_task_ms"] = max(
                    st["max_task_ms"], m.get("Executor Run Time", 0)
                )
            elif kind.endswith("SparkListenerJobStart"):
                jid = ev.get("Job ID")
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "start": ev.get("Submission Time", 0),
                    "wall": 0,
                    "stages": [
                        (s.get("Stage ID"), s.get("Stage Attempt ID", 0))
                        for s in ev.get("Stage Infos", [])
                    ],
                }
            elif kind.endswith("SparkListenerJobEnd"):
                jid = ev.get("Job ID")
                if jid in jobs:
                    jobs[jid]["wall"] = (
                        ev.get("Completion Time", 0) - jobs[jid]["start"]
                    )
            elif kind.endswith("SparkListenerStageCompleted"):
                info = ev.get("Stage Info", {})
                si = info.get("Stage ID"), info.get("Stage Attempt ID")
                st = stages.setdefault(
                    si,
                    {"cpu_ns": 0, "run_ms": 0, "gc_ms": 0, "tasks": 0,
                     "name": "", "wall_ms": 0, "max_task_ms": 0},
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
          f"{'maxtask_s':>9} {'gc_s':>6} {'tasks':>5}  name")
    for (sid, att), st in rows:
        print(
            f"{sid:>6}.{att} {st['wall_ms'] / 1e3:>8.2f} "
            f"{st['cpu_ns'] / 1e9:>9.2f} {st['run_ms'] / 1e3:>9.2f} "
            f"{st['max_task_ms'] / 1e3:>9.2f} "
            f"{st['gc_ms'] / 1e3:>6.2f} {st['tasks']:>5}  "
            f"{st['name'][:60]}"
        )

    # Per-JOB view: wall vs the sum of its stages' walls. A large gap
    # with modest stage CPU is DRIVER time (planning/AQE/compile) —
    # the r13 tree-blowup class; a job whose stages carry outsized CPU
    # is the executor-side interpreted-path class. Jobs are labeled
    # when the runner sets spark.job.description (bench.py does,
    # "<query>#repN").
    print(f"\n{'job':>6} {'wall_s':>8} {'stages_s':>9} {'gap_s':>7} "
          f"{'cpu_s':>9} {'maxtask_s':>9}  description")
    for jid, jb in sorted(jobs.items(), key=lambda kv: -kv[1]["wall"])[
        :top_n
    ]:
        st_wall = sum(
            stages[s]["wall_ms"] for s in jb["stages"] if s in stages
        ) / 1e3
        st_cpu = sum(
            stages[s]["cpu_ns"] for s in jb["stages"] if s in stages
        ) / 1e9
        wall = jb["wall"] / 1e3
        mx = max(
            (stages[s]["max_task_ms"] for s in jb["stages"] if s in stages),
            default=0,
        ) / 1e3
        print(
            f"{jid:>6} {wall:>8.2f} {st_wall:>9.2f} "
            f"{wall - st_wall:>7.2f} {st_cpu:>9.2f} {mx:>9.2f}  "
            f"{jb['desc'][:55]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
