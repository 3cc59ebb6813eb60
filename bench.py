"""Benchmark harness (driver contract): runs the headline CDC replay
plus representative operator queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The CDC replay is the BASELINE.json metric: a deterministic seeded
binlog sized to the scale factor (2M events/sf-unit -> 200k at sf0.1)
replayed through the streaming foreachBatch MERGE path; events/sec and
wall time reported. Operator queries run over the driver's parquet
tables and are forced with a noop sink (full computation, no collect).

Scaling evidence (N vs 4N) is produced by scripts/bench_scaling.py,
which runs etl_spark.jobs.replay at 1 and 4 taskset-pinned cores on
the identical corpus (median pair of 3) and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "cdc_latest_per_key",
    "cdc_patch_fold",
    "cdc_merge_upsert",
    "agg_groupby_stats",
    "window_lag_gap",
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "sessionize_events",
    "text_token_stats",
    "text_quality",
    "text_fingerprint",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_components",
    "contamination_overlap",
    "dedup_index_incremental",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_lsh_ann_topk",
    "sim_ivf_topk",
    "sim_ivf_trained",
    "embedding_neardup",
    "mm_decode_features",
    "mm_decode_real",
    "mm_decode_audio",
    "asof_click_error",
    "cdc_changes_feed",
    "lake_pruned_scan",
    "lake_point_lookup",
    "lake_zorder_scan",
    "lake_where_in_scan",
    "cdc_default_backfill",
    "curation_split",
    "curation_shard_pack",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from etl_spark.contract import QUERIES
    from etl_spark.jobs import replay as replay_job

    # ---- headline: CDC replay throughput at this parallelism
    class Args:
        work_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/etl_spark_bench")
        n_events = max(2000, int(2_000_000 * sf))
        segment_size = 25_000
        parallelism = cpus
        num_buckets = 32
        max_files_per_trigger = 8
        seed = 42
        stop_session = False

    replay_stats = replay_job.run(Args)

    # session already built by the replay run at the right parallelism
    from etl_spark.session import get_spark

    spark = get_spark("bench", parallelism=cpus, shuffle_partitions=cpus)

    from etl_spark.operators import dedup as _dedup

    queries: dict[str, float] = {"cdc_replay": replay_stats["replay_s"]}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)
        # release operator-persisted intermediates (shingle/candidate
        # tables) so caches never accumulate across the sweep
        _dedup.release_caches()

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_replay+operator_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "parallelism": cpus,
                "cdc": {
                    "events_distinct": replay_stats["events_distinct"],
                    "events_per_sec": replay_stats["events_per_sec"],
                    "replay_s": replay_stats["replay_s"],
                    "final_rows": replay_stats["final_rows"],
                    "state_checksum": replay_stats["state_checksum"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
