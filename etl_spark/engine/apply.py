"""Per-micro-batch apply: parse-by-version -> normalize -> dedup ->
max-LSN resolve -> schema-evolve -> MERGE -> lineage.

This single function replaces the reference's whole apply loop —
list bucket / registry diff / per-file SparkSession / select-alias-cast
/ append + per-row-update (/root/reference/src/pipeline/core/
client_clickhouse.py:154-206 and spark.py:28-189) — as the
foreachBatch body of one Structured Streaming query.

Exactly-once: Spark may re-run a batch_id after a crash; idempotence
comes from (a) the lake manifest's committed-batch ledger (a replayed
batch_id is a no-op commit), (b) the MERGE LSN-monotonicity guard, and
(c) lineage written per batch_id with overwrite (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from etl_spark.cdc_schema import (
    BASE_VERSION,
    KEY,
    SchemaOp,
    fields_at_version,
    payload_fields,
    version_at_lsn,
)
from etl_spark.config import EngineConfig
from etl_spark.engine import lineage
from etl_spark.engine.normalize import normalize_text
from etl_spark.engine.resolve import resolve_max_lsn
from etl_spark.engine.skew import salted_repartition
from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable, spark_type


def parse_events(
    df: DataFrame,
    ops: list[SchemaOp],
    target_version: int,
    versions: list[int] | None = None,
) -> DataFrame:
    """Decode the JSON payload by each event's schema_version and
    project every event onto the `target_version` schema, mapping
    payload fields to target columns by stable field ID (rename-safe)
    and casting widened types (epoch-sec long -> timestamp; ISO string
    -> timestamp). Pure JVM expressions (from_json + casts).

    `versions` prunes the union to the schema versions actually
    present in the batch (steady state = one version = one branch,
    no union, single scan)."""
    if versions is None:
        versions = list(range(BASE_VERSION, target_version + 1))
    target = [f for f in fields_at_version(ops, target_version) if f.name not in KEY]
    target_by_id = {f.id: f for f in target}

    branches = []
    for v in versions:
        pf = payload_fields(ops, v)
        pstruct = T.StructType(
            [T.StructField(f.name, spark_type(f.type), True) for f in pf]
        )
        sub = df.filter(F.col("schema_version") == v).withColumn(
            "_p", F.from_json(F.col("payload"), pstruct)
        )
        by_id = {f.id: f for f in pf}
        cols = [F.col(k) for k in KEY] + [
            F.col("lsn"),
            F.col("op"),
            F.col("op_ts"),
        ]
        for fid, tf in target_by_id.items():
            src = by_id.get(fid)
            if src is None:
                cols.append(F.lit(None).cast(spark_type(tf.type)).alias(tf.name))
            else:
                c = F.col(f"_p.{src.name}")
                if tf.type == "timestamp" and src.type == "string":
                    c = F.to_timestamp(c)
                elif src.type != tf.type:
                    c = c.cast(spark_type(tf.type))
                cols.append(c.alias(tf.name))
        branches.append(sub.select(*cols))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def evolve_due_ops(table: LakeTable, ops: list[SchemaOp], max_lsn: int) -> int:
    """Apply schema ops that take effect at or before `max_lsn` and are
    not yet in the table schema. Idempotent across batch replays: the
    table's schema_id tracks how many ops are applied (schema_id 0 =
    base). Returns the resulting schema version."""
    applied = table.manifest().schema.schema_id  # == number of ops applied
    due = [o for o in sorted(ops, key=lambda o: o.version) if o.lsn <= max_lsn]
    for op in due[applied:]:
        if op.kind == "add_column":
            table.add_column(op.col, op.new_type)
        elif op.kind == "rename_column":
            table.rename_column(op.col, op.new_name)
        elif op.kind == "widen_type":
            table.widen_type(op.col, op.new_type)
        else:
            raise ValueError(op.kind)
    return BASE_VERSION + max(applied, len(due))


def apply_batch(
    spark,
    cfg: EngineConfig,
    ops: list[SchemaOp],
    batch_df: DataFrame,
    batch_id: int,
    source_id: str = "cdc",
) -> None:
    table = LakeTable(spark, cfg.table_root)
    batch_key = f"{source_id}:{batch_id}"
    if table.has_batch(batch_key):
        return  # replayed epoch after crash: already fully committed

    # one small aggregate action for batch stats (counted once — the
    # reference recomputed count() per branch, spark.py:143-158)
    stats_row = batch_df.agg(
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
        F.count("*").alias("events_in"),
        F.count_distinct("lsn").alias("events_distinct"),
        F.collect_set("schema_version").alias("versions"),
    ).collect()[0]
    if stats_row["events_in"] == 0:
        return
    max_lsn = int(stats_row["max_lsn"])

    # 1. schema evolution due at this LSN horizon (metadata-only commits)
    target_version = evolve_due_ops(table, ops, max_lsn)

    # 2. spread the batch across the cluster BEFORE the narrow parse/
    #    normalize stages: a micro-batch arrives as few source files
    #    (often one row-group each, unsplittable), so without this the
    #    map side runs on #files tasks regardless of cores.
    #    Partitioned on the RESOLVE KEY (conv_id, turn_idx): Catalyst
    #    then elides the exchange under the max-LSN aggregation — one
    #    shuffle serves both stages — and a hot conversation still
    #    spreads across tasks via its turn_idx spread. For the
    #    pathological single-(conv,turn) hot key, cfg.salt_buckets
    #    switches to the salted two-phase layout instead.
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if cfg.salt_buckets:
        batch_df = salted_repartition(batch_df, "conv_id", width, salt=8)
    else:
        batch_df = batch_df.repartition(width, *[F.col(k) for k in KEY])

    # 3. parse by version -> current schema (JVM from_json + casts);
    #    only the versions present in the batch are unioned (steady
    #    state: exactly one branch, one scan)
    parsed = parse_events(
        batch_df, ops, target_version, versions=sorted(stats_row["versions"])
    )

    # 4. vectorized text normalization (Arrow pandas UDF; D rows keep null)
    if cfg.normalize_text_col:
        text_col = next(
            (f.name for f in fields_at_version(ops, target_version) if f.id == 4),
            None,
        )
        if text_col is not None:
            parsed = parsed.withColumn(text_col, normalize_text(F.col(text_col)))

    # 5. max-LSN resolution per key (out-of-order within the batch).
    #    Exact-duplicate re-emits (same key AND lsn) carry identical
    #    payloads by construction, so max_by collapses them too — no
    #    separate dropDuplicates shuffle needed.
    resolved = resolve_max_lsn(
        parsed.drop("op_ts"), KEY, salt_buckets=cfg.salt_buckets
    )
    # One materialization serves the merge (bucket discovery + join +
    # CoW write) and the lineage rollup; without it the whole parse/
    # normalize/shuffle pipeline re-runs per consumer.
    resolved = resolved.persist()

    try:
        # 6. MERGE into the lake (bucket-pruned CoW; atomic ledgered commit)
        stats = {
            "min_lsn": int(stats_row["min_lsn"]),
            "max_lsn": max_lsn,
            "events_in": int(stats_row["events_in"]),
            "events_distinct": int(stats_row["events_distinct"]),
        }
        version = merge_into(table, resolved, batch_key=batch_key, batch_stats=stats)

        # 7. per-partition lineage manifest (idempotent per batch_id)
        lineage.write_batch_manifest(
            spark, cfg.manifest_dir, table, resolved, batch_id, stats, version
        )

        # 8. merge-on-read maintenance: bound per-bucket file counts
        if cfg.compact_max_files_per_bucket:
            table.compact(cfg.compact_max_files_per_bucket)
    finally:
        resolved.unpersist()
