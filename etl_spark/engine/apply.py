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
(c) lineage written per batch_id with atomic overwrite (SURVEY.md
§7.2). A replayed epoch whose ledger entry exists but whose lineage
file is missing (crash in the window between the two commits)
recomputes and rewrites the lineage — the MERGE itself stays a no-op.

Per-batch fixed-cost budget (the non-scaling `c` term that caps
scaling efficiency): exactly ONE full-pipeline Spark job (the MERGE
write) plus one small aggregation over the persisted resolved set
(lineage rollup, <= num_buckets result rows, written driver-side).
Batch stats come from parquet footers (driver-side, no job); the
lineage rollup of batch N runs in a background thread overlapped with
batch N+1's source read and parse (commit pipelining, depth 1).
"""

from __future__ import annotations

import concurrent.futures
import os
import sys
import threading
import time
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, functions as F, types as T

from etl_spark.cdc_schema import (
    BASE_VERSION,
    TRANSCRIPTS,
    SchemaOp,
    SourceSpec,
    fields_at_version,
    payload_fields,
)
from etl_spark.config import EngineConfig
from etl_spark.engine import lineage
from etl_spark.engine.normalize import normalize_text
from etl_spark.engine.resolve import resolve_max_lsn, resolve_patch_fold
from etl_spark.engine.skew import salted_repartition
from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable, spark_type

# one in-flight lineage writer per table (commit pipelining, depth 1)
_PENDING: dict[str, concurrent.futures.Future] = {}
_EXECUTOR = concurrent.futures.ThreadPoolExecutor(
    max_workers=4, thread_name_prefix="lineage"
)
_LOCK = threading.Lock()


def drain_pending(table_root: str) -> None:
    """Join the previous batch's background lineage write for this
    table; re-raises any error it hit."""
    with _LOCK:
        fut = _PENDING.pop(table_root, None)
    if fut is not None:
        fut.result()


def drain_all_pending() -> None:
    """Join every in-flight lineage write (call before reading lineage
    or shutting down)."""
    with _LOCK:
        futs = list(_PENDING.values())
        _PENDING.clear()
    for fut in futs:
        fut.result()


def parse_events(
    df: DataFrame,
    ops: list[SchemaOp],
    target_version: int,
    versions: list[int] | None = None,
    spec: SourceSpec = TRANSCRIPTS,
    with_set_flags: bool = False,
) -> DataFrame:
    """Decode the JSON payload by each event's schema_version and
    project every event onto the `target_version` schema, mapping
    payload fields to target columns by stable field ID (rename-safe)
    and casting widened types (epoch-sec long -> timestamp; ISO string
    -> timestamp). Pure JVM expressions (from_json + casts).

    `versions` prunes the union to the schema versions actually
    present in the batch (steady state = one version = one branch,
    no union, single scan).

    `with_set_flags=True` (the partial-image/patch path) additionally
    emits one boolean `_set_<col>` per target payload column: for full
    images (op I/U/D) every flag is true; for op 'P' a flag is true
    iff the payload's `_changed` mask names that column — in the
    WRITER-version field name, so a patch written before a rename
    still targets the right column (the mask is matched against the
    version's field name, the value mapped by stable field ID).
    A column that does not exist at the writer's version is unset for
    patches (a patch cannot assign a field its schema didn't have)."""
    if versions is None:
        versions = list(range(BASE_VERSION, target_version + 1))
    target = [
        f
        for f in fields_at_version(ops, target_version, spec.base_fields)
        if f.name not in spec.key
    ]
    target_by_id = {f.id: f for f in target}

    branches = []
    for v in versions:
        pf = payload_fields(ops, v, spec)
        struct_fields = [T.StructField(f.name, spark_type(f.type), True) for f in pf]
        if with_set_flags:
            # the patch mask rides inside the payload JSON (Debezium
            # envelope style): the list of writer-version field names
            # the patch assigns
            struct_fields.append(
                T.StructField("_changed", T.ArrayType(T.StringType()), True)
            )
        pstruct = T.StructType(struct_fields)
        sub = df.filter(F.col("schema_version") == v).withColumn(
            "_p", F.from_json(F.col("payload"), pstruct)
        )
        by_id = {f.id: f for f in pf}
        is_full = F.col("op") != F.lit("P")
        cols = [F.col(k) for k in spec.key] + [
            F.col("lsn"),
            F.col("op"),
            F.col("op_ts"),
        ]
        for fid, tf in target_by_id.items():
            src = by_id.get(fid)
            if src is None:
                cols.append(F.lit(None).cast(spark_type(tf.type)).alias(tf.name))
                if with_set_flags:
                    cols.append(is_full.alias(f"_set_{tf.name}"))
            else:
                c = F.col(f"_p.{src.name}")
                if tf.type == "timestamp" and src.type == "string":
                    c = F.to_timestamp(c)
                elif src.type != tf.type:
                    c = c.cast(spark_type(tf.type))
                cols.append(c.alias(tf.name))
                if with_set_flags:
                    cols.append(
                        (
                            is_full
                            | F.array_contains(
                                F.coalesce(
                                    F.col("_p._changed"),
                                    F.array().cast("array<string>"),
                                ),
                                F.lit(src.name),
                            )
                        ).alias(f"_set_{tf.name}")
                    )
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


def _batch_files_from_checkpoint(checkpoint_dir: str, batch_id: int) -> list[str]:
    """The streaming file source's offset log records exactly the
    files added in each micro-batch (`<ckpt>/sources/0/<batch_id>`,
    one JSON entry per file). Every `compactInterval`-th batch is
    written as `<batch_id>.compact` instead, containing ALL entries so
    far tagged with their batchId — filter to this batch's. Reading it
    is a driver-side O(#files) metadata lookup. Returns [] when
    unavailable (non-streaming frame or a non-file source)."""
    import json

    path = os.path.join(checkpoint_dir, "sources", "0", str(batch_id))
    compacted = False
    if not os.path.exists(path):
        path = path + ".compact"
        compacted = True
        if not os.path.exists(path):
            return []
    out = []
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{"):
                    entry = json.loads(line)
                    if "path" not in entry:
                        continue
                    if compacted and entry.get("batchId") != batch_id:
                        continue
                    out.append(entry["path"])
    except Exception:
        return []
    return out


def _stats_from_footers(batch_df: DataFrame, files: list[str] | None = None) -> dict | None:
    """Batch stats (min/max lsn, row count, schema_version range) from
    the source parquet footers — driver-side metadata reads, O(#files),
    no Spark job. A streaming file-source micro-batch is a set of whole
    files, so footer row-group statistics describe the batch exactly.
    Returns None (caller falls back to an aggregation) when the frame
    is not a pure file scan or stats are absent."""
    if files is None:
        try:
            files = batch_df.inputFiles()
        except Exception:
            return None
    if not files:
        return None
    import pyarrow.parquet as pq

    tot = 0
    mn = mx = vmn = vmx = None
    for uri in files:
        path = unquote(urlparse(uri).path) if "://" in uri or uri.startswith("file:") else uri
        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            return None
        tot += md.num_rows
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if "lsn" not in names or "schema_version" not in names:
            return None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            s_lsn = row_group.column(names["lsn"]).statistics
            s_ver = row_group.column(names["schema_version"]).statistics
            if s_lsn is None or s_ver is None or not s_lsn.has_min_max or not s_ver.has_min_max:
                return None
            mn = s_lsn.min if mn is None else min(mn, s_lsn.min)
            mx = s_lsn.max if mx is None else max(mx, s_lsn.max)
            vmn = s_ver.min if vmn is None else min(vmn, s_ver.min)
            vmx = s_ver.max if vmx is None else max(vmx, s_ver.max)
    if tot == 0:
        return {"min_lsn": 0, "max_lsn": 0, "events_in": 0, "vmin": None, "vmax": None}
    return {
        "min_lsn": int(mn),
        "max_lsn": int(mx),
        "events_in": int(tot),
        "vmin": int(vmn),
        "vmax": int(vmx),
    }


def _stats_from_agg(batch_df: DataFrame) -> dict:
    """Fallback: one slim aggregation action (min/max/count only — no
    distinct expansion, no collect_set; those moved into the resolve
    aggregation as per-key counts)."""
    row = batch_df.agg(
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
        F.count("*").alias("events_in"),
        F.min("schema_version").alias("vmin"),
        F.max("schema_version").alias("vmax"),
    ).collect()[0]
    if row["events_in"] == 0:
        return {"min_lsn": 0, "max_lsn": 0, "events_in": 0, "vmin": None, "vmax": None}
    return {
        "min_lsn": int(row["min_lsn"]),
        "max_lsn": int(row["max_lsn"]),
        "events_in": int(row["events_in"]),
        "vmin": int(row["vmin"]),
        "vmax": int(row["vmax"]),
    }


_TIMING = bool(os.environ.get("SPARK_GRAFT_TIMING"))


def _tlog(batch_id: int, phase: str, t0: float) -> float:
    t = time.time()
    if _TIMING:
        print(f"#T batch={batch_id} {phase}={t - t0:.3f}s", file=sys.stderr)
    return t


def _prior_covered_ranges(
    committed: dict[str, dict], source_id: str, batch_id: int
) -> list[tuple[int, int]]:
    """Merged [min_lsn, max_lsn] intervals covered by this source's
    batches committed BEFORE `batch_id` (streaming batch ids are
    monotone). An event seen in batch `batch_id` whose LSN falls in a
    prior interval is an at-least-once re-delivery; an LSN outside all
    of them is a new log entry even when the file source delivers
    batches out of LSN order — the basis for the exact cross-batch
    distinct count. Contiguous coverage merges to one span, so the
    list stays O(out-of-order fringes), not O(batches)."""
    prefix = f"{source_id}:"
    spans: list[tuple[int, int]] = []
    for k, st in committed.items():
        if not k.startswith(prefix) or not st:
            continue
        try:
            bid = int(k[len(prefix):])
        except ValueError:
            continue
        if bid < batch_id and "min_lsn" in st and "max_lsn" in st:
            spans.append((int(st["min_lsn"]), int(st["max_lsn"])))
    spans.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in spans:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def apply_batch(
    spark,
    cfg: EngineConfig,
    ops: list[SchemaOp],
    batch_df: DataFrame,
    batch_id: int,
    source_id: str = "cdc",
    spec: SourceSpec = TRANSCRIPTS,
    footer_stats: bool = True,
    stats_override: dict | None = None,
    input_partitioned: bool = False,
) -> None:
    t0 = time.time()
    table = LakeTable(spark, cfg.table_root, branch=cfg.branch)
    batch_key = f"{source_id}:{batch_id}"

    m0 = table.manifest()
    covered = _prior_covered_ranges(m0.committed_batches, source_id, batch_id)
    if batch_key in m0.committed_batches:
        # replayed epoch after crash. The MERGE is already committed; if
        # the crash hit the window before the lineage write, fall
        # through to recompute it (merge_into below no-ops via ledger).
        drain_pending(cfg.table_root)
        if lineage.has_batch_manifest(cfg.manifest_dir, batch_id):
            return

    # batch stats from parquet footers (no Spark job); fall back to a
    # slim aggregation for non-file frames or when the stream was
    # transformed upstream (watermark dedup drops rows the footers
    # would still count)
    t = _tlog(batch_id, "drain+ledger", t0)
    use_footers = footer_stats and not cfg.use_watermark_dedup
    stats_src = stats_override
    n_src_files = None
    if stats_src is None and use_footers:
        files = _batch_files_from_checkpoint(cfg.checkpoint_dir, batch_id)
        stats_src = _stats_from_footers(batch_df, files or None)
        if stats_src is not None and files:
            n_src_files = len(files)
    stats_src = stats_src or _stats_from_agg(batch_df)
    if stats_src["events_in"] == 0:
        return
    max_lsn = stats_src["max_lsn"]
    if cfg.patch_ops and covered and stats_src["min_lsn"] <= covered[-1][1]:
        # Full-image replay is order-insensitive (the MERGE max-LSN
        # guard rejects stale rows), but a PATCH's base full image may
        # live in a not-yet-applied earlier batch — folding it late
        # would be silently lossy. The file source delivers segments
        # in order (including after kill/resume), so this only fires
        # on a genuinely reordered source; fail loud instead.
        # (A cross-segment RE-delivery also dips below coverage and
        # would be harmless — the fold plus LSN guard reject stale
        # rows — but it is indistinguishable from a reorder at the
        # batch level. Sources that re-deliver across segments should
        # enable use_watermark_dedup, which drops re-delivered
        # (key, lsn) pairs before this check sees them.)
        raise ValueError(
            f"patch_ops requires in-LSN-order batch delivery: batch "
            f"{batch_id} spans [{stats_src['min_lsn']}, {max_lsn}] but "
            f"prior batches already covered up to {covered[-1][1]}; "
            f"for cross-segment re-delivery enable use_watermark_dedup"
        )
    t = _tlog(batch_id, "stats", t)

    # 1. schema evolution due at this LSN horizon (metadata-only commits)
    target_version = evolve_due_ops(table, ops, max_lsn)
    t = _tlog(batch_id, "evolve", t)

    # schema versions possibly present: version is monotone in LSN, so
    # the footer min/max of schema_version bounds the branch set
    vmin, vmax = stats_src["vmin"], stats_src["vmax"]

    # 1.5 dead-letter quarantine (config-gated, default off): divert
    #     malformed-payload / unknown-version events to the DLQ before
    #     they can become all-NULL upserts, and clamp the branch
    #     bounds to decodable versions BEFORE materializing the list
    #     (a poison schema_version=2^62 must not inflate the union or
    #     the driver). Idempotent on epoch replay (overwrite per
    #     batch_id) — see engine/quarantine.py.
    n_quarantined = 0
    if cfg.quarantine_dir:
        from etl_spark.engine.quarantine import max_known_version, quarantine_split

        batch_df, n_quarantined = quarantine_split(
            batch_df, cfg.quarantine_dir, ops, batch_id, spec=spec
        )
        # vmin/vmax are None when EVERY event's schema_version is NULL
        # (min/max ignore nulls) — treat as an empty decodable range;
        # the whole batch just went to the DLQ above
        vmin = BASE_VERSION if vmin is None else max(vmin, BASE_VERSION)
        vmax = (
            BASE_VERSION - 1 if vmax is None else min(vmax, max_known_version(ops))
        )
        t = _tlog(batch_id, "quarantine", t)
        if n_quarantined >= stats_src["events_in"] or vmin > vmax:
            # whole batch was poison: nothing to apply, but the batch
            # still covered an LSN span — without a ledger row the
            # invariant checker would report a phantom 'LSN gap' and
            # the quarantined count would vanish from the audit
            # accounting. Write the zero-applied manifest (driver-side
            # one-row parquet, idempotent overwrite) alongside the DLQ.
            lineage.write_poison_batch_manifest(
                cfg.manifest_dir,
                batch_id,
                {**stats_src, "events_quarantined": n_quarantined},
                table.manifest().version,
            )
            return
    elif vmin is None or vmax is None:
        raise ValueError(
            f"batch {batch_id}: every event has NULL schema_version "
            f"(poison source) and no quarantine_dir is configured — "
            f"refusing to guess; set EngineConfig.quarantine_dir to "
            f"divert such events to the dead-letter queue"
        )
    versions = list(range(vmin, vmax + 1))

    # 2. ensure the narrow parse/normalize stages have enough map-side
    #    parallelism. A micro-batch of >= `width` source files already
    #    has it (one task per file): skip the explicit repartition and
    #    let the resolve aggregation's OWN exchange distribute by key —
    #    that exchange carries parsed, typed, partial-agg-collapsed
    #    rows, strictly smaller than the raw payload rows an up-front
    #    repartition would shuffle (on a multi-executor cluster this is
    #    the difference between one cross-JVM shuffle of raw JSON and
    #    one of resolved rows). Only a batch of FEWER files than cores
    #    (unsplittable row groups) pays the up-front repartition,
    #    partitioned on the resolve key so Catalyst elides the exchange
    #    under the max-LSN aggregation — one shuffle either way. For
    #    the pathological single-(conv,turn) hot key, cfg.salt_buckets
    #    switches to the salted two-phase layout instead.
    #    Callers that already distributed the input (the routed path
    #    widens the SHARED batch once before fan-out) pass
    #    input_partitioned=True so each slice skips its own raw
    #    shuffle — N raw repartitions per batch was the routed cost.
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if cfg.salt_buckets:
        batch_df = salted_repartition(batch_df, spec.bucket_by, width, salt=8)
    elif not input_partitioned and (n_src_files is None or n_src_files < width):
        batch_df = batch_df.repartition(width, *[F.col(k) for k in spec.key])

    # 3. parse by version -> current schema (JVM from_json + casts);
    #    only the versions present in the batch are unioned (steady
    #    state: exactly one branch, one scan). patch_ops additionally
    #    decodes the per-event `_changed` mask into `_set_<col>` flags.
    parsed = parse_events(
        batch_df,
        ops,
        target_version,
        versions=versions,
        spec=spec,
        with_set_flags=cfg.patch_ops,
    )

    # 4. vectorized text normalization (Arrow pandas UDF; D rows keep null)
    if cfg.normalize_text_col and spec.normalize_field_id is not None:
        text_col = next(
            (
                f.name
                for f in fields_at_version(ops, target_version, spec.base_fields)
                if f.id == spec.normalize_field_id
            ),
            None,
        )
        if text_col is not None:
            parsed = parsed.withColumn(text_col, normalize_text(F.col(text_col)))

    # 5. max-LSN resolution per key (out-of-order within the batch).
    #    Exact-duplicate re-emits (same key AND lsn) carry identical
    #    payloads by construction, so max_by collapses them too — no
    #    separate dropDuplicates shuffle needed. with_counts piggybacks
    #    the exact raw/distinct event tallies for lineage on the same
    #    aggregation (no separate count_distinct job).
    if cfg.patch_ops:
        # partial-image fold: per key, the latest full image plus any
        # later patches' carried columns — one hash aggregation, same
        # shuffle shape and lineage counts as the full-image path
        # (engine/resolve.py resolve_patch_fold). CoW coalesces unset
        # columns from the target in the MERGE; MoR appends masked
        # patch deltas folded at read/compaction.
        resolved = resolve_patch_fold(
            parsed.drop("op_ts"),
            list(spec.key),
            salt_buckets=cfg.salt_buckets,
            with_counts=True,
            covered_lsn_ranges=covered,
        )
    else:
        resolved = resolve_max_lsn(
            parsed.drop("op_ts"),
            list(spec.key),
            salt_buckets=cfg.salt_buckets,
            with_counts=True,
            covered_lsn_ranges=covered,
        )
    # One materialization serves the merge (bucket discovery + join +
    # CoW write) and the lineage rollup; without it the whole parse/
    # normalize/shuffle pipeline re-runs per consumer.
    resolved = resolved.persist()

    stats = {
        "min_lsn": stats_src["min_lsn"],
        "max_lsn": max_lsn,
        "events_in": stats_src["events_in"],
        "events_quarantined": n_quarantined,
    }

    # 6. MERGE into the lake (bucket-pruned CoW / O(batch) MoR append;
    #    atomic ledgered commit) — the batch's one full-pipeline job
    try:
        version = merge_into(table, resolved, batch_key=batch_key, batch_stats=stats)
    except BaseException:
        resolved.unpersist()
        raise
    t = _tlog(batch_id, "merge", t)

    # join the PREVIOUS batch's background lineage write only now —
    # this batch's read/parse/resolve/merge all overlapped it. Raising
    # its error here (post-merge, pre-commit of this epoch) keeps
    # failures loud while hiding the rollup's latency entirely.
    drain_pending(cfg.table_root)
    t = _tlog(batch_id, "drain_prev", t)

    def _finish() -> None:
        tf = time.time()
        try:
            # 7. per-partition lineage manifest (idempotent per batch_id)
            try:
                lineage.write_batch_manifest(
                    spark, cfg.manifest_dir, table, resolved, batch_id, stats, version
                )
            except Exception:
                # one synchronous retry: a transient failure here would
                # otherwise leave a permanent lineage gap (this epoch
                # commits and is never replayed)
                time.sleep(1.0)
                lineage.write_batch_manifest(
                    spark, cfg.manifest_dir, table, resolved, batch_id, stats, version
                )
        finally:
            resolved.unpersist()
            _tlog(batch_id, "lineage", tf)

    # lineage is a small rollup over the persisted resolved set; run it
    # in the background so the streaming engine can commit this epoch
    # and start reading batch N+1 while it lands. Safe because lineage
    # is idempotent-overwrite, a crash in the window is healed by the
    # has_batch+has_batch_manifest recheck above plus the startup
    # reconciliation in run_replay (reconcile_lineage — covers the case
    # where the crash lands AFTER this epoch commits, so the batch is
    # never replayed), and the lineage write commits no table version
    # (driver-side parquet only), so it cannot race a manifest commit.
    if cfg.async_lineage:
        with _LOCK:
            _PENDING[cfg.table_root] = _EXECUTOR.submit(_finish)
    else:
        _finish()

    # 8. merge-on-read maintenance every K batches, in the MAIN thread:
    # compaction commits a table version, so it must serialize with the
    # merges (which it does here by construction) — but it does not
    # conflict with the in-flight lineage write above, which only
    # produces a driver-side parquet file.
    if cfg.compact_max_files_per_bucket and (
        (batch_id + 1) % max(1, cfg.compact_every_batches) == 0
    ):
        table.compact(cfg.compact_max_files_per_bucket)
        t = _tlog(batch_id, "compact", t)

    # 9. stream-maintained persisted indexes (engine/indexes.py): fold
    # this batch's change feed into each spec'd dedup/near-dup/ANN
    # index. Main thread for the same reason as compaction — index
    # refreshes commit versions (on the INDEX tables) — and safely
    # AFTER this batch's merge, so the fold window always ends at a
    # committed version. Crash composition: a crash here leaves the
    # index cursor behind and the next refresh covers both versions; a
    # replayed batch's MERGE no-ops via the ledger, so the refresh
    # sees no new version and no-ops via its cursor.
    if (cfg.index_specs or cfg.mv_specs) and (
        (batch_id + 1) % max(1, cfg.index_refresh_every_batches) == 0
    ):
        from etl_spark.engine.indexes import refresh_indexes, refresh_mvs

        if cfg.index_specs:
            refresh_indexes(spark, table, cfg.index_specs)
            t = _tlog(batch_id, "index_refresh", t)
        if cfg.mv_specs:
            refresh_mvs(table, cfg.mv_specs)
            t = _tlog(batch_id, "mv_refresh", t)


def reconcile_lineage(
    spark,
    cfg: EngineConfig,
    ops: list[SchemaOp],
    source_id: str = "cdc",
    spec: SourceSpec = TRANSCRIPTS,
) -> list[int]:
    """Startup reconciliation for the async-lineage crash window: a
    crash AFTER epoch N committed to the streaming checkpoint but
    BEFORE its background lineage write landed means batch N is never
    replayed, so the in-batch heal path never runs — without this, the
    lineage manifest for N would be permanently missing and
    check_invariants would report a phantom LSN gap.

    For every ledger-committed batch of this source whose lineage file
    is absent, the batch's exact file set is recovered from the
    checkpoint's offset log and re-pushed through apply_batch (the
    MERGE no-ops via the ledger; only the lineage rollup recomputes —
    at the CURRENT table schema, which affects the checksum column
    only, never the LSN/count invariants). Call before starting the
    stream; run_replay does. Returns the reconciled batch ids."""
    if not LakeTable.exists(cfg.table_root):
        return []
    table = LakeTable(spark, cfg.table_root, branch=cfg.branch)
    prefix = f"{source_id}:"
    healed: list[int] = []
    for k in sorted(table.manifest().committed_batches):
        if not k.startswith(prefix):
            continue
        try:
            bid = int(k[len(prefix):])
        except ValueError:
            continue
        if lineage.has_batch_manifest(cfg.manifest_dir, bid):
            continue
        files = _batch_files_from_checkpoint(cfg.checkpoint_dir, bid)
        if not files:
            raise RuntimeError(
                f"lineage lost for committed batch {bid} and its file set "
                f"is not in the checkpoint offset log ({cfg.checkpoint_dir}) "
                "— cannot reconcile; table state itself is intact"
            )
        batch_df = spark.read.schema(spec.binlog_schema()).parquet(*files)
        apply_batch(
            spark, cfg, ops, batch_df, bid, source_id=source_id, spec=spec
        )
        drain_pending(cfg.table_root)
        healed.append(bid)
    return healed
