"""Dataset-curation operators: deterministic sampling / train-val-test
splitting and token-budget shard packing over a documents table — the
two bookend operations of a training-data pipeline (what rows go into
the run, and how the survivors are physically laid out for the
trainer).

Scale design (100 TB corpus, 10^9+ docs):
- sampling/splitting is a PURE per-row function of (seed, key): a
  32-bit md5-prefix uniform compared against integer thresholds. No
  shuffle, no state, no RNG stream — the assignment is reproducible
  from the key alone, stable under any repartitioning or re-run, and
  exactly mirrorable in SQL (the repo's established md5 cross-engine
  pattern, e.g. dedup.simhash64's md5 mode). Spark's own
  df.sample/randomSplit are seed-deterministic only per partitioning,
  which makes splits silently unstable under AQE/repartition — the
  hash split is the production-correct tool;
- shard packing needs a GLOBAL exclusive prefix sum of token counts in
  a deterministic key order. A bare `Window.orderBy(key)` with no
  partitionBy collapses the whole table into ONE task — the classic
  scale cliff — so `pack_shards` runs the textbook distributed prefix
  sum instead: key-range groups (cumsum within each group in
  parallel) + a tiny per-group totals frame (G rows) whose own prefix
  sum provides each group's offset, broadcast back. Wall-clock is one
  narrow pass + one G-row aggregate regardless of corpus size.

The reference has no curation surface (its pipeline forwards rows
as-is); these are engine extensions for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_U32 = 1 << 32


def hash_uniform(key: Column, seed: int) -> Column:
    """Deterministic uniform in [0, 2^32): the first 8 hex chars of
    md5(seed ':' key) as a long. Pure function of (seed, key) — the
    DuckDB mirror is CAST(('0x' || substr(md5(...),1,8)) AS BIGINT)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _pct_threshold(pct: int) -> int:
    # integer threshold so both engines compare exactly (no float)
    return (pct * _U32) // 100


def hash_sample(df: DataFrame, key_col: str, pct: int, seed: int) -> DataFrame:
    """Keep ~pct% of rows, chosen deterministically by key: a row is
    in or out of the sample forever, independent of partitioning,
    cluster size, or what other rows exist (unlike df.sample, whose
    draw stream depends on the physical partitioning)."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be 0..100, got {pct}")
    return df.filter(hash_uniform(F.col(key_col), seed) < _pct_threshold(pct))


def hash_split(
    df: DataFrame, key_col: str, splits, seed: int, out_col: str = "split"
) -> DataFrame:
    """Assign every row to exactly one named split by integer-percent
    weights, e.g. (("train", 80), ("val", 10), ("test", 10)).
    Deterministic per key: a document can never migrate between train
    and test across re-runs or repartitionings — the property that
    makes the split auditable (train/eval contamination is checkable
    from keys alone, see operators/dedup.contamination_overlap)."""
    total = sum(w for _, w in splits)
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    u = hash_uniform(F.col(key_col), seed)
    expr = None
    cum = 0
    for name, w in splits[:-1]:
        cum += w
        cond = u < F.lit(_pct_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def pack_shards(
    df: DataFrame,
    key_col: str,
    size_col: Column,
    shard_budget: int,
    n_groups: int | None = None,
    out_col: str = "shard_id",
) -> DataFrame:
    """Assign rows to contiguous shards of ~`shard_budget` total
    `size_col` (token counts, byte lengths), in deterministic
    ascending `key_col` order: shard_id = floor(exclusive running
    size / budget), so a row that starts before a budget boundary
    belongs to the shard it starts in (shards overshoot by at most
    one row, like real shard writers).

    Distributed prefix sum (no single-partition global window): rows
    are grouped by fixed key ranges computed from the table's key
    min/max (a 1-row aggregate — bounded driver metadata); the
    exclusive cumsum runs per-group in parallel, and each group's
    global offset comes from the G-row per-group totals frame,
    prefix-summed and broadcast back onto the rows."""
    if shard_budget <= 0:
        raise ValueError(f"shard_budget must be positive, got {shard_budget}")
    spark = df.sparkSession
    if n_groups is None:
        n_groups = int(spark.conf.get("spark.sql.shuffle.partitions"))
    k = F.col(key_col)
    lo, hi = df.agg(F.min(k), F.max(k)).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    span = int(hi) - int(lo) + 1
    gsize = max(1, -(-span // n_groups))  # ceil
    rows = df.withColumn("_sz", size_col.cast("long")).withColumn(
        "_grp", ((k - F.lit(int(lo))) / F.lit(gsize)).cast("long")
    )
    w_in = (
        Window.partitionBy("_grp")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # G-row totals; its own exclusive prefix sum is a single-partition
    # window over G rows — bounded metadata, not data
    w_g = Window.orderBy("_grp").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        rows.groupBy("_grp")
        .agg(F.sum("_sz").alias("_gt"))
        .withColumn("_goff", F.coalesce(F.sum("_gt").over(w_g), F.lit(0)))
        .drop("_gt")
    )
    excl = F.coalesce(F.sum("_sz").over(w_in), F.lit(0)) + F.col("_goff")
    # integer DIV, not floor(double /): a double mantissa loses
    # exactness past 2^53, i.e. at petascale token totals — exactly
    # where this operator is supposed to still be correct
    return (
        rows.join(F.broadcast(offsets), "_grp")
        .withColumn("_excl", excl)
        .withColumn(out_col, F.expr(f"_excl DIV {int(shard_budget)}"))
        .drop("_sz", "_grp", "_goff", "_excl")
    )
