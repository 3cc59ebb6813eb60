"""Incrementally-maintained IVF ANN index over an embeddings lake
table — the similarity member of the persisted-index family (exact
dedup: lake/dedup_index.py; near-dup: lake/neardup_index.py): answer
"which corpus vectors are nearest to this NEW batch of query
embeddings" in O(batch + probed cells) instead of re-assigning the
corpus per search — the third operation a 100 TB training pipeline
runs daily.

The index rows are the corpus's IVF cell assignments — (cell, vec_id)
keyed on both and BUCKETED BY cell — so a cell's posting list
co-locates in one bucket and a probe reads only the probed cells'
buckets/files (`read(where_in={"cell": ...})`). Because the index is
itself a lake table, every lake capability applies for free: ledgered
idempotent commits, time travel, compaction, write-time Blooms.

The coarse centroids (trained via `operators.similarity.kmeans_train`
or caller-provided) are stamped into the index manifest props at
CREATE time — JSON round-trips Python floats via shortest repr, so
the stored values are exact. That makes the index self-describing:
refreshes and probes always score against the stored centroids, so
the mismatched-params failure class the MinHash index guards against
(`neardup_index._params_guard`) cannot arise here at all.

- `refresh_ann_index` folds the embeddings table's change feed into
  posting-list MERGEs with the same double signed collapse as the
  near-dup index: first per (vec_id, embedding) — only window-net
  added/removed vectors are ever assigned, intermediates cancel —
  then per (cell, vec_id), so an update whose old and new vector land
  in the same cell nets 0 and touches nothing. Assignment is the
  literal-centroid projection (`similarity._kmeans_assign`): zero
  join operators, scores bit-identical to `ivf_assign` and to the SQL
  oracle. Rollback-in-window forces a full resync; refresh MERGEs are
  ledgered under a window-derived batch_key — identical crash/rewind
  posture to the sibling indexes.
- `ann_batch` is the search: assign each query to its `n_probe`
  nearest cells (sort/slice of the SAME literal struct array the
  argmax assignment uses), read ONLY those cells' index buckets, then
  score candidates by exact cosine reading only the candidate corpus
  vectors (point-lookup-class IO on both tables). Driver transfer is
  O(probed cells + candidate ids) — the bounded-metadata class the
  where_in path it feeds is built on. n_probe = num centroids turns
  the probe into exact brute force (equals `cosine_topk` — property-
  tested); n_probe = 1 equals `ivf_topk` bit-for-bit (golden-tested
  across insert / cell-moving update / delete windows).

The reference has nothing comparable (its sink is append-only JDBC);
this composes the repo's change feed with its IVF operators.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_spark.lake.changes import read_changes, signed_deltas
from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable
from etl_spark.operators.common import spread
from etl_spark.operators.dedup import _track_persist
from etl_spark.operators.similarity import (
    _kmeans_assign,
    as_double,
    cell_score_structs,
    cosine,
)
from etl_spark.util import read_cursor, write_cursor

INDEX_FIELDS = [
    ("cell", "long"),
    ("vec_id", "long"),
    ("member", "boolean"),
]
INDEX_KEY = ["cell", "vec_id"]

# manifest prop holding the coarse centroids the stored cells were
# assigned against — the index is unusable without them, and scoring
# against different centroids would silently probe the wrong cells
_CENTROIDS_PROP = "ivf_centroids"

_RESULT_SCHEMA = "query_id long, neighbor_id long, rank int"


def create_ann_index(
    spark: SparkSession,
    root: str,
    centroids: list[list[float]],
    num_buckets: int = 16,
    write_mode: str = "cow",
) -> LakeTable:
    """Create the (empty) posting-list index table, bucketed by cell,
    and stamp the coarse centroids into its manifest props. Centroids
    are fixed for the index's lifetime — retraining means a new index
    (cells are meaningless across centroid sets)."""
    cents = [[float(x) for x in c] for c in centroids]
    if not cents:
        raise ValueError("need at least one centroid")
    dim = len(cents[0])
    if dim == 0 or any(len(c) != dim for c in cents):
        raise ValueError("centroids must be non-empty and equal-length")
    if any(not math.isfinite(x) for c in cents for x in c):
        raise ValueError("non-finite centroid coordinate")
    table = LakeTable.create(
        spark, root, INDEX_FIELDS, INDEX_KEY, "cell",
        num_buckets=num_buckets, write_mode=write_mode,
    )
    table._set_props({_CENTROIDS_PROP: cents})
    return table


def _centroids(index: LakeTable) -> list[list[float]]:
    cents = index.manifest().props.get(_CENTROIDS_PROP)
    if not cents:
        raise ValueError(
            f"table at {index.root} has no stored IVF centroids — "
            "create it via create_ann_index"
        )
    return cents


def _cursor_path(index: LakeTable) -> str:
    return os.path.join(index.root, "_ann_cursor.json")


def _assigned(
    d: DataFrame, cents: list[list[float]], id_col: str, vec_col: str
) -> DataFrame:
    """(id_col, vec_col) -> (cell, vec_id): nearest-centroid cell via
    the literal projection (no join operator; `spread` so a few-file
    scan doesn't serialize the k*dim scoring onto one core)."""
    v = spread(d).select(
        F.col(id_col).cast("long").alias("id"),
        as_double(F.col(vec_col)).alias("_v"),
    )
    return _kmeans_assign(v, cents, len(cents[0])).select(
        "cell", F.col("id").alias("vec_id")
    )


def refresh_ann_index(
    emb: LakeTable,
    index: LakeTable,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Bring the posting-list index up to the embeddings table's
    current version. Returns {"from_version", "to_version", "mode"}
    with mode in noop | full | incremental (full on first refresh and
    after a rollback inside the window)."""
    cents = _centroids(index)
    cursor = _cursor_path(index)
    frm = read_cursor(cursor, "refreshed_version")
    cur = emb.current_version()
    if cur <= frm and frm != 0:
        return {"from_version": frm, "to_version": cur, "mode": "noop"}

    rolled_back = frm != 0 and any(
        emb.manifest(v).props.get("rollback_commit") == v
        for v in range(frm + 1, cur + 1)
    )
    to_release = []
    if frm == 0 or rolled_back:
        # persisted: referenced by BOTH the stale anti-join and the
        # src union — unpersisted the corpus would be re-assigned
        # twice per resync
        fresh = _assigned(
            emb.read(version=cur), cents, id_col, vec_col
        ).persist()
        to_release.append(fresh)
        stale = (
            index.read()
            .select(*INDEX_KEY)
            .join(fresh, INDEX_KEY, "left_anti")
        )
        src = fresh.withColumn("member", F.lit(True)).withColumn(
            "op", F.lit("U")
        ).unionByName(
            stale.withColumn("member", F.lit(True)).withColumn(
                "op", F.lit("D")
            )
        )
        mode = "full"
        batch_key = f"ann-full-v{cur}"
    else:
        feed = read_changes(emb, frm, cur, include_pre_images=True)
        # signed_deltas owns the feed's +1/-1 algebra (provenance is
        # known — the feed was just read with pre-images — so skip its
        # validation scan); persisted because the adds and rems
        # branches both consume it
        per_vec = (
            signed_deltas(feed, validate=False)
            .select(
                F.col(id_col).cast("long").alias("id"),
                F.col(vec_col).alias("vec"),
                F.col("_sign").alias("_s"),
            )
            .groupBy("id", "vec")
            .agg(F.sum("_s").alias("_net"))
            .filter(F.col("_net") != 0)
            .persist()
        )
        to_release.append(per_vec)
        adds = _assigned(
            per_vec.filter(F.col("_net") > 0).select("id", "vec"),
            cents, "id", "vec",
        ).withColumn("_s", F.lit(1))
        rems = _assigned(
            per_vec.filter(F.col("_net") < 0).select("id", "vec"),
            cents, "id", "vec",
        ).withColumn("_s", F.lit(-1))
        # collapse again per key: an update whose old and new vector
        # land in the same cell nets 0 and touches nothing
        net = (
            adds.unionByName(rems)
            .groupBy(*INDEX_KEY)
            .agg(F.sum("_s").alias("_net"))
            .filter(F.col("_net") != 0)
        )
        src = net.select(
            *INDEX_KEY,
            F.lit(True).alias("member"),
            F.when(F.col("_net") > 0, F.lit("U")).otherwise(F.lit("D")).alias("op"),
        )
        mode = "incremental"
        batch_key = f"ann-incr-{frm}-{cur}"

    try:
        merge_into(index, src.withColumn("lsn", F.lit(cur)), batch_key=batch_key)
    finally:
        for df in to_release:  # merge_into is eager; caches are spent
            df.unpersist()
    write_cursor(cursor, "refreshed_version", cur)
    return {"from_version": frm, "to_version": cur, "mode": mode}


def ann_batch(
    emb: LakeTable,
    index: LakeTable,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 1,
) -> DataFrame:
    """ANN top-k for a batch of query vectors against the persisted
    index WITHOUT re-assigning the corpus: score each query against
    the stored centroids, take its `n_probe` best cells (sort/slice
    of the SAME literal struct array the assignment argmaxes over —
    identical scores and (s DESC, cell DESC) tie-break), read only
    those cells' index buckets, then exact-cosine the candidates
    reading only their vectors from the embeddings table. Returns
    (query_id, neighbor_id, rank) — the `ivf_topk`/`cosine_topk`
    shape. A query that is itself a corpus member never matches
    itself (same id exclusion as `ivf_topk`).

    Persisted intermediates are tracked like every dedup/similarity
    operator's — the caller releases them via
    operators.dedup.release_caches() after consuming the result."""
    cents = _centroids(index)
    dim = len(cents[0])
    if not 1 <= n_probe <= len(cents):
        raise ValueError(f"n_probe must be in [1, {len(cents)}]")
    spark = queries.sparkSession
    q = spread(queries).select(
        F.col(id_col).cast("long").alias("query_id"),
        as_double(F.col(vec_col)).alias("_qv"),
    )
    structs = cell_score_structs(cents, dim, vec="_qv")
    # natural struct order sorts (s ASC, cell ASC); reversed = the
    # argmax's (s DESC, cell DESC) — element 1 IS the assignment cell
    qc = _track_persist(
        q.withColumn(
            "_pc",
            F.expr(
                f"slice(reverse(array_sort(array({structs}))), 1, {n_probe})"
            ),
        )
        .select("query_id", "_qv", F.explode("_pc").alias("_c"))
        .select("query_id", "_qv", F.col("_c.cell").alias("cell"))
    )
    cells = [r[0] for r in qc.select("cell").distinct().collect()]
    if not cells:
        return spark.createDataFrame([], _RESULT_SCHEMA)

    idx = index.read(where_in={"cell": cells}).select(
        "cell", F.col("vec_id").alias("cand_id")
    )
    # a candidate can surface from several probed cells of one query
    # (n_probe > 1) — dedup on ids only; _qv is constant per query_id
    cand = _track_persist(
        qc.join(idx, "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "cand_id"])
        .select("query_id", "_qv", "cand_id")
    )
    cids = [r[0] for r in cand.select("cand_id").distinct().collect()]
    if not cids:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    vecs = emb.read(where_in={id_col: cids}).select(
        F.col(id_col).cast("long").alias("cand_id"),
        as_double(F.col(vec_col)).alias("_v"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        cand.join(vecs, "cand_id")
        .withColumn("score", cosine(F.col("_qv"), F.col("_v"), dim))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("neighbor_id"), "rank")
    )
