"""Incrementally-maintained MinHash/LSH NEAR-dup index over a
documents lake table — the near-duplicate twin of the exact index in
`lake/dedup_index.py`, and the other operation a 100 TB training
pipeline runs daily: find which documents of a NEW batch are
near-duplicates of the persisted corpus in O(batch + touched LSH
buckets) instead of re-signaturing the corpus.

The index rows are the corpus's LSH band keys — (bkey, band, doc_id)
keyed on all three and BUCKETED BY bkey — so same-band-key rows
co-locate in one bucket and a probe reads only the probed keys'
buckets/files (`read(where_in={"bkey": ...})` — bucket pruning plus
Bloom sidecars if built). Because the index is itself a lake table,
every lake capability applies for free: ledgered idempotent commits,
time travel, compaction, write-time Blooms.

Signature purity is the load-bearing design rule: a persisted
signature must be a pure per-document function of the text, or corpus
changes would silently invalidate every stored row. That is why the
index pipeline applies NO corpus-frequency shingle cap (the
`max_shingle_freq` guard in `minhash_lsh_pairs` is a function of the
whole corpus). The mega-bucket/skew guard moves where it belongs at
probe time: `max_bucket_size` skips stopword-like band buckets whose
membership exceeds the cap — bounding join fan-out by a constant per
probed key, the same guard class, applied to the materialized bucket
instead of the shingle frequency.

- `refresh_neardup_index` folds the documents table's change feed
  (lake/changes.py) into band-row MERGEs. The feed's signed algebra
  collapses per (doc_id, text): inserts/update-post-images count +1,
  deletes/update-pre-images -1; per doc at most one net-+1 text (the
  window-final text, if alive at the end) and one net--1 text (the
  window-start text, if alive at the start) survive — intermediates
  cancel. Shingling therefore touches O(changed docs), never the
  corpus. Band rows from the added and removed texts are then
  collapsed AGAIN per (bkey, band, doc_id): an update whose old and
  new text agree on some band nets 0 there and touches nothing.
- Merge LSNs are the refresh window's end version, rollbacks inside
  the window force a full resync, and the MERGE is ledgered under a
  window-derived batch_key — identical crash/rewind posture to
  `dedup_index.refresh_index` (see that module's docstring).
- `neardup_batch` is the daily probe: band-key the incoming batch,
  read ONLY the probed keys' buckets, collide, then verify by EXACT
  Jaccard — reading only the candidate corpus docs' buckets from the
  documents table (point-lookup class IO on both tables). Intra-batch
  near-dups resolve in the same pass. Driver transfer is O(batch x
  bands) keys plus O(candidates) ids — the same bounded-metadata
  class as the where_in path it feeds.
- `neardup_pairs` is the corpus-wide view (index-driven candidates,
  exact verify): the golden tests prove it equals a from-scratch
  `minhash_lsh_pairs` recompute (cap disabled) after any mix of
  inserts / fingerprint-moving updates / deletes.

The reference has nothing comparable (its sink is append-only JDBC);
this composes the repo's change feed with its MinHash-LSH operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_spark.lake.changes import read_changes, signed_deltas
from etl_spark.lake.merge import merge_into
from etl_spark.lake.table import LakeTable
from etl_spark.operators.dedup import (
    _track_persist,
    band_keys,
    minhash_signatures,
    shingles,
    verify_pairs_exact,
)
from etl_spark.util import read_cursor, write_cursor

INDEX_FIELDS = [
    ("bkey", "string"),
    ("band", "int"),
    ("doc_id", "long"),
    ("member", "boolean"),
]
INDEX_KEY = ["bkey", "band", "doc_id"]

# manifest prop stamping the signature params the stored keys were
# built with — a probe/refresh under different params would silently
# miss every near-dup (wrong hash space), so mismatches must raise
_PARAMS_PROP = "neardup_params"


def _params_guard(
    index: LakeTable, n: int, num_hashes: int, bands: int,
    stamp: bool = False,
) -> None:
    """Raise if the index was built with different (n, num_hashes,
    bands) than the caller is using. Unstamped indexes (created
    outside `create_neardup_index`) are stamped on first refresh when
    `stamp=True`, tolerated read-only otherwise."""
    want = f"{n}:{num_hashes}:{bands}"
    have = index.manifest().props.get(_PARAMS_PROP)
    if have is None:
        if stamp:
            index._set_props({_PARAMS_PROP: want})
        return
    if have != want:
        raise ValueError(
            f"near-dup index at {index.root} stores band keys built "
            f"with (n:num_hashes:bands) = {have}; called with {want} "
            "— a different hash space would silently miss every "
            "near-duplicate"
        )


def create_neardup_index(
    spark: SparkSession,
    root: str,
    num_buckets: int = 16,
    write_mode: str = "cow",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> LakeTable:
    """Create the (empty) band-key index table, bucketed by bkey, and
    stamp the signature params into its manifest props so later
    refreshes/probes under different params fail loudly."""
    table = LakeTable.create(
        spark, root, INDEX_FIELDS, INDEX_KEY, "bkey",
        num_buckets=num_buckets, write_mode=write_mode,
    )
    table._set_props({_PARAMS_PROP: f"{n}:{num_hashes}:{bands}"})
    return table


def _cursor_path(index: LakeTable) -> str:
    return os.path.join(index.root, "_neardup_cursor.json")


def _band_rows(
    d: DataFrame, n: int, num_hashes: int, bands: int
) -> DataFrame:
    """(id, text) -> (bkey, band, doc_id): the pure per-doc signature
    pipeline (shingles -> minhash -> band keys), NO corpus-frequency
    cap (see module docstring on signature purity)."""
    sh = shingles(d, "id", "text", n)
    banded = band_keys(minhash_signatures(sh, num_hashes), num_hashes, bands)
    return banded.select("bkey", "band", F.col("id").alias("doc_id"))


def refresh_neardup_index(
    docs: LakeTable,
    index: LakeTable,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> dict:
    """Bring the band-key index up to the documents table's current
    version. Returns {"from_version", "to_version", "mode"} with mode
    in noop | full | incremental (full on first refresh and after a
    rollback inside the window). The (n, num_hashes, bands) signature
    parameters must be held constant across a given index's lifetime —
    they define the stored keys (enforced via the manifest-props
    stamp: a mismatch raises)."""
    _params_guard(index, n, num_hashes, bands, stamp=True)
    cursor = _cursor_path(index)
    frm = read_cursor(cursor, "refreshed_version")
    cur = docs.current_version()
    if cur <= frm and frm != 0:
        return {"from_version": frm, "to_version": cur, "mode": "noop"}

    rolled_back = frm != 0 and any(
        docs.manifest(v).props.get("rollback_commit") == v
        for v in range(frm + 1, cur + 1)
    )
    to_release = []
    if frm == 0 or rolled_back:
        base = docs.read(version=cur).select(
            F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
        )
        # persisted: referenced by BOTH the stale anti-join and the
        # src union — unpersisted a re-signature of the whole corpus
        # would run twice per resync (the duplicated-subtree cost the
        # band_keys docstring measured at 4x+)
        fresh = _band_rows(base, n, num_hashes, bands).persist()
        to_release.append(fresh)
        stale = (
            index.read()
            .select(*INDEX_KEY)
            .join(fresh.select(*INDEX_KEY), INDEX_KEY, "left_anti")
        )
        src = fresh.withColumn("member", F.lit(True)).withColumn(
            "op", F.lit("U")
        ).unionByName(
            stale.withColumn("member", F.lit(True)).withColumn(
                "op", F.lit("D")
            )
        )
        mode = "full"
        batch_key = f"neardup-full-v{cur}"
    else:
        feed = read_changes(docs, frm, cur, include_pre_images=True)
        # signed_deltas owns the feed's +1/-1 algebra (provenance is
        # known here — the feed was just read with pre-images — so
        # skip its validation scan); persisted because the adds and
        # rems branches both consume it
        per_text = (
            signed_deltas(feed, validate=False)
            .select(
                F.col(id_col).cast("long").alias("id"),
                F.col(text_col).alias("text"),
                F.col("_sign").alias("_s"),
            )
            .groupBy("id", "text")
            .agg(F.sum("_s").alias("_net"))
            .filter(F.col("_net") != 0)
            .persist()
        )
        to_release.append(per_text)
        # per doc at most one net>0 text and one net<0 text survive
        # (module docstring), so ids are unique within each side and
        # the signature groupBy stays per-document
        adds = _band_rows(
            per_text.filter(F.col("_net") > 0).select("id", "text"),
            n, num_hashes, bands,
        ).withColumn("_s", F.lit(1))
        rems = _band_rows(
            per_text.filter(F.col("_net") < 0).select("id", "text"),
            n, num_hashes, bands,
        ).withColumn("_s", F.lit(-1))
        # collapse again per key: a band the old and new text agree on
        # nets 0 and touches nothing
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
        batch_key = f"neardup-incr-{frm}-{cur}"

    try:
        merge_into(index, src.withColumn("lsn", F.lit(cur)), batch_key=batch_key)
    finally:
        for df in to_release:  # merge_into is eager; caches are spent
            df.unpersist()
    write_cursor(cursor, "refreshed_version", cur)
    return {"from_version": frm, "to_version": cur, "mode": mode}


def neardup_batch(
    docs: LakeTable,
    index: LakeTable,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup an incoming batch against the persisted index WITHOUT
    re-signaturing the corpus: band-key the batch, read only the
    probed keys' index buckets, collide, verify candidates by exact
    Jaccard reading only those corpus docs. Returns
    (id_a, id_b, shared, n_a, n_b) — the `minhash_lsh_pairs` shape —
    covering batch-vs-corpus AND intra-batch pairs at `threshold`
    (corpus-vs-corpus pairs were emitted when those docs were batched).

    `max_bucket_size` (off by default) skips probed band buckets whose
    corpus membership exceeds the cap — the probe-time mega-bucket
    guard (module docstring); skipped buckets only prune CANDIDATES,
    verification stays exact."""
    _params_guard(index, n, num_hashes, bands)
    b = batch.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
    )
    # persisted intermediates are tracked like every dedup operator's:
    # the caller releases them via operators.dedup.release_caches()
    # after consuming the (lazy) result
    sh_b = _track_persist(shingles(b, "id", "text", n))
    banded_b = _track_persist(
        band_keys(minhash_signatures(sh_b, num_hashes), num_hashes, bands)
    )
    keys = [r[0] for r in banded_b.select("bkey").distinct().collect()]

    intra = (
        banded_b.select(F.col("id").alias("id_a"), "band", "bkey")
        .join(
            banded_b.select(F.col("id").alias("id_b"), "band", "bkey"),
            ["band", "bkey"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if keys:
        idx = index.read(where_in={"bkey": keys}).select(
            "band", "bkey", F.col("doc_id").alias("cid")
        )
        if max_bucket_size is not None:
            counts = idx.groupBy("band", "bkey").agg(F.count("*").alias("_bn"))
            idx = idx.join(
                counts.filter(F.col("_bn") <= max_bucket_size)
                .select("band", "bkey"),
                ["band", "bkey"],
                "left_semi",
            )
        cross = (
            banded_b.join(idx, ["band", "bkey"])
            .filter(F.col("cid") != F.col("id"))
            .select(
                F.least("id", "cid").alias("id_a"),
                F.greatest("id", "cid").alias("id_b"),
            )
        )
        cand = intra.unionByName(cross).distinct()
    else:
        cand = intra.distinct()
    cand = _track_persist(cand)

    batch_ids = {r[0] for r in b.select("id").distinct().collect()}
    cids = [
        r[0]
        for r in cand.select(
            F.explode(F.array("id_a", "id_b")).alias("id")
        )
        .distinct()
        .collect()
        if r[0] not in batch_ids
    ]
    if cids:
        corpus_docs = docs.read(where_in={id_col: cids}).select(
            F.col(id_col).cast("long").alias("id"),
            F.col(text_col).alias("text"),
        )
        sh_all = sh_b.unionByName(shingles(corpus_docs, "id", "text", n))
    else:
        sh_all = sh_b
    return verify_pairs_exact(sh_all, cand, threshold)


def neardup_pairs(
    docs: LakeTable,
    index: LakeTable,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Corpus-wide near-dup pairs driven by the PERSISTED index (band
    buckets come from stored rows, not a fresh signature pass), exact
    Jaccard verify. Equals a from-scratch `minhash_lsh_pairs` with the
    frequency cap disabled — the golden tests prove it across change
    windows. Shape (id_a, id_b, shared, n_a, n_b). Persisted
    intermediates (the index scan consumed by both sides of its
    self-join; the candidate set consumed twice inside the verify) are
    tracked like every dedup operator's — the caller releases them via
    operators.dedup.release_caches() after consuming the result."""
    _params_guard(index, n, num_hashes, bands)
    idx = _track_persist(
        index.read().select("band", "bkey", F.col("doc_id").alias("id"))
    )
    cand = _track_persist(
        idx.select(F.col("id").alias("id_a"), "band", "bkey")
        .join(idx.select(F.col("id").alias("id_b"), "band", "bkey"), ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    base = docs.read().select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
    )
    return verify_pairs_exact(shingles(base, "id", "text", n), cand, threshold)
