"""Z-order (Morton-curve) clustering for multi-dimensional zone-map
pruning — the Delta OPTIMIZE ZORDER BY / Iceberg z-order rewrite
analog, built from plain Spark expressions.

Single-column sorted compaction (`compact(sort_by=...)`) gives every
file a narrow footer range on ONE column; a range predicate on any
other column still reads the whole bucket. Interleaving the bits of
k column ranks into one Morton key and laying files out as runs of
that key makes every file a small axis-aligned box in k-space: each
file's footer [min,max] is narrow on EVERY interleaved column at
once, so `read(where_ranges=...)` skips files for predicates on any
of them (~N^(1-1/k) of N files survive a 1-D slice, vs N for a
column that isn't the lexicographic prefix).

The reference has no clustering or file statistics of any kind (full
scan per query: /root/reference/src/pipeline/core/spark.py:87); this
is new-engine surface for the 10^10-row multi-predicate scan path.

Mechanics — everything JVM-side, nothing per-row in Python:
  1. One small agg job computes each column's [min, max] over the
     rewrite input (min-max ranking, Delta's 'minmax' z-order
     strategy: cheapest and deterministic; heavy skew only widens
     file boxes — task balance is unaffected because the layout
     shuffle is `repartitionByRange`, whose sampled boundaries adapt
     to the actual key distribution).
  2. Each column becomes a BITS-bit fixed-point rank
     (v - min) * (2^BITS - 1) / (max - min), nulls ranked 0 (null
     rows are invisible to range predicates anyway — footer stats
     ignore nulls and the read's residual filter drops them).
  3. Ranks interleave bit-by-bit into one long: output bit j*k + i
     takes bit j of rank_i — a fold of shiftleft/bitwise-OR
     expressions, whole-stage-codegen friendly. k*BITS must stay
     under 63 (signed long): 16 bits x up to 3 columns.

Pruning soundness is untouched: z-order only changes WHERE rows land
(`_stage_dataframe` range-partitions on the Morton key instead of
the raw column); the zone maps themselves still come from each
written file's own parquet footer, and `_prune_files` never drops a
file whose stored range overlaps the query.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BITS = 16
MAX_COLS = 3

# Column types a z-rank can be computed for: totally ordered, numeric
# after a cast. Strings would need sampled range boundaries (an
# order-preserving rank has no closed form); they stay sort_by-only.
ZORDER_TYPES = {"int", "long", "short", "byte", "float", "double",
                "timestamp", "date"}


def _as_double(col: Column, type_name: str) -> Column:
    """Order-preserving numeric view of a z-order column."""
    if type_name == "timestamp":
        return F.unix_micros(col).cast("double")
    if type_name == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    return col.cast("double")


def column_bounds(
    df: DataFrame, cols: list[tuple[str, str]]
) -> dict[str, tuple[float, float]]:
    """One agg job: {col: (min, max)} as doubles for every z-order
    column, in the numeric domain `_as_double` ranks in."""
    aggs = []
    for name, type_name in cols:
        v = _as_double(F.col(name), type_name)
        aggs.append(F.min(v).alias(f"_mn_{name}"))
        aggs.append(F.max(v).alias(f"_mx_{name}"))
    row = df.agg(*aggs).first()
    return {
        name: (row[f"_mn_{name}"], row[f"_mx_{name}"])
        for name, _ in cols
    }


def zvalue_column(
    cols: list[tuple[str, str]],
    bounds: dict[str, tuple[float, float]],
    bits: int = BITS,
) -> Column:
    """Morton key expression over `cols` ([(name, type)], already
    validated against ZORDER_TYPES, 1..MAX_COLS entries). A column
    with no spread (min == max, or an all-null rewrite input) ranks
    as constant 0 and simply contributes nothing to the ordering."""
    k = len(cols)
    if not 1 <= k <= MAX_COLS:
        raise ValueError(f"z-order supports 1..{MAX_COLS} columns, got {k}")
    top = (1 << bits) - 1
    ranks: list[Column] = []
    for name, type_name in cols:
        mn, mx = bounds[name]
        if mn is None or mx is None or mx <= mn:
            ranks.append(F.lit(0).cast("long"))
            continue
        v = _as_double(F.col(name), type_name)
        scaled = F.floor((v - F.lit(float(mn)))
                         * F.lit(top / (mx - mn))).cast("long")
        # clamp (float rounding at the max edge) and rank nulls first
        ranks.append(
            F.coalesce(
                F.least(F.greatest(scaled, F.lit(0)), F.lit(top)),
                F.lit(0),
            )
        )
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z
