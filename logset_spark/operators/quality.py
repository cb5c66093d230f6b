"""Data profiling + expectation checking over warehouse tables.

LogSet is a metadata catalog: its whole purpose is descriptive metadata
about data artifacts (temporal extent, subjects, formats — SURVEY §1.1).
At warehouse scale the descriptive layer is computed, not hand-entered:
`profile` derives per-column statistics in ONE pass, and `expectations`
turns catalog invariants (key uniqueness, referential integrity,
completeness) into counted checks — the Deequ-style quality gate a
100 TB ingest runs before publishing a partition.

Scale shape: `profile` is a single wide aggregate (every metric is an
agg expression over one scan — Catalyst partial-aggregates map-side, so
the shuffle carries one row per column-metric, not data).  Uniqueness /
integrity checks are one groupBy or one broadcast-able anti-join each,
all on key columns only (column-pruned scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metrics emitted per column; numeric-only metrics are null for strings
PROFILE_METRICS = ("count", "nulls", "distinct", "min", "max")


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profiler -> long format
    DataFrame[column, metric, value:string].

    Exact `count_distinct` (not approx) so the result is engine-
    reproducible; at true scale swap in approx_count_distinct and accept
    a rows-only check — the plan shape (single wide agg) is unchanged.
    Values are stringified with a fixed format so one schema carries
    numeric and string columns."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}\x00count"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}\x00nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}\x00distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}\x00min"),
            F.max(F.col(c)).cast("string").alias(f"{c}\x00max"),
        ]
    wide = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.lit(m).alias("metric"),
            F.col(f"`{c}\x00{m}`").cast("string").alias("value"),
        )
        for c in cols
        for m in PROFILE_METRICS
    ])
    return wide.select(F.explode(pairs).alias("p")).select(
        "p.column", "p.metric", "p.value"
    )


def expect_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """-> [check, violations, total]: rows whose key occurs more than
    once (violations counts ALL rows in duplicated groups)."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("violations"))
    )
    total = df.agg(F.count("*").alias("total"))
    return (
        dup.crossJoin(total)
        .select(
            F.lit(f"unique({','.join(keys)})").alias("check"),
            F.col("violations").cast("long").alias("violations"),
            F.col("total").cast("long").alias("total"),
        )
    )


def expect_references(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential integrity: child rows whose non-null key has no match
    in parent (one anti-join on pruned key columns; broadcast when the
    parent key set is small, shuffle otherwise — Catalyst's call)."""
    orphans = (
        child.select(F.col(child_key))
        .where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
    )
    total = child.agg(F.count("*").alias("total"))
    return orphans.crossJoin(total).select(
        F.lit(f"references({child_key}->{parent_key})").alias("check"),
        F.col("violations").cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
    )


def expect_complete(df: DataFrame, col: str) -> DataFrame:
    """Completeness: null count for a required column."""
    return df.agg(
        F.lit(f"complete({col})").alias("check"),
        F.sum(F.col(col).isNull().cast("long")).cast("long").alias("violations"),
        F.count("*").cast("long").alias("total"),
    )


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check one-row frames into the quality report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """Characteristic sets over a (subj, pred, obj) graph: group
    subjects by the SET of predicates they carry -> one row per
    distinct predicate-combination with how many subjects share it and
    how many triples they hold (Neumann & Moerkotte's statistic — the
    structure summary RDF engines estimate join cardinalities from,
    and the profile that tells a catalog operator which entity shapes
    actually occur, e.g. 'turns missing usedTool': every shape is one
    row here).

    The set is emitted as a ';'-joined SORTED string (`cs`) — a
    deterministic, engine-portable set representation.

    Plan: one groupBy(subj) building the sorted distinct-pred array +
    per-subject triple count (partial-aggregated map-side), then a
    groupBy on the set string — two exchanges total, output bounded by
    the number of DISTINCT predicate combinations (tens, even on a
    10^12-triple table with a fixed vocabulary), never by subjects."""
    per_subj = triples.groupBy("subj").agg(
        F.array_join(
            F.sort_array(F.collect_set("pred")), ";"
        ).alias("cs"),
        F.count("*").alias("n_t"),
    )
    return per_subj.groupBy("cs").agg(
        F.count("*").alias("n_subjects"),
        F.sum("n_t").alias("n_triples"),
    )


def _cm_lanes(key_col: str, width: int, depth: int):
    """(lane, bucket) struct array for a key — the ONE hashing recipe
    shared by sketch construction and estimation: the sketch is only
    valid if probes hash exactly like builds, so the invariant is
    structural, not a convention."""
    from .graph import _hash_u32

    return F.array(*[
        F.struct(
            F.lit(d).alias("lane"),
            (_hash_u32(F.concat_ws(":", F.lit(f"cm{d}"), F.col(key_col)))
             % width).cast("int").alias("bucket"),
        )
        for d in range(depth)
    ])


def count_min_sketch(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch of a key column's frequency distribution, as a
    SPARSE cell table DataFrame[lane:int, bucket:int, c:bigint] (zero
    cells omitted).  The sketch is FIXED-SIZE (<= depth*width cells)
    and MERGEABLE (cm_merge = cell-wise sum), which is its point at
    scale: per-partition/per-day sketches stored at kilobyte size
    answer "how hot is key X" across a 100 TB table without rescanning
    — the skew-diagnosis primitive behind this pipeline's salting
    decisions (hot conv_ids) with bounded state, where an exact groupBy
    per diagnosis would re-shuffle the data each time.

    Determinism: lane d's bucket is the shared md5 hash of "cm{d}:key"
    mod width (operators/graph._hash_u32), so construction replays
    verbatim in ANSI SQL (the q_count_min oracle).  Plan: explode each
    row into `depth` (lane, bucket) pairs map-side, ONE aggregation —
    partial-aggregated, so the exchange carries at most depth*width
    rows, not data."""
    return (
        df.select(F.explode(_cm_lanes(key_col, width, depth)).alias("lb"))
        .groupBy(F.col("lb.lane").alias("lane"),
                 F.col("lb.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Union count-min sketches built with the SAME width/depth:
    cell-wise sum.  Associative/commutative — sketches from different
    partitions, days, or tables combine without touching source data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("lane", "bucket").agg(F.sum("c").alias("c"))


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    width: int = 1024, depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for `keys` against a sketch built with
    the same (width, depth): est = min over lanes of the key's cell —
    the count-min guarantee (never under-estimates; over-estimates by
    collision mass ~ N/width per lane, minimized over lanes).  Keys are
    a dimension-scale probe set; the join is lane-bucket equi, the
    sketch side at most depth*width rows (broadcastable)."""
    probes = keys.select(
        key_col, F.explode(_cm_lanes(key_col, width, depth)).alias("lb")
    ).select(key_col, F.col("lb.lane").alias("lane"),
             F.col("lb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["lane", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )


def void_statistics(triples: DataFrame, exact: bool = True) -> DataFrame:
    """VoID-style property-partition statistics — the dataset
    description a published RDF dataset carries (void:propertyPartition:
    per predicate, void:triples / void:distinctSubjects /
    void:distinctObjects) and the same numbers the SPARQL compiler's
    ANALYZE path wants for join ordering.

    exact=True: one aggregation with two count-distincts (Catalyst
    lowers multi-distinct to an expand — fine per-predicate since the
    group count is vocabulary-scale).  exact=False: the 100-TB path —
    approx_count_distinct (HLL, one pass, no expand), for when the
    numbers feed ANALYZE rather than a published dataset description.
    Output: (pred, n_triples, n_subjects, n_objects)."""
    d = (F.countDistinct if exact
         else lambda c: F.approx_count_distinct(c, 0.02))
    return triples.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        d("subj").alias("n_subjects"),
        d("obj").alias("n_objects"),
    )


def drift_report(
    old_stats: DataFrame, new_stats: DataFrame, warn_ratio: float = 2.0
) -> DataFrame:
    """Per-predicate drift between two dataset versions' VoID statistics
    (void_statistics output, or any frame with (pred, n_triples)):
    appeared/vanished predicates and count swings beyond `warn_ratio` —
    the publish-gate check a daily 100-TB ingest runs against
    yesterday's stats before swapping the pointer.

    Output: (pred, n_old, n_new, status) with status in
    {'appeared', 'vanished', 'grew', 'shrank', 'stable'} — grew/shrank
    mean the count changed by more than warn_ratio x in either
    direction.  All-integer columns plus a categorical, so the report
    is hash-comparable across engines; the inputs are vocabulary-sized,
    so the join is trivially broadcast."""
    o = old_stats.select(
        "pred", F.col("n_triples").alias("n_old")
    )
    n = new_stats.select(
        "pred", F.col("n_triples").alias("n_new")
    )
    j = o.join(n, "pred", "full_outer").select(
        "pred",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    # integer comparison n_new * 1 > n_old * warn_ratio, kept exact by
    # scaling both sides by 10 (warn_ratio to one decimal place)
    r10 = int(round(warn_ratio * 10))
    return j.select(
        "pred", "n_old", "n_new",
        F.when(F.col("n_old") == 0, "appeared")
        .when(F.col("n_new") == 0, "vanished")
        .when(F.col("n_new") * 10 > F.col("n_old") * r10, "grew")
        .when(F.col("n_old") * 10 > F.col("n_new") * r10, "shrank")
        .otherwise("stable")
        .alias("status"),
    )
