"""KMV (k-minimum-values) distinct-count sketch — a from-scratch
mergeable cardinality sketch with a deterministic, engine-portable
estimate.

Unlike HLL (q_approx_distinct wraps Spark's built-in), KMV keeps the k
smallest normalized hash values of the distinct set; the estimator is
(k-1)/u_(k) where u_(k) is the k-th minimum as a fraction of the hash
space (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"). Because the hash is md5 (not seeded per-run), the sketch and
its estimate are bit-reproducible across engines — the DuckDB twin
computes the identical value, so the correctness gate can hash-compare
an *approximate* operator exactly.

Mergeability (the property that matters at 100 TB): bottom-k of a union
= bottom-k of the per-shard bottom-ks, so shards/epochs can keep k
values each and combine without rescanning — the same contract as a
DataSketches KMV/theta union.

Scale shape: one distinct pre-agg on (group, hash) — partial-agg
shrinks this map-side — then a per-group bottom-k window. At extreme
distinct cardinalities the window input can be pre-filtered by a hash
threshold (keep h < k * 2^48 / N_lower for any known cardinality lower
bound N_lower); uniform hashing guarantees the k minima survive. The
threshold is exposed as `prefilter_max_hash`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import exact as exact_fns

HASH_SPACE = float(1 << 48)  # md5[0:12] hex → 48-bit int


def _h48(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    prefilter_max_hash: int | None = None,
) -> DataFrame:
    """Per-group KMV distinct estimate vs the exact count.

    Returns (group, n_exact, kmv_estimate_e4, rel_err_e6). When a group has
    fewer than k distinct values the sketch IS the distinct set and the
    estimate is exact by construction."""
    h = _h48(F.col(value_col).cast("string"))
    d = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    if prefilter_max_hash is not None:
        # exact count still needs the full distinct set; the prefilter
        # only trims the bottom-k window input
        exact = d.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
        d = d.where(F.col("h") < prefilter_max_hash)
    else:
        exact = d.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.partitionBy("grp").orderBy("h")
    bottomk = (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .groupBy("grp")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_in_sketch"))
    )
    est = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk").cast("double"))
    return (
        bottomk.join(exact, on="grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            # half-up fixed-point BIGINT (functions/exact.py): the
            # estimate is exactly integer-valued in the n < k branch
            # (ON the quantization grid), where floor would flip on
            # ulp noise and round(x, 4) splits across engines
            exact_fns.half_up_units(est, 4).alias("kmv_estimate_e4"),
            exact_fns.half_up_units(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err_e6"),
        )
    )


def sql_kmv_distinct(
    table: str, group_col: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin — identical hash, bottom-k, and estimator arithmetic."""
    return f"""
    WITH d AS (
        SELECT DISTINCT {group_col} AS grp,
            CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 12)
                 AS BIGINT) AS h
        FROM {table}
    ), exact AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact FROM d GROUP BY grp
    ), ranked AS (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rnk
        FROM d
    ), bottomk AS (
        SELECT grp, MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS n_in_sketch
        FROM ranked WHERE rnk <= {k} GROUP BY grp
    ), est AS (
        SELECT grp, n_in_sketch, hk,
            CASE WHEN n_in_sketch < {k} THEN CAST(n_in_sketch AS DOUBLE)
                 ELSE CAST({float(k - 1)} AS DOUBLE) * CAST({HASH_SPACE} AS DOUBLE)
                      / CAST(hk AS DOUBLE)
            END AS e
        FROM bottomk
    )
    SELECT est.grp AS {group_col}, exact.n_exact,
        {exact_fns.sql_half_up_units("est.e", 4)} AS kmv_estimate_e4,
        {exact_fns.sql_half_up_units(
            "abs(est.e - exact.n_exact) / exact.n_exact", 6)} AS rel_err_e6
    FROM est JOIN exact USING (grp)
    """


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation (Cormode & Muthukrishnan
# 2005, "An improved data stream summary: the count-min sketch").
# ---------------------------------------------------------------------------


def cm_sketch(df: DataFrame, value_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Build a depth×width count-min sketch over a value column.

    Returns one row per non-empty cell: (row_j, cell, cnt). Cell
    addressing is md5-derived (hash of "j|value" mod width) so the
    sketch is bit-reproducible across engines and runs. The sketch is
    MERGEABLE: two sketches over disjoint shards combine by cell-wise
    sum — the contract that lets 10^5 map tasks each keep d×w longs and
    a single reduce produce the corpus sketch without reshuffling raw
    values.

    Scale shape: one groupBy on (row_j, cell) whose output cardinality
    is bounded by depth*width regardless of input size — partial
    aggregation collapses it map-side, so the exchange carries at most
    depth*width rows per task. No raw value ever shuffles."""
    v = F.col(value_col).cast("string")
    cells = F.array(
        *[(_h48(F.concat(F.lit(f"{j}|"), v)) % width).cast("int") for j in range(depth)]
    )
    return (
        df.select(F.posexplode(cells).alias("row_j", "cell"))
        .groupBy("row_j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimates(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    top_n: int = 50,
) -> DataFrame:
    """Heavy-hitter frequencies via the count-min sketch, compared
    against the exact counts: for the top_n most frequent values,
    return (value, n_exact, cm_estimate, overcount).

    The CM estimate is min over the value's depth cells — an upper
    bound on the true count (one-sided error: overcount >= 0 always,
    which the test suite asserts as an algebraic invariant). The
    sketch side is a broadcast join: depth*width rows joined to the
    candidate set, never the reverse."""
    sk = cm_sketch(df, value_col, depth, width)
    v = F.col(value_col).cast("string")
    exact = (
        df.select(v.alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("value"))
        .limit(top_n)
    )
    cells = F.array(
        *[
            (_h48(F.concat(F.lit(f"{j}|"), F.col("value"))) % width).cast("int")
            for j in range(depth)
        ]
    )
    probes = exact.select("value", "n_exact", F.posexplode(cells).alias("row_j", "cell"))
    est = (
        probes.join(F.broadcast(sk), on=["row_j", "cell"], how="left")
        .groupBy("value", "n_exact")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )
    return est.select(
        "value",
        "n_exact",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("n_exact")).alias("overcount"),
    )


def sql_cm_estimates(
    table: str, value_expr: str, depth: int = 4, width: int = 256, top_n: int = 50
) -> str:
    """DuckDB twin — identical cell addressing, counts, and min-of-rows
    estimator."""
    h = (
        "CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || v), 1, 12) AS BIGINT)"
        f" % {width}"
    )
    return f"""
    WITH vals AS (
        SELECT CAST({value_expr} AS VARCHAR) AS v FROM {table}
    ), cells AS (
        SELECT j, {h} AS cell, COUNT(*) AS cnt
        FROM vals, range({depth}) r(j) GROUP BY 1, 2
    ), exact AS (
        SELECT v AS value, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM vals GROUP BY v
        ORDER BY n_exact DESC, value ASC LIMIT {top_n}
    ), probes AS (
        SELECT e.value, e.n_exact, r.j,
            CAST('0x' || substr(md5(CAST(r.j AS VARCHAR) || '|' || e.value), 1, 12)
                 AS BIGINT) % {width} AS cell
        FROM exact e, range({depth}) r(j)
    )
    SELECT p.value, p.n_exact,
        CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate,
        CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) - p.n_exact AS overcount
    FROM probes p LEFT JOIN cells c ON p.j = c.j AND p.cell = c.cell
    GROUP BY p.value, p.n_exact
    """
