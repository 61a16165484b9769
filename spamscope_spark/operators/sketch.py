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

    Returns (group, n_exact, kmv_estimate, rel_err). When a group has
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
            F.round(est, 4).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
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
        round(est.e, 4) AS kmv_estimate,
        round(abs(est.e - exact.n_exact) / exact.n_exact, 6) AS rel_err
    FROM est JOIN exact USING (grp)
    """
