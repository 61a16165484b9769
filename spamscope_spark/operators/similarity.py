"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: broadcast the (small) query set, compute
  dot products with JVM higher-order functions (zip_with/aggregate) —
  no Python, no shuffle beyond the final per-query top-k.
- LSH-bucketed ANN (random hyperplanes): deterministic seeded
  projections; candidate set = probe buckets only — the scale path
  when the query set is large. Recall is tested against brute force.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The query side is a literal-filtered subset of the same table —
    Catalyst broadcasts it (small), so the 'cross' is a broadcast
    nested-loop over |queries| × corpus, embarrassingly parallel over
    corpus partitions. Output: (query_id, neighbor_id, rank)."""
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def sql_cosine_topk(
    table: str, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH flat AS (
        SELECT {id_col} AS vid,
               generate_subscripts({vec_col}, 1) AS pos,
               CAST(unnest({vec_col}) AS DOUBLE) AS e
        FROM {table}
    ), norms AS (
        SELECT vid, sqrt(SUM(e * e)) AS nrm FROM flat GROUP BY vid
    ), dots AS (
        SELECT q.vid AS query_id, c.vid AS neighbor_id, SUM(q.e * c.e) AS dp
        FROM flat q JOIN flat c ON q.pos = c.pos AND q.vid <> c.vid
        WHERE q.vid IN ({ids})
        GROUP BY 1, 2
    ), scored AS (
        SELECT d.query_id, d.neighbor_id,
               d.dp / (nq.nrm * nc.nrm) AS cos,
               row_number() OVER (PARTITION BY d.query_id
                   ORDER BY d.dp / (nq.nrm * nc.nrm) DESC, d.neighbor_id ASC) AS rank
        FROM dots d
        JOIN norms nq ON nq.vid = d.query_id
        JOIN norms nc ON nc.vid = d.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
    FROM scored WHERE rank <= {k}
    """


def _dim_from_metadata(emb: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality without a driver-side action: parquet
    column metadata first (datagen stamps it), else a min/max-size
    aggregate over the column (one cheap JVM scan, ragged input is an
    error rather than a silently wrong hyperplane count)."""
    field = emb.schema[vec_col]
    md = field.metadata or {}
    if "dim" in md:
        return int(md["dim"])
    row = emb.select(
        F.min(F.size(vec_col)).alias("lo"), F.max(F.size(vec_col)).alias("hi")
    ).first()
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"ragged {vec_col!r} sizes: {row['lo']}..{row['hi']}"
        )
    return int(row["hi"])


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(vec · plane_i)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact ranking *within* the query's LSH bucket.

    At scale: bucket assignment is a narrow map; the join is an
    equi-join on bucket (2^n_planes-way partitioned), so each query
    touches ~corpus/2^n_planes candidates instead of the full corpus."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ t, candidates restricted to
    same-LSH-bucket (all-pairs within bucket, never global)."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = emb.select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    a = bucketed.select(F.col("doc").alias("id_a"), F.col("vec").alias("va"), "bucket")
    b = bucketed.select(F.col("doc").alias("id_b"), F.col("vec").alias("vb"), "bucket")
    return (
        a.join(b, on="bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
