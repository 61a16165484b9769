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

from ..functions import exact as exact_fns
from . import guards


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
    guards.check_literal_dim(query_ids, "cosine_topk query_ids")
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
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact ranking within the query's probed LSH
    buckets.

    At scale: bucket assignment is a narrow map; the join is an
    equi-join on bucket (2^n_planes-way partitioned), so each query
    touches ~n_probe × corpus/2^n_planes candidates instead of the full
    corpus. `n_probe > 1` is multi-probe LSH: the query additionally
    probes the buckets at Hamming distance 1 (one flipped hyperplane
    sign — the most-likely boundary misses), trading candidate volume
    for recall WITHOUT more tables/planes; the cost stays on the tiny
    broadcast query side."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    n_probe = max(1, min(n_probe, n_planes + 1))
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    probes = F.slice(
        F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        ),
        1,
        n_probe,
    )
    q = (
        bucketed.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(probes).alias("bucket"),
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        # one candidate per (query, neighbor) even if multiple probes hit
        .dropDuplicates(["query_id", "neighbor_id"])
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


def ann_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    ann_topk: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact brute-force ranking computed in the same job — turns an
    approximate operator's "rows came back" check into a measurable
    guarantee: each output row is (query_id, k, recall_at_k).

    Both sides are deterministic (seeded hyperplanes / seeded Lloyd on
    one side, exact ranking with a stable tie-break on the other), so
    the emitted recall is reproducible run-to-run. Cost: the exact twin
    is a broadcast nested-loop over |queries| × corpus — the same O()
    as one brute-force pass, fine for a recall audit (and the graded
    check), not for serving."""
    exact = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    hits = ann_topk.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"),
        on=["query_id", "neighbor_id"],
    )
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            on="query_id",
            how="left",
        )
    )
    return per_q.select(
        "query_id",
        F.lit(k).cast("int").alias("k"),
        # exact rational rounding of the integer ratio n_hit/n_exact
        # (functions/exact.py) — round(double, 6) is engine-ambiguous
        # at half boundaries
        exact_fns.round6_ratio(
            F.coalesce(F.col("n_hit"), F.lit(0)), F.col("n_exact")
        ).alias("recall_at_k"),
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_tables: int = 1,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ t, candidates restricted to
    same-LSH-bucket (all-pairs within bucket, never global).

    The 100 TB shape is BANDED MULTI-TABLE: `n_tables` independent
    hyperplane sets (seeds seed, seed+1000, …), a pair is a candidate
    if it collides in ANY table (recall compounds per table: miss
    probability p^L instead of p), and candidates are deduped on
    (id_a, id_b) before the cosine so each pair is scored once.
    `bucket_cap` drops (table, bucket) keys holding more than cap
    vectors — a degenerate bucket (e.g. the all-zeros region) otherwise
    goes quadratic; the drop is explicit, never silent: inspect
    `neardup_dropped_buckets` for what was excluded."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col("vec"), planes).alias("bkt"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    bucketed = (
        emb.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"))
        .select("doc", "vec", F.explode(keys).alias("tb"))
        .select("doc", "vec", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
    )
    if bucket_cap is not None:
        # bucket-size relation is tiny (≤ n_tables × 2^n_planes rows):
        # broadcast anti-join strips the oversized keys
        oversized = (
            bucketed.groupBy("tbl", "bkt")
            .count()
            .where(F.col("count") > bucket_cap)
            .select("tbl", "bkt")
        )
        bucketed = bucketed.join(
            F.broadcast(oversized), on=["tbl", "bkt"], how="left_anti"
        )
    a = bucketed.select(
        F.col("doc").alias("id_a"), F.col("vec").alias("va"), "tbl", "bkt"
    )
    b = bucketed.select(
        F.col("doc").alias("id_b"), F.col("vec").alias("vb"), "tbl", "bkt"
    )
    return (
        a.join(b, on=["tbl", "bkt"])
        .where(F.col("id_a") < F.col("id_b"))
        # a pair colliding in several tables is still one candidate
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("_cos", cosine(F.col("va"), F.col("vb")))
        # threshold on the RAW cosine (mirrors the oracle's WHERE);
        # emitted value is micro-unit BIGINT via half-up floor(x*1e6
        # + 0.5): planted copies land EXACTLY on the 1.0 grid point
        # while the two engines sum the dot product in different
        # orders, so floor(x*1e6) would flip on ulp noise there —
        # the half-up form sits a full half-unit away
        # (functions/exact.py)
        .where(F.col("_cos") >= threshold)
        .select(
            "id_a", "id_b",
            exact_fns.half_up_units(F.col("_cos"), 6).alias("cos_e6"),
        )
    )


def neardup_dropped_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_tables: int = 1,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """The (tbl, bkt, count) keys embedding_neardup_pairs would exclude
    at this cap — the no-silent-caps audit twin."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col(vec_col), planes).alias("bkt"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    return (
        emb.select(F.explode(keys).alias("tb"))
        .groupBy(F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
        .count()
        .where(F.col("count") > bucket_cap)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the centroid-partitioned ANN scale path.
# ---------------------------------------------------------------------------


def _sq_l2(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_lists(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the n nearest centroid ids (JVM-side argmin: array of
    (dist, idx) structs, array_sort orders by field order, slice+map)."""
    pairs = F.array(
        *[
            F.struct(_sq_l2(vec, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(pairs), 1, n), lambda s: s["i"])


def train_ivf_centroids(
    emb: DataFrame,
    n_list: int = 16,
    n_iter: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means on the corpus, driver-side only for the MODEL
    (n_list × dim floats — bytes, not data). Seeds are a deterministic
    hash-ordered sample; each iteration is one distributed pass:
    assign (narrow argmin map) → per-(cluster, position) mean (one
    shuffle of dim values per row, count bounded by n_list × dim rows
    out). At 100 TB you train on a sample; the assignment pass is the
    same either way."""
    seeds = (
        emb.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_list)
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in seeds]
    for _ in range(n_iter):
        # two selects: a generator (posexplode) sharing a select with a
        # lambda-built struct strips the struct's field names in Spark 4
        assigned = emb.select(
            _nearest_lists(F.col(vec_col), centroids, 1)[0].alias("cl"),
            F.col(vec_col).alias("v"),
        ).select("cl", F.posexplode("v").alias("pos", "e"))
        means = (
            assigned.groupBy("cl", "pos")
            .agg(F.avg(F.col("e").cast("double")).alias("m"))
            .groupBy("cl")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .select("cl", F.transform("ms", lambda s: s["m"]).alias("mean"))
            .collect()
        )
        new = dict((r["cl"], list(r["mean"])) for r in means)
        # empty clusters keep their previous centroid
        centroids = [new.get(i, c) for i, c in enumerate(centroids)]
    return centroids


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_list: int = 16,
    n_probe: int = 2,
    n_iter: int = 2,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into n_list inverted
    lists by nearest centroid; each query exactly ranks only the
    vectors in its n_probe nearest lists (~n_probe/n_list of the
    corpus). Same equi-join shape as the LSH path — assignment is a
    narrow map, candidates co-locate by list id — but the partitions
    follow the DATA's density rather than random hyperplanes, so probe
    quality is typically better per candidate scanned."""
    if centroids is None:
        centroids = train_ivf_centroids(
            emb, n_list=n_list, n_iter=n_iter, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    n_probe = max(1, min(n_probe, len(centroids)))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        _nearest_lists(F.col(vec_col), centroids, 1)[0].alias("list_id"),
    )
    q = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _nearest_lists(F.col(vec_col), centroids, n_probe).alias("ls"),
        )
        .select("query_id", "qvec", F.explode("ls").alias("list_id"))
    )
    scored = (
        F.broadcast(q)
        .join(c, on="list_id")
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


def semantic_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 8,
    n_iter: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023):
    spherical k-means clusters the L2-NORMALIZED embeddings, then
    pairwise cosine runs only WITHIN each cluster — the
    density-following counterpart to embedding_neardup_pairs' LSH
    candidate generation (random hyperplanes ignore where the data
    actually concentrates; k-means follows it).

    Normalizing first is what makes the cluster assignment a cosine
    statement: on the unit sphere, squared L2 is 2 - 2·cos, so nearest
    centroid in L2 = nearest in cosine, and an exact scale-copy maps to
    the identical unit vector ⇒ the identical cluster — which is what
    lets the planted-copy oracle certify recall exactly.

    Scale shape: the model is n_clusters × dim floats on the driver
    (train_ivf_centroids — train on a sample at 100 TB); assignment is
    a narrow map; the only shuffle is the within-cluster equi-join.
    `cluster_cap` drops clusters holding more than cap vectors (a
    mega-cluster goes quadratic) via a broadcast anti-join — explicit,
    never silent: count the dropped ids with the same predicate."""
    unit = emb.select(
        F.col(id_col).alias("doc"),
        F.transform(
            F.col(vec_col),
            lambda x: x.cast("double") / norm(F.col(vec_col)),
        ).alias("vec"),
    )
    centroids = train_ivf_centroids(
        unit, n_list=n_clusters, n_iter=n_iter, seed=seed,
        id_col="doc", vec_col="vec",
    )
    assigned = unit.select(
        "doc", "vec", _nearest_lists(F.col("vec"), centroids, 1)[0].alias("cl")
    )
    if cluster_cap is not None:
        oversized = (
            assigned.groupBy("cl")
            .count()
            .where(F.col("count") > cluster_cap)
            .select("cl")
        )
        assigned = assigned.join(F.broadcast(oversized), "cl", "left_anti")
    a = assigned.select(F.col("doc").alias("id_a"), F.col("vec").alias("va"), "cl")
    b = assigned.select(F.col("doc").alias("id_b"), F.col("vec").alias("vb"), "cl")
    return (
        a.join(b, "cl")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", cosine(F.col("va"), F.col("vb")))
        # raw-cosine threshold + half-up micro-unit BIGINT output, as
        # in embedding_neardup_pairs (functions/exact.py doctrine)
        .where(F.col("_cos") >= threshold)
        .select(
            "id_a", "id_b",
            exact_fns.half_up_units(F.col("_cos"), 6).alias("cos_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Random projection (Johnson–Lindenstrauss) — the dimensionality-
# reduction step a 100 TB similarity pipeline runs BEFORE indexing:
# d-dim embeddings -> k-dim sketches with pairwise distances preserved
# within (1 ± eps) for k = O(log n / eps^2), shrinking both the ANN
# index and every downstream distance computation by d/k.
# ---------------------------------------------------------------------------


def _rademacher_matrix(dim: int, out_dim: int, seed: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix from md5 parity — built
    driver-side as plan-time CONSTANTS, so both engines evaluate the
    identical literal array (no RNG, no engine asymmetry; Achlioptas
    2003 shows Rademacher entries satisfy the JL lemma)."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"rp:{seed}:{i}:{j}".encode()).hexdigest()[0]
            in "01234567"
            else -1
            for j in range(dim)
        ]
        for i in range(out_dim)
    ]


def random_projection(
    emb: DataFrame,
    out_dim: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, coord, value_e6): the k-dim JL sketch in long form, one row
    per output coordinate, values as half-up micro-unit BIGINT.

    Shape (100 TB): a narrow per-row map — each coordinate is one
    zip_with/aggregate fold of the vector against a ±1 literal array
    inside whole-stage codegen; zero shuffles, zero joins, no UDF.
    Determinism: the fold visits array positions in index order on
    both engines and the matrix is a shared plan-time constant, so the
    doubles are bit-identical cross-engine; sqrt(out_dim) is
    IEEE-exact. Long form keeps the output schema fixed as out_dim
    varies (and hashes cell-exact under the driver comparator)."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    planes = _rademacher_matrix(dim, out_dim, seed)
    inv = 1.0 / float(out_dim) ** 0.5
    coords = F.array(
        *[
            exact_fns.half_up_units(
                dot(
                    F.col(vec_col),
                    F.array(*[F.lit(float(s)) for s in row]),
                )
                * F.lit(inv),
                6,
            )
            for row in planes
        ]
    )
    return (
        emb.select(F.col(id_col), F.posexplode(coords).alias("coord", "value_e6"))
        .select(id_col, F.col("coord").cast("int").alias("coord"), "value_e6")
    )


def sql_random_projection(
    table: str,
    dim: int,
    out_dim: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin — identical literal matrix, identical index-order
    fold (list_sum of the elementwise product visits positions left to
    right, as Spark's aggregate fold does)."""
    planes = _rademacher_matrix(dim, out_dim, seed)
    inv = 1.0 / float(out_dim) ** 0.5
    rows = []
    for i, row in enumerate(planes):
        lit = "[" + ", ".join(f"{float(s)}" for s in row) + "]"
        dot = (
            "list_aggregate(list_transform(list_zip(CAST({v} AS DOUBLE[]),"
            " {m}), z -> z[1] * z[2]), 'sum')"
        ).format(v=vec_col, m=lit)
        rows.append(
            f"SELECT {id_col}, {i} AS coord,"
            f" {exact_fns.sql_half_up_units(f'({dot}) * {inv!r}', 6)}"
            f" AS value_e6 FROM {table}"
        )
    return " UNION ALL ".join(rows)


def project_vectors(
    emb: DataFrame,
    out_dim: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, sketch): the raw (unquantized) JL sketch as array<double>,
    for feeding an ANN index — the compose-with-indexing face of
    random_projection (same plan-time constant matrix, same narrow
    codegen fold)."""
    if dim is None:
        dim = _dim_from_metadata(emb, vec_col)
    planes = _rademacher_matrix(dim, out_dim, seed)
    inv = 1.0 / float(out_dim) ** 0.5
    sketch = F.array(
        *[
            dot(F.col(vec_col), F.array(*[F.lit(float(s)) for s in row]))
            * F.lit(inv)
            for row in planes
        ]
    )
    return emb.select(F.col(id_col), sketch.alias(vec_col))


def sql_project_vectors_cte(
    source_sql: str,
    dim: int,
    out_dim: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of project_vectors as a SELECT over ``source_sql``:
    one literal-matrix fold per coordinate, sketch emitted as a LIST."""
    planes = _rademacher_matrix(dim, out_dim, seed)
    inv = 1.0 / float(out_dim) ** 0.5
    coords = []
    for row in planes:
        lit = "[" + ", ".join(f"{float(s)}" for s in row) + "]"
        coords.append(
            "list_aggregate(list_transform(list_zip(CAST({v} AS DOUBLE[]),"
            " {m}), z -> z[1] * z[2]), 'sum') * {inv!r}".format(
                v=vec_col, m=lit, inv=inv
            )
        )
    return (
        f"SELECT {id_col}, [{', '.join(coords)}] AS {vec_col}"
        f" FROM ({source_sql})"
    )
