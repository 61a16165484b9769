"""Slowly-changing-dimension type-2 versioning over a change feed.

The reference's Elasticsearch output overwrites documents in place
(src/outputs/output_elasticsearch.py) — last write wins and history is
lost. A training-data / analytics store usually wants the opposite:
every value an entity ever held, with validity intervals, so a query
can reconstruct "the dimension as of T" (point-in-time joins for
feature backfills without label leakage).

Two forms:

- `scd2_from_changes`: batch build — full change feed in, versioned
  dimension out. One shuffle on the entity key; both windows share the
  same partitioning so Catalyst plans a single exchange.
- `scd2_apply`: incremental maintenance — current dimension snapshot +
  one batch of changes in, updated dimension out. This is the
  DataFrame form of the MERGE the Iceberg sink would run per epoch
  (close out current rows whose entity changed, insert new versions).
  The algebraic contract, asserted in tests: folding batches through
  `scd2_apply` equals `scd2_from_changes` over the concatenated feed.

Scale shape: everything is windows over (entity ORDER BY ts, seq) —
hash-partitioned by entity, no global sort, no driver state. Skewed
entities are bounded by their own history length, not corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_from_changes(
    df: DataFrame,
    entity_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    with_seq: bool = False,
) -> DataFrame:
    """Collapse a change feed into SCD2 history: one row per run of
    consecutive equal attribute values, with [valid_from, valid_to)
    intervals, a per-entity version number, and is_current on the open
    interval. `seq_col` breaks same-timestamp ties deterministically;
    with_seq=True carries it into the output (as `seq`) so incremental
    maintenance can replay history with identical tie-breaks."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    runs = (
        df.select(entity_col, attr_col, ts_col, seq_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .where(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    )
    w2 = Window.partitionBy(entity_col).orderBy(ts_col, seq_col)
    cols = [
        F.col(entity_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.col("valid_to"),
        F.col("version"),
        F.col("valid_to").isNull().alias("is_current"),
    ]
    if with_seq:
        cols.append(F.col(seq_col).alias("seq"))
    return (
        runs.withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .select(*cols)
    )


def sql_scd2_from_changes(
    table: str,
    entity_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> str:
    """DuckDB twin — identical run-collapse, interval, and tie-break
    semantics."""
    return f"""
    WITH ordered AS (
        SELECT {entity_col}, {attr_col}, {ts_col}, {seq_col},
            lag({attr_col}) OVER (PARTITION BY {entity_col}
                                  ORDER BY {ts_col}, {seq_col}) AS prev
        FROM {table}
    ), runs AS (
        SELECT * FROM ordered WHERE prev IS NULL OR {attr_col} <> prev
    )
    SELECT {entity_col}, {attr_col},
        {ts_col} AS valid_from,
        lead({ts_col}) OVER (PARTITION BY {entity_col}
                             ORDER BY {ts_col}, {seq_col}) AS valid_to,
        CAST(row_number() OVER (PARTITION BY {entity_col}
                                ORDER BY {ts_col}, {seq_col}) AS INTEGER)
            AS version,
        lead({ts_col}) OVER (PARTITION BY {entity_col}
                             ORDER BY {ts_col}, {seq_col}) IS NULL AS is_current
    FROM runs
    """


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    entity_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension with one batch of
    changes (the per-epoch MERGE):

    - entities untouched by the batch pass through unchanged (and,
      because re-versioning joins on the entity key, without their
      history being reshuffled more than once);
    - for touched entities, the batch's runs are appended to the open
      interval: the previously-current row is closed out at the first
      changed value's timestamp, consecutive-equal values collapse
      across the snapshot/batch boundary (a batch row equal to the
      entity's current value opens no new version).

    Implementation: for touched entities only, reconstruct the change
    feed (each history row contributes its valid_from as a change
    event; seq is carried so ties replay identically) and re-collapse
    with `scd2_from_changes`. The untouched majority of the dimension
    never enters a window."""
    touched = changes.select(entity_col).distinct()
    untouched = dim.join(touched, on=entity_col, how="left_anti")
    replay = (
        dim.join(touched, on=entity_col, how="left_semi")
        .select(
            entity_col,
            attr_col,
            F.col("valid_from").alias(ts_col),
            F.col("seq").alias(seq_col),
        )
        .unionByName(changes.select(entity_col, attr_col, ts_col, seq_col))
    )
    rebuilt = scd2_from_changes(
        replay, entity_col, attr_col, ts_col, seq_col, with_seq=True
    )
    return untouched.unionByName(rebuilt)


def init_scd2_dim(
    changes: DataFrame,
    entity_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Bootstrap a dimension (with the carried `seq` column) from an
    initial change feed."""
    return scd2_from_changes(
        changes, entity_col, attr_col, ts_col, seq_col, with_seq=True
    )


def scd2_point_in_time(
    facts: DataFrame,
    dim: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension: each fact row
    picks the version whose [valid_from, valid_to) interval contains
    its timestamp — the leakage-free feature join for training-data
    backfills (a fact never sees attribute values from its future).

    Implemented as the sort-merge union+window as-of form (one shuffle
    on the entity key, no interval pair expansion): dimension versions
    and facts interleave in (entity, ts) order, each fact inherits the
    last version at-or-before it, and a validity check nulls out facts
    before the entity's first version."""
    from pyspark.sql import Window as W

    d = dim.select(
        F.col(entity_col),
        F.col("valid_from").alias("_ts"),
        F.lit(0).alias("_kind"),  # versions sort before same-ts facts
        F.col("attr").alias("_attr") if "attr" in dim.columns else F.col(
            dim.columns[1]
        ).alias("_attr"),
        F.col("version").alias("_version"),
    )
    f = facts.select(
        F.col(entity_col),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast("string").alias("_attr"),
        F.lit(None).cast("int").alias("_version"),
        *[F.col(c) for c in facts.columns if c not in (entity_col, ts_col)],
    )
    merged = d.unionByName(f, allowMissingColumns=True)
    # _version in the ordering: when two versions open at the same
    # timestamp (tied change feed), the higher version wins — matching
    # interval semantics, where the earlier one is zero-length
    w = (
        W.partitionBy(entity_col)
        .orderBy("_ts", "_kind", F.col("_version").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = merged.select(
        "*",
        F.last("_attr", ignorenulls=True).over(w).alias("attr_asof"),
        F.last("_version", ignorenulls=True).over(w).alias("version_asof"),
    ).where(F.col("_kind") == 1)
    return out.select(
        entity_col,
        F.col("_ts").alias(ts_col),
        *[c for c in facts.columns if c not in (entity_col, ts_col)],
        "attr_asof",
        "version_asof",
    )
