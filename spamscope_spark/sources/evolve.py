"""Schema evolution: additive-column reads across generations of files.

A 100 TB table is never rewritten when a column is added — new files
carry the new column, old files don't, and the read path must present
one unified schema with nulls for pre-evolution rows (Iceberg/Delta
add-column semantics; parquet-level analog: `mergeSchema`). The
reference's records were schemaless Python dicts whose shape drifted
freely between versions (`src/bolts/tokenizer.py:99-149`); the
warehouse recast makes that drift explicit and typed.

Layout built here: two generations of the events table under one root
— `gen=1` (event_id, event_type, value) and `gen=2` with an appended
`quality` column — split deterministically by event_id parity."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVOLVE_ROOT = os.environ.get(
    "SPARK_GRAFT_EVOLVE_DIR", "/tmp/spamscope_evolved"
)


def evolved_events_path(sf_dir: str) -> str:
    sf_key = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join(EVOLVE_ROOT, f"events_{sf_key}")


def ensure_evolved_events(spark: SparkSession, sf_dir: str) -> str:
    """Write the two-generation layout once per sf; idempotent."""
    path = evolved_events_path(sf_dir)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = ev.select("event_id", "event_type", "value")
    base.where(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(path, "gen=1")
    )
    (
        base.where(F.col("event_id") % 2 == 1)
        .withColumn("quality", (F.col("event_id") % 5).cast("int"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "gen=2"))
    )
    with open(done, "w") as f:
        f.write("ok\n")
    return path


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Unified read across generations: mergeSchema reconciles the
    per-file footers into one schema; pre-evolution rows surface
    `quality` as null. Schema merging is a FOOTER-level (metadata)
    operation — no data rewrite, which is the entire point at scale."""
    return spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
