"""Z-order (Morton-curve) file clustering + per-file column-stats skipping.

Reference analog: SpamScope prunes at the SOURCE — the spout walks only
the mailbox directories named in its config (`src/spouts/files_mails.py:81-107`),
so excluded mail is never read at all. `sources/partitioned.py` covers
the low-cardinality warehouse analog (hive directory pruning). This
module covers the HIGH-cardinality analog used by modern table formats
(Iceberg/Delta data skipping): cluster the data files along a
space-filling curve over two numeric dimensions and keep per-file
min/max column stats in a manifest, so a rectangle predicate over
either or both dimensions drops whole files from the scan before any
I/O happens.

Why a Morton curve and not a plain sort: a single-column sort gives
perfect file skipping on that column and NONE on any other — at 100 TB
a `ts`-sorted events table answers "user 123 last week" by reading the
whole week. Interleaving the bits of (user_id, ts) bounds every file's
min/max box in BOTH dimensions at once: a query rectangle on either
dimension alone, or both, intersects only O(perimeter) of the files
instead of all of them. The curve cost is paid once at write; reads
get the skipping for free from the manifest.

Scale shape: the layout write is one `repartitionByRange` shuffle on
the z-value (range boundaries from Spark's own sampling — no driver
sort); the stats pass is one aggregation grouped by file name (one row
per FILE, metadata-sized, like any table-format manifest); the read
path opens only surviving files and applies the residual predicate,
which Catalyst additionally pushes into the parquet row-group stats of
those files. Nothing here collects data rows to the driver.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .evolve import source_fingerprint

Z_ROOT = os.environ.get("SPARK_GRAFT_ZORDER_DIR", "/tmp/spamscope_zorder")

N_FILES = 32
BITS = 8  # per-dimension quantization bits (256 bins per dimension)


def zorder_events_path(sf_dir: str) -> str:
    sf_key = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join(Z_ROOT, f"events_{sf_key}")


def morton_interleave(a: Column, b: Column, bits: int = BITS) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a
    single z-value: bit i of `a` lands at position 2i+1, bit i of `b`
    at 2i. Pure JVM bit arithmetic — 2*bits codegen'd terms, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def _quantize(col: Column, lo: Column, hi: Column, bits: int = BITS) -> Column:
    """Map a value in [lo, hi] to an integer bin in [0, 2^bits)."""
    nbins = 1 << bits
    span = (hi - lo + F.lit(1)).cast("double")
    return F.least(
        F.lit(nbins - 1).cast("long"),
        F.floor((col - lo).cast("double") * F.lit(nbins) / span),
    )


def ensure_zorder_events(
    spark: SparkSession, sf_dir: str, n_files: int = N_FILES, bits: int = BITS
) -> str:
    """Write `events` z-ordered on (user_id, unix_ts) into ~n_files
    range-partitioned files, plus a `_zmanifest.json` holding global
    dimension bounds and per-file min/max stats. Idempotent per sf."""
    path = zorder_events_path(sf_dir)
    manifest_path = os.path.join(path, "_zmanifest.json")
    src_fp = source_fingerprint(sf_dir)
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                if json.load(f).get("source") == src_fp:
                    return path
        except (json.JSONDecodeError, OSError):
            pass  # unreadable manifest: rebuild

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev = ev.withColumn("_ut", F.unix_timestamp("ts"))
    # Global dimension bounds: one aggregated row — manifest metadata,
    # the same driver-sized model any table format keeps per table.
    gb = ev.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("_ut").alias("tmin"),
        F.max("_ut").alias("tmax"),
    ).collect()[0]
    z = morton_interleave(
        _quantize(F.col("user_id"), F.lit(gb["umin"]), F.lit(gb["umax"]), bits),
        _quantize(F.col("_ut"), F.lit(gb["tmin"]), F.lit(gb["tmax"]), bits),
        bits,
    )
    (
        ev.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_ut")
        .write.mode("overwrite")
        .parquet(path)
    )
    # Per-file stats: group by physical file name — one output row per
    # file, the manifest a format like Iceberg materializes at commit.
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min("user_id").alias("umin"),
            F.max("user_id").alias("umax"),
            F.min(F.unix_timestamp("ts")).alias("tmin"),
            F.max(F.unix_timestamp("ts")).alias("tmax"),
            F.count("*").alias("rows"),
        )
        .collect()
    )
    doc = {
        "dims": ["user_id", "unix_timestamp(ts)"],
        "bits": bits,
        # source fingerprint: a regenerated events.parquet invalidates
        # this layout instead of silently diverging from the oracle's
        # raw-table read
        "source": src_fp,
        "global": {k: int(gb[k]) for k in ("umin", "umax", "tmin", "tmax")},
        "files": [
            {
                "file": r["file"].replace("file://", ""),
                "umin": int(r["umin"]),
                "umax": int(r["umax"]),
                "tmin": int(r["tmin"]),
                "tmax": int(r["tmax"]),
                "rows": int(r["rows"]),
            }
            for r in stats
        ],
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, manifest_path)
    return path


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_zmanifest.json")) as f:
        return json.load(f)


def select_files(
    path: str,
    u_lo: int | None = None,
    u_hi: int | None = None,
    t_lo: int | None = None,
    t_hi: int | None = None,
) -> tuple[list[str], int]:
    """Files whose stats box intersects the query rectangle (None = that
    side unbounded). Returns (surviving file paths, total file count)."""
    man = read_manifest(path)
    keep = []
    for fr in man["files"]:
        if u_hi is not None and fr["umin"] > u_hi:
            continue
        if u_lo is not None and fr["umax"] < u_lo:
            continue
        if t_hi is not None and fr["tmin"] > t_hi:
            continue
        if t_lo is not None and fr["tmax"] < t_lo:
            continue
        keep.append(fr["file"])
    return keep, len(man["files"])


def pruned_scan(
    spark: SparkSession,
    path: str,
    u_lo: int | None = None,
    u_hi: int | None = None,
    t_lo: int | None = None,
    t_hi: int | None = None,
) -> DataFrame:
    """Manifest-pruned read: open only the files whose stats box
    intersects the rectangle, then apply the exact residual predicate
    (which Catalyst further pushes into parquet row-group stats)."""
    files, _total = select_files(path, u_lo, u_hi, t_lo, t_hi)
    if not files:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*files)
    cond = F.lit(True)
    if u_lo is not None:
        cond = cond & (F.col("user_id") >= u_lo)
    if u_hi is not None:
        cond = cond & (F.col("user_id") <= u_hi)
    ut = F.unix_timestamp("ts")
    if t_lo is not None:
        cond = cond & (ut >= t_lo)
    if t_hi is not None:
        cond = cond & (ut <= t_hi)
    return df.where(cond)


def default_rectangle(path: str) -> tuple[int, int, int, int]:
    """The benchmark rectangle, derived from the global bounds with
    integer arithmetic so the DuckDB oracle reproduces it exactly:
    middle 45-60% of the user range x middle 30-70% of the time range."""
    g = read_manifest(path)["global"]
    du, dt = g["umax"] - g["umin"], g["tmax"] - g["tmin"]
    return (
        g["umin"] + du * 45 // 100,
        g["umin"] + du * 60 // 100,
        g["tmin"] + dt * 30 // 100,
        g["tmin"] + dt * 70 // 100,
    )
