"""Pandas-emulation mirror of the driver's correctness gate.

The r3 driver artifact flagged 5 queries hash-red that the fetchall +
%.9g mirror (tools/check_correctness.py) graded green. The reproducible
mechanism (tested in round 4): DuckDB SUM over integer types returns
HUGEINT, which a pandas fetch (`res.df()`) downcasts to float64 — so an
all-integer column renders '2240.0' on the oracle side vs '2240' on the
Spark side under a plain str() normalizer. This mirror fetches BOTH
sides through pandas and normalizes with str(), the strictest plausible
driver path:

  - DuckDB: res.df()        (HUGEINT/DECIMAL -> float64, BIGINT -> int64)
  - Spark:  df.toPandas()   (long -> int64, nullable-with-nulls -> float64)
  - cell normalizer: str(v) (full repr for floats — no %.9g masking)

A query green here AND under check_correctness.py is robust to every
fetch/format combination the driver could use.

Usage: python tools/check_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from spamscope_spark.config import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB result column types that pandas renders differently from the
# matching Spark type — any of these in an oracle's output schema is a
# latent driver-side hash mismatch even if values agree numerically.
RISKY_DUCK_TYPES = ("HUGEINT", "INT128", "UHUGEINT", "DECIMAL", "UBIGINT")


def norm_cell(v):
    # str() — deliberately NOT %.9g. NaN/None unify (pandas float cols
    # carry NaN where Spark object cols carry None).
    if v is None:
        return "␀"
    if isinstance(v, float) and math.isnan(v):
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(df: pd.DataFrame):
    cols = sorted(df.columns)
    lines = sorted(
        "|".join(norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("dtype-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            n_rowsonly += 1
            print(f"ROWS {name}: no oracle")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failed.append(name)
            n_fail += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
            duck_types = [
                r[1] for r in con.execute(
                    f"DESCRIBE SELECT * FROM ({oracles[name]})"
                ).fetchall()
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            n_fail += 1
            continue
        risky = [
            f"{c}:{t}" for c, t in zip(odf.columns, duck_types)
            if any(t.startswith(r) for r in RISKY_DUCK_TYPES)
        ]
        ok_count = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_cols and frame_hash(sdf) == frame_hash(odf)
        if ok_count and ok_cols and ok_hash and not risky:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            tag = " RISKY-TYPES=" + ",".join(risky) if risky else ""
            print(
                f"FAIL {name}: rows {len(sdf)}/{len(odf)} cols_ok={ok_cols}"
                f" hash_ok={ok_hash}{tag}"
            )
            if ok_cols and len(sdf) and len(odf) and not ok_hash:
                cols = sorted(sdf.columns)
                sset = sorted(
                    "|".join(norm_cell(v) for v in row)
                    for row in sdf[cols].itertuples(index=False, name=None)
                )
                oset = sorted(
                    "|".join(norm_cell(v) for v in row)
                    for row in odf[cols].itertuples(index=False, name=None)
                )
                sonly = [x for x in sset if x not in set(oset)][:2]
                oonly = [x for x in oset if x not in set(sset)][:2]
                print(f"  spark-only: {sonly}")
                print(f"  oracle-only: {oonly}")
            failed.append(name)
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failed:
        print("failed:", " ".join(failed))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
