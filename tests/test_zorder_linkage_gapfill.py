"""Z-order stats skipping (sources/zorder.py), blocked fuzzy matching
(operators/linkage.py), and time-grid gap fill (operators/timeseries.py).

The physical claims under test: the Z-order manifest drops files for
rectangles AND single-dimension slabs (the property a one-column sort
lacks); the fuzzy join never leaves its blocks and respects the
hot-block cap; gap fill produces a dense grid with correct zero-fill /
carry-forward semantics.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from spamscope_spark.operators import linkage, timeseries
from spamscope_spark.sources import zorder

SF = "/root/testdata/sf0.001"


class TestZorder:
    def test_morton_interleave_unit(self, spark):
        # a=0b1010, b=0b0101 -> z bits a3 b3 a2 b2 a1 b1 a0 b0 = 0b10011001
        row = (
            spark.range(1)
            .select(
                zorder.morton_interleave(
                    F.lit(10).cast("long"), F.lit(5).cast("long"), bits=4
                ).alias("z")
            )
            .collect()[0]
        )
        assert row["z"] == 0b10011001

    def test_pruned_scan_matches_full_filter(self, spark):
        path = zorder.ensure_zorder_events(spark, SF)
        u_lo, u_hi, t_lo, t_hi = zorder.default_rectangle(path)
        got = sorted(
            r["event_id"]
            for r in zorder.pruned_scan(
                spark, path, u_lo, u_hi, t_lo, t_hi
            ).collect()
        )
        raw = spark.read.parquet(f"{SF}/events.parquet")
        want = sorted(
            r["event_id"]
            for r in raw.where(
                F.col("user_id").between(u_lo, u_hi)
                & F.unix_timestamp("ts").between(t_lo, t_hi)
            ).collect()
        )
        assert got == want and len(got) > 0

    def test_rectangle_and_slabs_all_prune(self, spark):
        path = zorder.ensure_zorder_events(spark, SF)
        u_lo, u_hi, t_lo, t_hi = zorder.default_rectangle(path)
        rect_sel, total = zorder.select_files(path, u_lo, u_hi, t_lo, t_hi)
        assert len(rect_sel) <= total // 2, (len(rect_sel), total)
        # the Morton property: EITHER dimension alone still skips files
        for args in [(u_lo, u_hi, None, None), (None, None, t_lo, t_hi)]:
            sel, tot = zorder.select_files(path, *args)
            assert 0 < len(sel) < tot, (args, len(sel), tot)

    def test_out_of_range_rectangle_reads_nothing(self, spark):
        path = zorder.ensure_zorder_events(spark, SF)
        g = zorder.read_manifest(path)["global"]
        sel, _ = zorder.select_files(path, g["umax"] + 10, g["umax"] + 20)
        assert sel == []
        df = zorder.pruned_scan(spark, path, g["umax"] + 10, g["umax"] + 20)
        assert df.count() == 0

    def test_manifest_covers_all_rows(self, spark):
        path = zorder.ensure_zorder_events(spark, SF)
        man = zorder.read_manifest(path)
        raw_n = spark.read.parquet(f"{SF}/events.parquet").count()
        assert sum(f["rows"] for f in man["files"]) == raw_n
        assert len(man["files"]) > 1


def _mk_clean(spark):
    return spark.createDataFrame(
        [
            (1, "acme widgets north"),
            (2, "acme widgets south"),
            (3, "zenith gears ltd"),
        ],
        ["clean_id", "clean_name"],
    )


class TestBlockedFuzzyMatch:
    def test_planted_typos_match_best(self, spark):
        dirty = spark.createDataFrame(
            [
                (10, "acme wigets north"),   # deletion -> dist 1 to id 1
                (11, "zenith gears ltd"),    # exact -> dist 0 to id 3
                (12, "acme widgets soutX"),  # substitution -> dist 1 to id 2
                (13, "completely else"),     # no candidate in any block
            ],
            ["dirty_id", "dirty_name"],
        )
        got = {
            r["dirty_id"]: (r["match_key"], r["dist"])
            for r in linkage.blocked_fuzzy_match(
                _mk_clean(spark), dirty
            ).collect()
        }
        assert got == {10: (1, 1), 11: (3, 0), 12: (2, 1)}

    def test_tie_breaks_to_lowest_clean_id(self, spark):
        # "sorth" is dist 1 from BOTH "north" (id 1) and "south" (id 2)
        # -> equal distance, lowest clean_id wins deterministically
        dirty = spark.createDataFrame(
            [(20, "acme widgets sorth")], ["dirty_id", "dirty_name"]
        )
        rows = linkage.blocked_fuzzy_match(_mk_clean(spark), dirty).collect()
        assert [(r["match_key"], r["dist"]) for r in rows] == [(1, 1)]

    def test_hot_block_cap_drops_block(self, spark):
        dirty = spark.createDataFrame(
            [(10, "acme wigets north"), (11, "zenith gears ltd")],
            ["dirty_id", "dirty_name"],
        )
        got = linkage.blocked_fuzzy_match(
            _mk_clean(spark), dirty, max_block_size=1
        ).collect()
        # the two "acme" names exceed the cap -> block excluded entirely;
        # the singleton "zeni" block survives
        assert [(r["dirty_id"], r["match_key"]) for r in got] == [(11, 3)]


class TestGapFill:
    def test_zero_fill_and_carry_forward(self, spark):
        h = lambda i: dt.datetime(2024, 1, 1, i, 30)
        ev = spark.createDataFrame(
            [
                ("A", h(0), 10.0),
                ("A", h(0), 20.0),
                ("A", h(3), 40.0),
                ("B", h(1), 5.0),
            ],
            ["event_type", "ts", "value"],
        )
        rows = {
            (r["event_type"], r["hour"].hour): (
                r["n_events"],
                r["avg_value_ffill"],
            )
            for r in timeseries.gap_fill_hourly(ev).collect()
        }
        assert rows == {
            ("A", 0): (2, 15.0),
            ("A", 1): (0, 15.0),   # silent hour: zero events, carried avg
            ("A", 2): (0, 15.0),
            ("A", 3): (1, 40.0),
            ("B", 0): (0, None),   # before B's first observation
            ("B", 1): (1, 5.0),
            ("B", 2): (0, 5.0),
            ("B", 3): (0, 5.0),
        }


class TestSaltedJoin:
    def test_salt_reaches_the_exchange_key(self, spark):
        """With broadcast off, both join inputs must hash-partition on
        (key, _salt) — the salt actually changes the shuffle, it is not
        optimized away."""
        from spamscope_spark.operators import skew
        from spamscope_spark.plans import explain

        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = skew.salted_join(
                li, orders, ["l_orderkey"], F.col("l_linenumber"), n_salts=8
            )
            txt = explain.plan_text(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        hash_lines = [
            l for l in txt.splitlines() if "hashpartitioning(l_orderkey" in l
        ]
        assert len(hash_lines) >= 2, txt
        assert all("_salt" in l for l in hash_lines), hash_lines

    def test_salting_is_semantically_invisible(self, spark):
        from spamscope_spark.operators import skew

        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        salted = skew.salted_join(
            li, orders, ["l_orderkey"], F.col("l_linenumber"), n_salts=8
        )
        plain = li.join(orders, "l_orderkey")
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )


def _py_interleave(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


class TestSemanticsInvariants:
    def test_morton_interleave_bijective_exhaustive(self, spark):
        """All 256x256 quantized inputs in one job: the column expr
        matches the Python spec bit-for-bit and is a bijection."""
        rows = (
            spark.range(256 * 256)
            .select(
                (F.col("id") / 256).cast("long").alias("a"),
                (F.col("id") % 256).cast("long").alias("b"),
            )
            .select(
                "a", "b", zorder.morton_interleave(F.col("a"), F.col("b")).alias("z")
            )
            .collect()
        )
        zs = set()
        for r in rows:
            assert r["z"] == _py_interleave(r["a"], r["b"]), (r["a"], r["b"])
            zs.add(r["z"])
        assert len(zs) == 256 * 256

    def test_gap_fill_conservation_invariants(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        out = timeseries.gap_fill_hourly(ev).collect()
        n_types = ev.select("event_type").distinct().count()
        hours = {r["hour"] for r in out}
        # dense grid: |types| x |hours|, every type covers every hour
        assert len(out) == n_types * len(hours)
        # activity conservation: zero-fill adds rows, never events
        assert sum(r["n_events"] for r in out) == ev.count()
        # carry-forward: null only before a type's first active hour
        by_type: dict[str, list] = {}
        for r in sorted(out, key=lambda r: (r["event_type"], r["hour"])):
            by_type.setdefault(r["event_type"], []).append(r)
        for rows_t in by_type.values():
            seen_active = False
            for r in rows_t:
                if r["n_events"] > 0:
                    seen_active = True
                assert (r["avg_value_ffill"] is None) == (not seen_active)

    def test_silence_counter_invariants(self, spark):
        from spamscope_spark.operators.cep import silence_windows

        ev = spark.read.parquet(f"{SF}/events.parquet")
        cnt = ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        ).agg(F.count(F.lit(1)).alias("n"))
        out = sorted(
            silence_windows(cnt, "event_type", 3600).collect(),
            key=lambda r: (r["event_type"], r["window_start"]),
        )
        assert any(r["is_silent"] for r in out)
        prev: dict[str, int] = {}
        for r in out:
            # counter semantics: 0 iff active, else previous + 1
            if r["n"] > 0:
                assert r["windows_since_seen"] == 0 and not r["is_silent"]
            else:
                assert r["is_silent"]
                assert r["windows_since_seen"] == prev[r["event_type"]] + 1
            prev[r["event_type"]] = r["windows_since_seen"]
