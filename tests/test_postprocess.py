"""Post-processor plugin chain: registry semantics (priority order,
active flag, enabled gating — utils.py:375-397 shape), chain output
golden, and the broadcast plan for the intel stage."""

from __future__ import annotations

import pyspark.sql.functions as F

from spamscope_spark.operators.postprocess import (
    INTEL_FEED,
    apply_postprocessors,
    intel_feed_df,
    register,
)
from spamscope_spark.plans import explain
from spamscope_spark.plans.queries import q_post_chain

SF = "/root/testdata/sf0.001"


class TestRegistry:
    def test_priority_order_and_enabled_gating(self, spark):
        reg: set = set()
        calls = []

        @register(reg, priority=20)
        def second(df, conf):
            calls.append("second")
            return df.withColumn("b", F.col("a") * 2)

        @register(reg, priority=10)
        def first(df, conf):
            calls.append("first")
            return df.withColumn("a", F.lit(1))

        @register(reg, priority=30)
        def disabled(df, conf):
            calls.append("disabled")
            return df

        df = spark.range(3)
        out = apply_postprocessors(
            df,
            {"first": {"enabled": True}, "second": {"enabled": True},
             "disabled": {"enabled": False}},
            registry=reg,
        )
        # priority order matters: `second` reads the column `first` adds
        assert calls == ["first", "second"]
        assert out.select(F.sum("b")).first()[0] == 6

    def test_active_false_removes_from_registry(self, spark):
        reg: set = set()

        @register(reg, priority=5)
        def stage(df, conf):
            return df

        assert len(reg) == 1
        # re-decorating with active=False discards the pair — the
        # reference's disable-in-source mechanism
        register(reg, priority=5, active=False)(stage)
        assert reg == set()

    def test_tie_broken_by_name(self, spark):
        reg: set = set()
        calls = []

        @register(reg, priority=1)
        def zeta(df, conf):
            calls.append("zeta")
            return df

        @register(reg, priority=1)
        def alpha(df, conf):
            calls.append("alpha")
            return df

        apply_postprocessors(
            spark.range(1),
            {"zeta": {"enabled": True}, "alpha": {"enabled": True}},
            registry=reg,
        )
        assert calls == ["alpha", "zeta"]


class TestChain:
    def test_intel_left_join_semantics(self, spark):
        df = spark.createDataFrame(
            [("src1",), ("src2",)], "source string"
        )
        out = apply_postprocessors(
            df, {"intel": {"enabled": True, "feed": intel_feed_df(spark)}}
        )
        rows = {r["source"]: r for r in out.collect()}
        assert rows["src1"]["intel_category"] == "malicious"
        assert rows["src1"]["reputation"] == 95
        # absent from the feed = no report: nulls, row kept
        assert rows["src2"]["intel_category"] is None

    def test_intel_join_is_broadcast(self, spark):
        df = q_post_chain(spark, SF)
        assert explain.has_broadcast_join(df)

    def test_chain_stays_jvm_side(self, spark):
        txt = explain.plan_text(q_post_chain(spark, SF))
        assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt

    def test_feed_is_deterministic(self):
        assert INTEL_FEED == sorted(INTEL_FEED, key=lambda t: int(t[0][3:]))
