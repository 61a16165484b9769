"""Tests for functions/ column-expression helpers added in r3."""

import pyspark.sql.functions as F
import pytest




class TestCharEntropy:
    def test_known_distributions(self, spark):
        from spamscope_spark.functions.textstats import char_entropy

        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["e"]
            for r in df.select("doc_id", char_entropy(F.col("text")).alias("e")).collect()
        }
        assert out[1] == 0.0           # single symbol
        assert out[2] == pytest.approx(1.0)   # two equiprobable symbols
        assert out[3] == pytest.approx(2.0)   # four equiprobable symbols
        assert out[4] is None and out[5] is None
