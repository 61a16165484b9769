"""Golden config-loading tests ported from the reference
(tests/test_utils.py:287-318 keyword loaders, :364-386 whitelist expiry).
"""

from __future__ import annotations

import datetime as dt

import pytest

from spamscope_spark import configload

NOW = dt.datetime(2026, 8, 16, tzinfo=dt.timezone.utc)


def test_keywords_list_lowercases_and_merges(tmp_path):
    p1 = tmp_path / "a.yml"
    p1.write_text("- Conferma\n- Bonifico\n- 123456\n")
    out = configload.load_keywords_list({"generic": str(p1), "custom": ["URGENT"]})
    assert out == ["123456", "bonifico", "conferma", "urgent"]


def test_keywords_list_type_error(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("key: value\n")
    with pytest.raises(RuntimeError):
        configload.load_keywords_list({"generic": str(p)})


def test_keywords_dict_merges_values(tmp_path):
    p = tmp_path / "t.yml"
    p.write_text("Google:\n- Gmail\n- GOOGLE Drive\nAmazon:\n- amazon\n")
    out = configload.load_keywords_dict({"generic": str(p)})
    assert out == {"Google": ["gmail", "google drive"], "Amazon": ["amazon"]}
    with pytest.raises(RuntimeError):
        configload.load_keywords_dict({"g": {"Google": "notalist"}})


class TestWhitelistExpiry:
    DOMAINS = ["google.com", "Amazon.com", "facebook.com", "apache.org"]

    def test_no_expiry_loads(self):
        out = configload.load_whitelist({"generic": {"values": self.DOMAINS}}, now=NOW)
        assert {"google.com", "amazon.com", "facebook.com"} <= out

    def test_none_expiry_loads(self):
        out = configload.load_whitelist(
            {"generic": {"values": self.DOMAINS, "expiry": None}}, now=NOW
        )
        assert "google.com" in out

    def test_expired_list_is_empty(self):
        # reference golden: expiry 2016-06-28T12:33:00.000Z ⇒ empty set
        out = configload.load_whitelist(
            {"generic": {"values": self.DOMAINS, "expiry": "2016-06-28T12:33:00.000Z"}},
            now=NOW,
        )
        assert out == set()

    def test_future_expiry_loads(self):
        out = configload.load_whitelist(
            {"generic": {"values": self.DOMAINS, "expiry": "2999-01-01T00:00:00Z"}},
            now=NOW,
        )
        assert "apache.org" in out
