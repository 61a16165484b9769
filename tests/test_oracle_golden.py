"""Golden row-level tests ported from the reference's own suite
(tests/test_bitmap.py:90-192, tests/test_utils.py:153-186,320-445,
tests/test_phishing.py:108-137), run against our pure-Python oracle —
the ground truth the Spark columns are then checked against.
"""

from __future__ import annotations

import pytest

from spamscope_spark import oracle

# A small corpus with the same structural properties as the reference's
# lorem_ipsum.txt fixture (contains the golden keywords).
TEXT = (
    "Lorem ipsum dolor sit amet theophrastus ne quo vidit tacimates "
    "rationibus sed ut perspiciatis 12345678 unde omnis iste 11111 natus"
)


class TestBitmap:
    def _bm(self):
        return oracle.BitMap({"p0": 0, "p1": 1, "p2": 2})

    def test_set_unset_calculate(self):
        bm = self._bm()
        bm.set_property_score("p2")
        assert bm.score == 4
        bm.set_property_score("p0", "p1")
        assert bm.score == 7
        bm.unset_property_score("p0")
        assert bm.score == 6
        bm.unset_property_score("p1", "p2")
        assert bm.score == 0
        assert bm.calculate_score("p0", "p2") == 5
        assert bm.score == 0  # calculate does not mutate

    def test_score_out_of_range(self):
        bm = self._bm()
        with pytest.raises(oracle.ScoreOutOfRange):
            bm.score = 8
        bm.score = 7  # max for 3 properties

    def test_unknown_property(self):
        bm = self._bm()
        with pytest.raises(oracle.PropertyDoesNotExists):
            bm.set_property_score("nope")

    def test_max_phishing_score(self):
        bm = oracle.BitMap(oracle.PHISHING_BITMAP)
        bm.set_property_score(*oracle.PHISHING_BITMAP.keys())
        assert bm.score == 255
        # 7-property subset maxes at 127 (reference test_bitmap.py:180-192)
        bm2 = oracle.BitMap(oracle.PHISHING_BITMAP)
        props = [p for p in oracle.PHISHING_BITMAP if p != "mail_form"]
        bm2.set_property_score(*props)
        assert bm2.score == 127

    def test_expansion_msb_first(self):
        assert oracle.score_expanded(0b10000001) == ["mail_form", "mail_body"]
        assert oracle.score_expanded(123) == [
            "mail_subject",
            "mail_from",
            "filename_attachments",
            "urls_attachments",
            "urls_body",
            "mail_body",
        ]


class TestKeywords:
    # Ported from tests/test_utils.py:153-186
    def test_and_or_semantics(self):
        swt = oracle.search_words_in_text
        assert swt(TEXT, ["nomatch", "nomatch"]) is False
        assert swt(TEXT, ["nomatch", "nomatch", "theophrastus rationibus"]) is True
        assert swt(TEXT, ["nomatch", "theophrastus nomatch"]) is False
        assert swt(TEXT, ["theophrastus quo vidit"]) is True
        assert swt(TEXT, [12345678]) is True
        assert swt(TEXT, [11111, 44444]) is True

    def test_targets(self):
        tk = {"Google": ["gmail", "google drive"], "Test": ["payment", "hampton", "global"]}
        assert oracle.matched_targets("make the payment now", tk) == ["Test"]
        assert oracle.matched_targets("open google drive", tk) == ["Google"]
        assert oracle.matched_targets("google docs", tk) == []  # AND within line


URL_BODY = """
bla bla https://tweetdeck.twitter.com/random bla bla
http://kafka.apache.org/documentation.html
http://kafka.apache.org/documentation1.html
bla bla bla https://docs.python.org/2/library/re.html bla bla
bla bla bla https://docs.python.org/2/library/re_2.html> bla bla
<p>https://tweetdeck.twitter.com/random</p> bla bla
<p>https://tweetdeck.twitter.com/random_2</p>
"""

IDN_BODY = "Give satisfaction http://contents.xn--90afavbplfx2a6a5b2a.xn--p1ai/"


class TestUrls:
    # Ported from tests/test_utils.py:320-362
    def test_extract_counts_per_domain(self):
        urls = oracle.urls_extractor(URL_BODY)
        assert set(urls) == {"apache.org", "python.org", "twitter.com"}
        for d in urls:
            assert len(urls[d]) == 2

    def test_idn(self):
        urls = oracle.urls_extractor(IDN_BODY)
        assert "xn--90afavbplfx2a6a5b2a.xn--p1ai" in urls
        assert len(urls["xn--90afavbplfx2a6a5b2a.xn--p1ai"]) == 1

    def test_decompose(self):
        tok = oracle.decompose_url("https://drive.google.com/drive/my-drive")
        assert tok["domain"] == "google.com"
        assert tok["subdomain"] == "drive"
        assert tok["tld"] == "com"
        assert tok["scheme"] == "https"
        assert tok["resource_path"] == "/drive/my-drive"
        assert tok["query_string"] is None

    def test_whitelist_antifilter(self):
        # tests/test_utils.py:388-409: apache.org removed, others kept
        wl = {"google.com", "amazon.com", "facebook.com", "apache.org"}
        urls = [u for u in oracle.extract_urls(URL_BODY) if u["domain"] not in wl]
        domains = {u["domain"] for u in urls}
        assert "apache.org" not in domains
        assert {"python.org", "twitter.com"} <= domains


# Graft-equivalent of the mail_thug fixture: surfaces chosen to set bits
# {0,1,3,4,5,6} — score 123 (tests/test_phishing.py:108-126).
TARGETS = {
    "Google": ["gmail", "google drive"],
    "Amazon": ["amazon"],
    "Test": ["payment", "hampton", "global"],
}
SUBJECTS = ["conferma", "bonifico", "Fattura", "123456", "urgent"]
FORM_URLS = oracle.extract_urls(
    "visit http://secure-hampton.info/payment and https://evil.biz/x"
)


class TestPhishing:
    def test_golden_score_123(self):
        res = oracle.check_phishing(
            text="please schedule the payment, this is urgent",
            tool_text="regular output with no matches",
            tool_name="payment-gateway",
            author="hampton@global.example",
            urls_body=FORM_URLS,
            urls_tool=FORM_URLS,
            target_keys=TARGETS,
            subject_keys=SUBJECTS,
        )
        assert res["score"] == 123
        for prop in (
            "filename_attachments",
            "mail_subject",
            "mail_body",
            "mail_from",
            "urls_body",
            "urls_attachments",
        ):
            assert prop in res["score_expanded"]
        assert "Test" in res["targets"]
        assert res["with_phishing"] is True

    def test_form_bit(self):
        res = oracle.check_phishing(
            text='click <form action="http://x.example/a">here</form>',
            urls_body=FORM_URLS,
            target_keys=TARGETS,
            subject_keys=SUBJECTS,
        )
        assert "mail_form" in res["score_expanded"]
        assert oracle.check_form("no form here") is False

    def test_none_surfaces(self):
        res = oracle.check_phishing(target_keys=TARGETS, subject_keys=SUBJECTS)
        assert res["score"] == 0
        assert res["with_phishing"] is False


class TestFingerprints:
    def test_stable(self):
        a = oracle.fingerprints("payload")
        b = oracle.fingerprints(b"payload")
        assert a == b
        assert a[0] == "321c3cf486ed509164edec1e1981fec8"
        assert len(a[1]) == 40 and len(a[2]) == 64 and len(a[3]) == 128


class TestRuleScore:
    """Reference report-shape golden (tests/test_spamassassin.py:52-67
    asserts: report is a dict with float `score` and list `details` of
    {pts, rule name, description}; mail_thug scores 5.8 over 3 rules).
    Our deterministic rule table reproduces the shape exactly; the
    crafted text below fires exactly 3 rules for a known total."""

    def test_report_shape_and_golden_score(self):
        from spamscope_spark.functions.rulescore import report_py

        text = (
            "URGENT!! please send the payment now via "
            "http://phish.example/pay"
        )
        report = report_py(text)
        assert isinstance(report, dict)
        assert isinstance(report["score"], float)
        assert isinstance(report["details"], list)
        for d in report["details"]:
            assert set(d) == {"pts", "rule name", "description"}
        names = {d["rule name"] for d in report["details"]}
        # URI (0.5) + payment kw (2.5) + urgency (1.2) + punct (0.8)
        assert names == {"URI_PRESENT", "PAY_KEYWORDS", "URGENCY", "EXCESS_PUNCT"}
        assert report["score"] == 5.0

    def test_empty_text(self):
        from spamscope_spark.functions.rulescore import report_py

        r = report_py("")
        assert r["score"] == 0.5  # TINY_BODY only
        assert [d["rule name"] for d in r["details"]] == ["TINY_BODY"]

    def test_spark_matches_py(self, spark):
        import pyspark.sql.functions as F

        from spamscope_spark.functions.rulescore import (
            report_py,
            with_rule_score,
        )

        texts = [
            "URGENT!! please send the payment now",
            "hello",
            "a perfectly normal sentence about distributed query engines",
            "<form action='x'> verify your account immediately",
            "QUIT " + "QWxhZGRpbjpvcGVuIHNlc2FtZQ" * 3,
            None,
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        rows = with_rule_score(df, "text").select("id", "sa_score", "sa_details").collect()
        for r in rows:
            exp = report_py(texts[r["id"]] or "")
            assert r["sa_score"] == exp["score"], texts[r["id"]]
            assert [d["rule"] for d in r["sa_details"]] == [
                d["rule name"] for d in exp["details"]
            ]


class TestDialect:
    """Ported from the reference's tests/test_dialect.py:30-111: the
    SMTP session fixture must classify to the exact dialect list
    ["EHLO ", "MAIL FROM:", "RCPT TO:", "DATA", "QUIT"], duplicate and
    interleaved client commands must not change it, and the canonical
    string joins with single spaces."""

    MESSAGES = [
        ("server", "220 localhost ESMTP Postfix"),
        ("server", "250-ENHANCEDSTATUSCODES"),
        ("server", "250-localhost"),
        ("client", "EHLO vip.90.com"),
        ("server", "250-PIPELINING"),
        ("server", "250-SIZE 10240000"),
        ("server", "250-ETRN"),
        ("server", "250 DSN"),
        ("server", "250-8BITMIME"),
        ("server", "250-VRFY"),
        ("client", "MAIL FROM:<sywangwq@vip.90.com>"),
        ("server", "250 2.1.0 Ok"),
        ("client", "RCPT TO:<pramood48in@test_mail.net>"),
        ("server", "250 2.1.5 Ok"),
        ("server", "354 End data with <CR><LF>.<CR><LF>"),
        ("client", "DATA"),
        ("server", "250 2.0.0 Ok: queued as 319A8641319"),
        ("server", "221 2.0.0 Bye"),
        ("client", "QUIT"),
    ]

    def test_get_dialect(self):
        from spamscope_spark.functions.dialects import get_dialect

        assert get_dialect(self.MESSAGES) == [
            "EHLO ", "MAIL FROM:", "RCPT TO:", "DATA", "QUIT",
        ]

    def test_multiple_communications(self):
        """mixed/duplicated client commands (same phrasings) yield the
        identical dialect (test_dialect.py:54-85)."""
        from spamscope_spark.functions.dialects import get_dialect

        mixed = list(self.MESSAGES)
        mixed.insert(6, ("client", "EHLO mixed.90.com"))
        mixed.insert(9, ("client", "MAIL FROM:<test@vip.90.com>"))
        mixed.insert(14, ("client", "RCPT TO:<mixed@test_mail.net>"))
        mixed.append(("client", "DATA"))
        mixed.append(("client", "QUIT"))
        assert get_dialect(mixed) == get_dialect(self.MESSAGES)

    def test_get_dialect_str_and_fingerprints(self):
        import hashlib

        from spamscope_spark.functions.dialects import (
            get_dialect,
            get_dialect_str,
        )

        s = get_dialect_str(get_dialect(self.MESSAGES))
        assert s == "EHLO  MAIL FROM: RCPT TO: DATA QUIT"
        # fingerprint of the canonical string is stable
        assert hashlib.md5(s.encode()).hexdigest() == hashlib.md5(
            "EHLO  MAIL FROM: RCPT TO: DATA QUIT".encode()
        ).hexdigest()

    def test_spark_agg_matches_py(self, spark):
        """dialect_fingerprints on single-command rows reproduces the
        pure-Python classification (AGENT rules)."""
        from spamscope_spark.functions.dialects import (
            AGENT_DIALECT_RULES,
            dialect_fingerprints,
            get_dialect,
            get_dialect_str,
        )

        cmds = ["view_page", "click", "purchase", "error", "view_item", "noise"]
        df = spark.createDataFrame(
            [("u1", c) for c in cmds], "user_id string, cmd string"
        )
        row = dialect_fingerprints(df, "user_id", "cmd").collect()[0]
        exp = get_dialect_str(
            get_dialect([("client", c) for c in cmds], rules=AGENT_DIALECT_RULES)
        )
        assert row["dialect"] == exp
        import hashlib

        assert row["dialect_md5"] == hashlib.md5(exp.encode()).hexdigest()
