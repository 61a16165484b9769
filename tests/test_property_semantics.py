"""Property-based tests (hypothesis) for the row-level semantics the
engine must hold for ANY input, not just the golden fixtures:

- keyword AND-within-line / OR-across-lines (reference
  src/modules/utils.py:191-210) — the Python oracle is the spec; a
  brute-force reimplementation must agree on arbitrary text/keywords.
- bitmap score algebra (reference src/modules/bitmap/bitmap.py:111-137)
  — score == sum of distinct set bits, expansion is MSB-first and
  round-trips.
- URL extraction — every extracted URL is a substring of the input and
  starts with a known scheme; extraction is idempotent on its output.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from spamscope_spark.oracle import (
    PHISHING_BITMAP,
    BitMap,
    extract_urls,
    score_expanded,
    search_words_in_text,
)

WORDS = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=8)
LINES = st.lists(
    st.lists(WORDS, min_size=1, max_size=3).map(" ".join), min_size=1, max_size=5
)
TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .:/?#-_\n",
    min_size=0,
    max_size=400,
)


class TestKeywordSemantics:
    @given(text=TEXT, lines=LINES)
    @settings(max_examples=300, deadline=None)
    def test_matches_bruteforce_spec(self, text, lines):
        lowered = text.lower()
        expected = any(
            all(w in lowered for w in str(line).lower().split()) for line in lines
        )
        assert search_words_in_text(text, lines) == expected

    @given(text=TEXT, lines=LINES)
    @settings(max_examples=100, deadline=None)
    def test_case_insensitive(self, text, lines):
        assert search_words_in_text(text, lines) == search_words_in_text(
            text.upper(), [str(li).lower() for li in lines]
        )

    @given(text=TEXT, a=LINES, b=LINES)
    @settings(max_examples=100, deadline=None)
    def test_or_across_lists(self, text, a, b):
        # OR-of-lines: the union matches iff either list matches
        assert search_words_in_text(text, a + b) == (
            search_words_in_text(text, a) or search_words_in_text(text, b)
        )


PROPS = sorted(PHISHING_BITMAP)


class TestBitmapAlgebra:
    @given(props=st.sets(st.sampled_from(PROPS)))
    @settings(max_examples=200, deadline=None)
    def test_score_is_sum_of_distinct_bits(self, props):
        bm = BitMap(PHISHING_BITMAP)
        if props:
            bm.set_property_score(*props)
        assert bm.score == sum(1 << PHISHING_BITMAP[p] for p in props)

    @given(props=st.sets(st.sampled_from(PROPS)))
    @settings(max_examples=200, deadline=None)
    def test_expansion_roundtrip_msb_first(self, props):
        score = sum(1 << PHISHING_BITMAP[p] for p in props)
        exp = score_expanded(score)
        assert set(exp) == props
        positions = [PHISHING_BITMAP[p] for p in exp]
        assert positions == sorted(positions, reverse=True)  # MSB → LSB

    @given(props=st.sets(st.sampled_from(PROPS), min_size=1))
    @settings(max_examples=100, deadline=None)
    def test_set_unset_inverse(self, props):
        bm = BitMap(PHISHING_BITMAP)
        bm.set_property_score(*props)
        bm.unset_property_score(*props)
        assert bm.score == 0

    @given(props=st.sets(st.sampled_from(PROPS)))
    @settings(max_examples=100, deadline=None)
    def test_set_idempotent(self, props):
        bm = BitMap(PHISHING_BITMAP)
        for _ in range(2):
            if props:
                bm.set_property_score(*props)
        assert bm.score == sum(1 << PHISHING_BITMAP[p] for p in props)


class TestUrlExtraction:
    @given(text=TEXT)
    @settings(max_examples=300, deadline=None)
    def test_urls_are_substrings_with_scheme(self, text):
        for u in extract_urls(text):
            assert u["url"] in text
            assert u["url"].split("://")[0].lower() in ("http", "https", "ftp", "ftps")

    @given(
        hosts=st.lists(
            st.from_regex(r"[a-z]{1,8}\.(com|org|io)", fullmatch=True),
            min_size=1,
            max_size=4,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_planted_urls_found(self, hosts):
        text = " see ".join(f"http://{h}/x" for h in hosts)
        got = {u["url"] for u in extract_urls(text)}
        assert got == {f"http://{h}/x" for h in hosts}


class TestMediaCodecRoundtrip:
    """The codec parsers are pure functions — ideal hypothesis targets
    (no Spark session per example)."""

    @given(
        n=st.integers(1, 40),
        ch=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_exact(self, n, ch, rate, seed):
        import numpy as np

        from spamscope_spark.operators.multimodal import decode_wav, encode_wav

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int64).astype("<i2")
        m = decode_wav(encode_wav(s, rate))
        assert (m["n_frames"], m["n_channels"], m["sample_rate"]) == (n, ch, rate)
        assert m["mean_ch0"] == s[:, 0].astype(np.float64).mean()

    @given(
        n=st.integers(1, 5),
        w=st.integers(1, 16),
        h=st.integers(1, 12),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=60, deadline=None)
    def test_y4m_roundtrip_exact(self, n, w, h, seed):
        import numpy as np

        from spamscope_spark.operators.multimodal import decode_y4m, encode_y4m

        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, size=(n, h, w), dtype=np.int64).astype(np.uint8)
        m = decode_y4m(encode_y4m(frames))
        assert (m["n_frames"], m["width"], m["height"]) == (n, w, h)
        assert m["mean_luma_f0"] == frames[0].astype(np.float64).mean()
