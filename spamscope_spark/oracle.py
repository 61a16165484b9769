"""Pure-Python oracle: reference-faithful row-level semantics.

These functions reproduce, bit-for-bit, the row-level behavior of the
reference's library API (the surface its own unit tests exercise — see
SURVEY.md §3.3). The pytest suite checks the Spark columns/udfs against
these, and these against the reference's golden fixture values.

Reference citations:
- keyword search:   /root/reference/src/modules/utils.py:191-210
- target matching:  /root/reference/src/modules/utils.py:175-188
- URL regex:        /root/reference/src/modules/utils.py:37-38
- URL decompose:    /root/reference/src/modules/utils.py:135-172 (Faup role)
- bitmap algebra:   /root/reference/src/modules/bitmap/bitmap.py:111-204
- phishing layout:  /root/reference/src/modules/bitmap/phishing_bitmap.py:30-39
- scorer:           /root/reference/src/modules/mails/phishing.py:81-163
"""

from __future__ import annotations

import hashlib
import re

# --------------------------------------------------------------------------
# Keyword search — (w1 AND w2) within a line, OR across lines.
# --------------------------------------------------------------------------


def search_words_in_text(text: str, keywords: list) -> bool:
    """True iff any keyword line has ALL its space-split words as
    lowercase substrings of text (utils.py:191-210)."""
    text = str(text).lower()
    lines = {str(k).lower() for k in keywords}
    for line in lines:
        if all(w in text for w in line.split()):
            return True
    return False


def matched_targets(text: str, target_keys: dict[str, list]) -> list[str]:
    """Sorted list of target names whose keyword list matches text
    (utils.py:175-188; sorted for determinism — the reference returns a
    Python set whose order is unspecified)."""
    return sorted(k for k, v in target_keys.items() if search_words_in_text(text, v))


# --------------------------------------------------------------------------
# Bitmap algebra (bitmap.py:111-204)
# --------------------------------------------------------------------------

PHISHING_BITMAP: dict[str, int] = {
    "mail_body": 0,
    "urls_body": 1,
    "text_attachments": 2,
    "urls_attachments": 3,
    "filename_attachments": 4,
    "mail_from": 5,
    "mail_subject": 6,
    "mail_form": 7,
}


class ScoreOutOfRange(ValueError):
    pass


class PropertyDoesNotExists(Exception):
    pass


class BitMap:
    """Re-derived bitmap algebra with the reference's exact semantics."""

    def __init__(self, bitmap: dict[str, int]):
        values = set(bitmap.values())
        if values - set(range(len(bitmap))):
            raise ValueError("BitMap not valid. Fill all the range")
        self._bitmap = dict(bitmap)
        self._score = 0

    @property
    def score(self) -> int:
        return self._score

    @score.setter
    def score(self, value: int) -> None:
        threshold = (1 << len(self._bitmap)) - 1
        if value > threshold:
            raise ScoreOutOfRange(f"score must be in [0, {threshold}]")
        self._score = value

    def _pos(self, prop: str) -> int:
        if prop not in self._bitmap:
            raise PropertyDoesNotExists(prop)
        return self._bitmap[prop]

    def set_property_score(self, *props: str) -> None:
        for p in props:
            self._score |= 1 << self._pos(p)

    def unset_property_score(self, *props: str) -> None:
        for p in props:
            self._score &= ~(1 << self._pos(p))

    def calculate_score(self, *props: str) -> int:
        score = 0
        for p in props:
            score |= 1 << self._pos(p)
        return score

    @property
    def score_properties(self) -> list[str]:
        """Set-bit property names, MSB → LSB (bitmap.py:192-204)."""
        by_pos = sorted(self._bitmap.items(), key=lambda kv: kv[1], reverse=True)
        return [k for k, v in by_pos if self._score & (1 << v)]


def score_expanded(score: int, bitmap: dict[str, int] | None = None) -> list[str]:
    bm = BitMap(bitmap or PHISHING_BITMAP)
    bm.score = score
    return bm.score_properties


# --------------------------------------------------------------------------
# URL extraction (utils.py:37-38,135-172)
# --------------------------------------------------------------------------

RE_URL = re.compile(
    r"((?:(?:ht|f)tp(?:s?)\:\/\/)(?:[!#$&-;=?-\[\]_a-z~]|%[0-9a-f]{2})+)",
    re.I,
)

# Minimal public-suffix set for 2nd-level-domain extraction (Faup role).
_TWO_LEVEL_SUFFIXES = {
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
}


def decompose_url(url: str) -> dict:
    """Faup-like decomposition (struct documented at utils.py:145-160)."""
    m = re.match(r"(?i)^([a-z]+)://([^/?#]*)([^?#]*)(?:\?([^#]*))?", url)
    if not m:
        return {
            "url": url, "scheme": None, "host": None, "domain": None,
            "subdomain": None, "tld": None, "resource_path": None,
            "query_string": None,
        }
    scheme, hostport, path, qs = m.groups()
    host = hostport.split("@")[-1].split(":")[0].lower()
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in _TWO_LEVEL_SUFFIXES:
        tld = ".".join(labels[-2:])
        domain_labels = labels[-3:]
    else:
        tld = labels[-1] if len(labels) > 1 else None
        domain_labels = labels[-2:] if len(labels) >= 2 else labels
    domain = ".".join(domain_labels)
    sub_count = len(labels) - len(domain_labels)
    subdomain = ".".join(labels[:sub_count]) if sub_count > 0 else None
    return {
        "url": url,
        "scheme": scheme.lower(),
        "host": host,
        "domain": domain,
        "subdomain": subdomain,
        "tld": tld,
        "resource_path": path or None,
        "query_string": qs or None,
    }


def urls_extractor(text: str) -> dict[str, list[dict]]:
    """Dict keyed by 2nd-level domain → list of decomposed URL structs,
    over the distinct regex matches (utils.py:161-172)."""
    results: dict[str, list[dict]] = {}
    for u in sorted({m.group().strip() for m in RE_URL.finditer(str(text))}):
        tok = decompose_url(u)
        if tok["domain"]:
            results.setdefault(tok["domain"], []).append(tok)
    return results


def extract_urls(text: str) -> list[dict]:
    """Flat sorted list of decomposed URL structs (reformat_urls analog,
    utils.py:476-492)."""
    out = []
    for _, lst in sorted(urls_extractor(text).items()):
        out.extend(lst)
    return out


# --------------------------------------------------------------------------
# Phishing scorer (phishing.py:81-163) — graft surfaces per FIXTURES.md §2:
#   mail_body             bit 0: targets matched in turn text
#   urls_body             bit 1: targets matched in any URL extracted from text
#   text_attachments      bit 2: targets matched in tool-output text surface
#   urls_attachments      bit 3: targets matched in URLs of the tool surface
#   filename_attachments  bit 4: targets matched in the tool name surface
#   mail_from             bit 5: targets matched in the role/author surface
#   mail_subject          bit 6: subject keywords in text
#   mail_form             bit 7: HTML <form in text
# --------------------------------------------------------------------------

RE_FORM = re.compile(r"(?i)<form[\s>]")


def check_form(text: str) -> bool:
    """HTML form sniff — regex stand-in for the reference's lxml
    //form XPath (phishing.py:35-59); semantics verified by the
    mail_form golden test."""
    return bool(RE_FORM.search(str(text or "")))


def check_urls_keywords(urls: list[dict], keywords: list) -> bool:
    """Any keyword line matches any URL string (phishing.py:62-78)."""
    return any(search_words_in_text(u["url"], keywords) for u in urls)


def check_phishing(
    *,
    text: str = "",
    tool_text: str = "",
    tool_name: str = "",
    author: str = "",
    urls_body: list[dict] | None = None,
    urls_tool: list[dict] | None = None,
    target_keys: dict[str, list] | None = None,
    subject_keys: list | None = None,
) -> dict:
    """Graft recast of check_phishing (phishing.py:81-163): same bitmap,
    same scoring structure, conversation-turn surfaces."""
    target_keys = target_keys or {}
    subject_keys = subject_keys or []
    urls_body = urls_body or []
    urls_tool = urls_tool or []
    bm = BitMap(PHISHING_BITMAP)
    targets: set[str] = set()
    with_urls = False

    mapping_targets = (
        (text, "mail_body"),
        (author, "mail_from"),
        (tool_text, "text_attachments"),
        (tool_name, "filename_attachments"),
    )
    for surface, prop in mapping_targets:
        if surface:
            t = set(matched_targets(surface, target_keys))
            if t:
                targets |= t
                bm.set_property_score(prop)

    for url_list, prop in ((urls_body, "urls_body"), (urls_tool, "urls_attachments")):
        if url_list:
            with_urls = True
            if any(check_urls_keywords(url_list, kws) for kws in target_keys.values()):
                bm.set_property_score(prop)

    if search_words_in_text(text, subject_keys):
        bm.set_property_score("mail_subject")

    if check_form(text):
        bm.set_property_score("mail_form")

    return {
        "score": bm.score,
        "score_expanded": bm.score_properties,
        "targets": sorted(targets),
        "with_phishing": bool(bm.score and with_urls),
    }


# --------------------------------------------------------------------------
# Fingerprints (attachments/utils.py:44-86)
# --------------------------------------------------------------------------


def fingerprints(data: str | bytes) -> tuple[str, str, str, str]:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return (
        hashlib.md5(data).hexdigest(),
        hashlib.sha1(data).hexdigest(),
        hashlib.sha256(data).hexdigest(),
        hashlib.sha512(data).hexdigest(),
    )
