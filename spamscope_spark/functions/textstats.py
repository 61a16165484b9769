"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting (bottom-k shingle sketch).

All pure column expressions (JVM-side). Each builder has a DuckDB-SQL
twin (suffix `sql_`) generated from the same spec so the driver's
oracle comparison is exact by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Small characteristic-stopword sets per language (public common words;
# zh romanized since the corpus is ASCII).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "mit"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "que", "los", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "une"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(F.coalesce(text, F.lit(""))), F.lit(" "))


def presence_count(text: Column, words: list[str]) -> Column:
    """Number of `words` present as whitespace-delimited tokens in text."""
    p = _padded(text)
    total = F.lit(0)
    for w in words:
        total = total + F.when(F.instr(p, f" {w} ") > 0, 1).otherwise(0)
    return total


def sql_presence_count(text_expr: str, words: list[str]) -> str:
    p = f"(' ' || lower(coalesce({text_expr}, '')) || ' ')"
    terms = [
        f"(CASE WHEN instr({p}, ' {w} ') > 0 THEN 1 ELSE 0 END)" for w in words
    ]
    return "(" + " + ".join(terms) + ")"


def ws_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"))


def sql_ws_token_count(text_expr: str) -> str:
    return f"len(string_split_regex(trim(coalesce({text_expr}, '')), '\\s+'))"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_RE), 0))


def sql_bpe_ish_token_count(text_expr: str) -> str:
    return f"len(regexp_extract_all(coalesce({text_expr}, ''), '{BPE_ISH_RE}'))"


def lang_hits(text: Column) -> dict[str, Column]:
    return {lang: presence_count(text, ws) for lang, ws in sorted(STOPWORDS.items())}


def lang_guess(text: Column) -> Column:
    """argmax over per-language stopword hits; ties broken by language
    code ascending; all-zero → 'und'."""
    hits = lang_hits(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(STOPWORDS, reverse=True):
        h = hits[lang]
        cond = h >= F.greatest(best_hits, F.lit(1))
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(best_hits, h)
    return best_lang


def sql_lang_guess(text_expr: str) -> str:
    # Same fold, reverse-sorted languages, >= comparison → identical argmax.
    expr_lang = "'und'"
    expr_hits = "0"
    for lang in sorted(STOPWORDS, reverse=True):
        h = sql_presence_count(text_expr, STOPWORDS[lang])
        expr_lang = (
            f"(CASE WHEN {h} >= greatest({expr_hits}, 1) THEN '{lang}' "
            f"ELSE {expr_lang} END)"
        )
        expr_hits = f"greatest({expr_hits}, {h})"
    return expr_lang


def punct_count(text: Column) -> Column:
    return F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"[a-zA-Z0-9\s]", "")
    )


def sql_punct_count(text_expr: str) -> str:
    return (
        f"length(regexp_replace(coalesce({text_expr}, ''), '[a-zA-Z0-9\\s]', '', 'g'))"
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: token volume, low punctuation,
    stopword presence. Deterministic double math, same evaluation order
    as the SQL twin → bit-identical."""
    n_tok = ws_token_count(text).cast("double")
    n_chars = F.greatest(F.length(F.coalesce(text, F.lit(""))), F.lit(1)).cast("double")
    p_ratio = punct_count(text).cast("double") / n_chars
    stop = presence_count(text, STOPWORDS["en"]).cast("double")
    score = (
        F.lit(0.3) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), p_ratio * F.lit(4.0)))
        + F.lit(0.4) * F.least(F.lit(1.0), stop / F.lit(5.0))
    )
    # RAW double: the expression is mirrored op-for-op in the SQL twin,
    # so both engines hold the identical value — callers filter on it
    # directly and quantize outputs via exact.half_up_units (round(x,4)
    # was engine-ambiguous: these rationals CAN land on half grids)
    return score


def sql_quality_score(text_expr: str) -> str:
    n_tok = f"CAST({sql_ws_token_count(text_expr)} AS DOUBLE)"
    n_chars = f"CAST(greatest(length(coalesce({text_expr}, '')), 1) AS DOUBLE)"
    p_ratio = f"(CAST({sql_punct_count(text_expr)} AS DOUBLE) / {n_chars})"
    stop = f"CAST({sql_presence_count(text_expr, STOPWORDS['en'])} AS DOUBLE)"
    return (
        f"(0.3 * least(1.0, {n_tok} / 100.0)"
        f" + 0.3 * (1.0 - least(1.0, {p_ratio} * 4.0))"
        f" + 0.4 * least(1.0, {stop} / 5.0))"
    )


# ---------------------------------------------------------------------------
# hashed linear classifier (fastText-style model-based quality scoring)
# ---------------------------------------------------------------------------
#
# The scale shape of model-based quality filtering: token → hash bucket
# (hashing trick, vocabulary-free), bucket → weight via a D-row weight
# table BROADCAST to every executor, per-doc score = mean token weight.
# The weight table here is a deterministic stand-in derived from md5
# (production swaps in offline-trained weights with the same (bucket,
# w_int) contract). Weights are INTEGERS in [-1000, 1000] so the per-doc
# sum is exact under any partitioning / addition order — a double sum
# would hash-differ across engines and across runs on skewed partitions.

HASH_DIM = 256  # feature buckets; md5[0:4] hex → int % HASH_DIM
_W_SCALE = 1000  # w_int in [-_W_SCALE, _W_SCALE]; score = sum/(scale·n)


def hash_feature_weights(spark) -> "DataFrame":  # noqa: F821
    """The D-row weight 'model' as a DataFrame — broadcast-join side."""
    b = F.col("id").cast("int")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w:"), b.cast("string"))), 1, 6), 16, 10
    ).cast("bigint")
    return spark.range(HASH_DIM).select(
        b.alias("bucket"), (h % (2 * _W_SCALE + 1) - _W_SCALE).alias("w_int")
    )


def token_bucket(tok: Column) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int"), F.lit(HASH_DIM)
    )


def hashed_linear_scores(
    df: "DataFrame",  # noqa: F821
    weights: "DataFrame",  # noqa: F821
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.0,
) -> "DataFrame":  # noqa: F821
    """Per-doc linear score over hashed token features.

    Plan shape at 100 TB: tokenize+explode is partition-local; the
    weight join is a broadcast hash join (D rows ship once per
    executor); the only shuffle is the partial-aggregated groupBy on
    the doc id. Every token occurrence votes (bag-of-words, not set)."""
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
    )
    flat = df.select(F.col(id_col), F.explode(toks).alias("tok")).select(
        id_col, token_bucket(F.col("tok")).alias("bucket")
    )
    agg = (
        flat.join(F.broadcast(weights), on="bucket")
        .groupBy(id_col)
        .agg(F.sum("w_int").alias("w_sum"), F.count(F.lit(1)).alias("n_tok"))
    )
    score = F.col("w_sum").cast("double") / (
        F.lit(float(_W_SCALE)) * F.col("n_tok")
    )
    # Micro-unit BIGINT output, NOT round(x, 6): Spark's round goes
    # through Double.toString's shortest decimal repr while DuckDB
    # rounds the exact binary value, so a score whose shortest repr
    # lands exactly on the half boundary (e.g. 0.0654375 whose true
    # binary value is 0.06543749999...) rounds UP on Spark and DOWN on
    # DuckDB. floor(x * 1e6) is pure IEEE arithmetic on the identical
    # double (exact integer ratio) — no boundary ambiguity on any
    # engine. Same reasoning keeps `keep` a raw comparison.
    score_e6 = F.floor(score * F.lit(1e6)).cast("long")
    return agg.select(
        id_col,
        score_e6.alias("lm_quality_e6"),
        (score > F.lit(threshold)).alias("keep"),
    )


def sql_hashed_linear_scores(
    table: str, id_col: str, text_expr: str, threshold: float = 0.0
) -> str:
    """DuckDB twin — identical bucket/weight derivation, exact integer
    sum, same rounding."""
    toks = f"string_split_regex(trim(lower(coalesce({text_expr}, ''))), '\\s+')"
    return f"""
    WITH weights AS (
        SELECT CAST(range AS INTEGER) AS bucket,
               CAST('0x' || substr(md5('w:' || CAST(range AS VARCHAR)), 1, 6)
                    AS BIGINT) % {2 * _W_SCALE + 1} - {_W_SCALE} AS w_int
        FROM range({HASH_DIM})
    ), flat AS (
        SELECT {id_col},
               CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % {HASH_DIM} AS bucket
        FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
    ), agg AS (
        SELECT {id_col}, SUM(w_int) AS w_sum, COUNT(*) AS n_tok
        FROM flat JOIN weights USING (bucket)
        GROUP BY {id_col}
    )
    SELECT {id_col},
           CAST(floor(CAST(w_sum AS DOUBLE) / ({float(_W_SCALE)} * n_tok)
                * 1000000) AS BIGINT) AS lm_quality_e6,
           (CAST(w_sum AS DOUBLE) / ({float(_W_SCALE)} * n_tok)
            > {threshold}) AS keep
    FROM agg
    """


def doc_fingerprint(text: Column, shingle_words: int = 5, k: int = 4) -> Column:
    """Bottom-k sketch over word {shingle_words}-gram md5s — a compact,
    deterministic document fingerprint for near-dup triage."""
    toks = F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - (shingle_words - 1), F.lit(1)))
    hashes = F.transform(
        starts, lambda i: F.md5(F.array_join(F.slice(toks, i, shingle_words), " "))
    )
    return F.array_join(F.slice(F.array_sort(hashes), 1, k), "")


def sql_doc_fingerprint(text_expr: str, shingle_words: int = 5, k: int = 4) -> str:
    toks = f"string_split_regex(trim(lower(coalesce({text_expr}, ''))), '\\s+')"
    n = f"len({toks})"
    starts = f"range(1, greatest({n} - {shingle_words - 1}, 1) + 1)"
    hashes = (
        f"list_transform({starts}, i -> md5(array_to_string("
        f"list_slice({toks}, i, i + {shingle_words - 1}), ' ')))"
    )
    return f"array_to_string(list_slice(list_sort({hashes}), 1, {k}), '')"


def char_entropy(text: Column) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    garbage detector quality signals like Gopher/RefinedWeb pair with
    repetition stats: natural language sits ~3.5-4.5 bits/char,
    base64/hex blobs higher, single-char padding near 0. Null for
    empty/null text.

    Pure array expressions (codegen, no explode, no shuffle): distinct
    chars → per-char counts → -Σ p·log2(p), O(distinct·n) per row with
    distinct bounded by the alphabet."""
    chars = F.split(F.coalesce(text, F.lit("")), "")
    chars = F.filter(chars, lambda c: c != "")
    n = F.size(chars)
    counts = F.transform(
        F.array_distinct(chars),
        lambda c: F.size(F.filter(chars, lambda x: x == c)),
    )
    p = F.transform(counts, lambda cnt: cnt.cast("double") / n.cast("double"))
    ent = -F.aggregate(
        p,
        F.lit(0.0),
        lambda acc, x: acc + x * F.log2(x),
    )
    # RAW double (quantize at the output site via exact.half_up_units)
    return F.when(n > 0, ent)


def sql_char_entropy(text_expr: str) -> str:
    """DuckDB twin — identical distinct/count/Σ arithmetic and
    rounding."""
    chars = f"list_filter(string_split(coalesce({text_expr}, ''), ''), c -> c <> '')"
    return f"""
    CASE WHEN len({chars}) > 0 THEN
        -list_sum(list_transform(list_distinct({chars}),
            c -> (len(list_filter({chars}, x -> x = c))
                  / CAST(len({chars}) AS DOUBLE))
                 * log2(len(list_filter({chars}, x -> x = c))
                        / CAST(len({chars}) AS DOUBLE))))
    END
    """
