"""Text-analysis operators (north-star extension, SURVEY.md §2B "text
analysis"): language-ID heuristic, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions — these run as
narrow map work inside whole-stage codegen, which is exactly what a
100 TB corpus pass needs (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import md5_long

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Real corpora would use larger lists; the
# operator shape (set-overlap ratios + fixed-priority argmax) is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "que", "est"),
}

TOKEN_REGEX = r"[a-z]+|[0-9]+"  # BPE-ish: runs of letters or digits
PUNCT_REGEX = r"[,.!?;:]"


# Pre-tokenization corpus normalization (the C4/CCNet-style cleanup
# pass): lowercase, mask URLs/emails, strip control chars, collapse
# whitespace. Patterns are deliberately in the Java-regex/RE2 common
# subset so the Spark expression and the DuckDB oracle twin are the
# same strings.
URL_REGEX = r"https?://\S+"
EMAIL_REGEX = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
CONTROL_REGEX = r"[\x00-\x1f\x7f]"


def normalize_text(col: Column) -> Column:
    """Normalization pipeline as chained regexp_replace — one codegen'd
    narrow map at any scale. Masking runs on the lowered text; URLS
    first (they may embed '@'), then emails, control chars, whitespace."""
    t = F.lower(col)
    t = F.regexp_replace(t, URL_REGEX, " <url> ")
    t = F.regexp_replace(t, EMAIL_REGEX, " <email> ")
    t = F.regexp_replace(t, CONTROL_REGEX, " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def sql_normalize_text(expr: str) -> str:
    """DuckDB twin (regexp_replace needs the explicit 'g' flag there)."""
    t = "lower(" + expr + ")"
    t = "regexp_replace(" + t + ", 'https?://\\S+', ' <url> ', 'g')"
    t = "regexp_replace(" + t + ", '" + EMAIL_REGEX + "', ' <email> ', 'g')"
    t = "regexp_replace(" + t + ", '[\\x00-\\x1f\\x7f]', ' ', 'g')"
    t = "regexp_replace(" + t + ", '\\s+', ' ', 'g')"
    return "trim(" + t + ")"


def marker_ratio(distinct_toks: Column, lang: str) -> Column:
    """Fraction of the language's marker set present in the document."""
    markers = LANG_MARKERS[lang]
    overlap = F.size(F.array_intersect(distinct_toks, F.array(*[F.lit(m) for m in markers])))
    return overlap / F.lit(float(len(markers)))


def sql_marker_ratio(distinct_toks_expr: str, lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    n = len(LANG_MARKERS[lang])
    return f"len(list_intersect({distinct_toks_expr}, [{markers}])) / {n}.0"


def lang_id(distinct_toks: Column) -> Column:
    """Fixed-priority argmax over marker ratios (deterministic CASE
    chain; identical spelling on the oracle side). 'und' = undetermined."""
    scores = {lang: marker_ratio(distinct_toks, lang) for lang in LANG_MARKERS}
    # Reverse priority order so earlier languages win ties via >=.
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        others = [scores[o] for o in LANG_MARKERS if o != lang]
        cond = (scores[lang] > 0) & (F.greatest(*others) <= scores[lang])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def sql_lang_id(distinct_toks_expr: str) -> str:
    expr = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        mine = sql_marker_ratio(distinct_toks_expr, lang)
        others = ", ".join(
            sql_marker_ratio(distinct_toks_expr, o) for o in LANG_MARKERS if o != lang
        )
        expr = (
            f"CASE WHEN {mine} > 0 AND greatest({others}) <= {mine} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def rolling_fingerprint(toks: Column) -> Column:
    """Polynomial rolling hash over token hashes (order-sensitive doc
    fingerprint — unlike the bag-of-words md5, this distinguishes
    permutations). acc = (acc * 1000003 + h_tok mod p) mod p."""
    p = F.lit(1000000007)
    return F.aggregate(
        F.transform(toks, lambda t: F.pmod(md5_long(t), F.lit(1000000007))),
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(1000003) + h, p),
    )


def sql_rolling_fingerprint(toks_expr: str) -> str:
    h = (
        f"list_transform({toks_expr}, t -> "
        "(('0x' || substr(md5(t), 1, 15))::BIGINT) % 1000000007)"
    )
    return f"list_reduce(list_prepend(0::BIGINT, {h}), (acc, x) -> (acc * 1000003 + x) % 1000000007)"
