"""Text analysis over the ``documents`` table — language-ID, quality
scoring, token counting, document fingerprinting.

The reference has no text-quality layer (its parse stages project raw
strings, reference spiders/amazon/crawl_goods_list.py:57-91); these are
the standard training-data-pipeline additions. Everything is a native
Column expression (whole-stage codegen, zero Python), and every output
is integer/string-typed so the DuckDB oracle matches bit-for-bit:
ratios are floor-quantized to basis points (1/10000) instead of floats.

Scale notes (100 TB of documents):
- All operators here are per-row projections — no shuffle at all; they
  pipeline into whatever scan/write surrounds them and scale linearly
  with executors.
- ``split`` + array ops stay inside codegen; the only cost is the body
  bytes already being read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Language marker stopwords for the n-gram-free heuristic language ID.
# Order matters: ties break toward the earlier language (deterministic).
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "of", "and", "to", "is")),
    ("es", ("el", "la", "de", "los", "las", "es")),
    ("fr", ("le", "la", "les", "et", "des", "est")),
    ("de", ("der", "die", "das", "und", "ist", "ein")),
]

STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for _, ws in LANG_MARKERS for w in ws})
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization — the shared token definition for every
    text operator (engine AND oracle)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: whitespace tokens + one extra piece per
    NON-OVERLAPPING letter-digit (or digit-letter) pair — a cheap BPE
    stand-in. Matches are non-overlapping by regexp_extract_all
    semantics, so 'a1b2' counts 2 pairs (a1, b2), not 3 transitions;
    a true transition count needs lookaround, which RE2 (the DuckDB
    oracle's engine) does not support — this definition is the one
    that mirrors exactly on both engines."""
    transitions = F.size(
        F.regexp_extract_all(text, F.lit(r"[a-zA-Z][0-9]|[0-9][a-zA-Z]"), F.lit(0))
    )
    return (token_count(text) + transitions).cast("long")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-score components, all integers (bp = basis points).

    floor(x * 10000 / y) is computed in double then floored — both
    engines evaluate the identical double expression, so the floor is
    identical.
    """
    toks = tokens(text)
    n_tok = token_count(text)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    punct_chars = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    stop = _count_in(toks, STOPWORDS)
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_tokens": n_tok.cast("long"),
        "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "alpha_bp": F.floor(alpha_chars * 10000.0 / safe_chars).cast("long"),
        "punct_bp": F.floor(punct_chars * 10000.0 / safe_chars).cast("long"),
        "stopword_bp": F.floor(stop * 10000.0 / safe_tok).cast("long"),
        "mean_token_len_bp": F.floor(
            (n_chars - n_tok + 1) * 10000.0 / safe_tok
        ).cast("long"),
    }


def quality_score(cols: dict[str, Column]) -> Column:
    """0-100 composite: length band + stopword presence + distinct ratio.
    Pure integer arithmetic (portable)."""
    length_pts = F.least(cols["n_tokens"], F.lit(40))
    stop_pts = F.least(cols["stopword_bp"] / 100, F.lit(30)).cast("long")
    distinct_bp = F.floor(
        cols["n_distinct_tokens"]
        * 10000.0
        / F.greatest(cols["n_tokens"], F.lit(1))
    )
    distinct_pts = F.least(distinct_bp / 200, F.lit(30)).cast("long")
    return (length_pts + stop_pts + distinct_pts).cast("long")


def langid_guess(text: Column) -> Column:
    """Marker-stopword language vote; ties break by LANG_MARKERS order;
    zero hits → 'und' (undetermined)."""
    toks = tokens(text)
    counts = {lang: _count_in(toks, ws) for lang, ws in LANG_MARKERS}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # build the CASE from last to first so earlier langs win ties
    for lang, _ in reversed(LANG_MARKERS):
        out = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed
    text — the exact-dedup key (rolling-hash analogue, portable)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def analyze(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document text profile (projection only — no shuffle)."""
    text = F.col(text_col)
    q = quality_columns(text)
    return docs.select(
        "doc_id",
        *[c.alias(n) for n, c in q.items()],
        quality_score(q).alias("quality"),
        langid_guess(text).alias("lang_guess"),
        fingerprint(text).alias("fp"),
    )
