"""Text analysis operators: quality scoring, token counting,
language ID heuristic, document fingerprinting.

All built-in-function expressions (codegen'd); deterministic and
DuckDB-expressible so every operator carries an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import norm_col, tokens_col

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (deterministic, pure-SQL-expressible)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
}


def quality_stats(docs: DataFrame, field: str = "text", round_to: int = 6) -> DataFrame:
    """Per-doc quality features: token count, distinct tokens,
    type-token ratio, mean token length, stopword ratio, punctuation
    char ratio, plus a composite quality score in [0,1]."""
    toks = tokens_col(F.col(field))
    nonempty = F.filter(toks, lambda t: t != "")
    n_tok = F.size(nonempty).cast("long")
    n_dist = F.size(F.array_distinct(nonempty)).cast("long")
    total_len = F.aggregate(
        nonempty, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    norm = norm_col(F.col(field))
    n_chars = F.length(norm)
    n_punct = n_chars - F.length(F.regexp_replace(norm, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(nonempty, lambda t: F.array_contains(stop_arr, t))).cast(
        "long"
    )
    ttr = F.when(n_tok > 0, n_dist.cast("double") / n_tok).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    mean_len = F.when(n_tok > 0, total_len.cast("double") / n_tok).otherwise(0.0)
    # composite: favors lexical diversity, penalizes punctuation soup
    quality = ttr * (1.0 - punct_ratio)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dist.alias("n_distinct"),
        F.round(ttr, round_to).alias("ttr"),
        F.round(mean_len, round_to).alias("mean_token_len"),
        F.round(stop_ratio, round_to).alias("stopword_ratio"),
        F.round(punct_ratio, round_to).alias("punct_ratio"),
        F.round(quality, round_to).alias("quality"),
    )


def token_counts(docs: DataFrame, field: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword-boundary count
    (split on transitions via regex: runs of letters / digits /
    single other chars — a cheap proxy for BPE token budget)."""
    ws = F.size(F.filter(tokens_col(F.col(field)), lambda t: t != "")).cast("long")
    pieces = F.regexp_extract_all(
        norm_col(F.col(field)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        F.size(pieces).cast("long").alias("bpe_ish_tokens"),
    )


def lang_id(docs: DataFrame, field: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: score per language =
    marker hits in the token set; argmax with fixed language order
    tie-break ('und' if no hits)."""
    toks = F.array_distinct(tokens_col(F.col(field)))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            (lang, F.size(F.array_intersect(toks, arr)).cast("long"))
        )
    pred = F.lit("und")
    best = F.lit(0).cast("long")
    # iterate reversed so earlier languages win ties
    for lang, sc in reversed(scores):
        pred = F.when(sc >= F.greatest(best, F.lit(1).cast("long")), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, sc)
    cols = [sc.alias(f"score_{lang}") for lang, sc in scores]
    return docs.select("doc_id", *cols, pred.alias("pred_lang"))


def fingerprints(docs: DataFrame, field: str = "text") -> DataFrame:
    """Stable document fingerprints: full-text md5 plus a
    word-order-insensitive content fingerprint (md5 of the sorted
    distinct token list) — catches shuffled near-dups."""
    norm = norm_col(F.col(field))
    sorted_toks = F.array_join(
        F.array_sort(F.array_distinct(F.filter(tokens_col(F.col(field)), lambda t: t != ""))),
        " ",
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("text_md5"),
        F.md5(sorted_toks).alias("content_md5"),
    )
