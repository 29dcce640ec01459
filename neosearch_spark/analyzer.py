"""Text analyzer with exact reference parity, expressed JVM-side.

The reference analyzer (``/root/reference/lib/neosearch/index/index.go:510-554``)
is: trim spaces -> lowercase -> split on a SINGLE space character
(not ``\\s+``; empty tokens from multi-space runs are kept, and
punctuation-only tokens like ``-`` are real terms — golden test
``index_test.go:197-204``).  Additionally, when a value has more than
one token, the WHOLE normalized string is indexed as one extra term
(``index.go:546-553``) so exact-phrase lookup of the full value works
(``neosearch_test.go:239-250``).

We express this entirely with built-in ``pyspark.sql.functions``
(whole-stage-codegen'd, no Python in the hot path at all — strictly
better than the Arrow-UDF floor required by the input hint).  The
pure-Python twin used by the test oracle lives in ``oracle.py`` and
must stay behaviorally identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def norm_col(c: Column) -> Column:
    """trim(spaces) + lowercase — the normalized string."""
    return F.lower(F.trim(c))


def tokens_col(c: Column) -> Column:
    """array<string> of tokens: split normalized text on single space.

    Keeps empty tokens from internal multi-space runs (reference
    parity: Go strings.Split keeps them). split() with limit=-1 keeps
    trailing empties too, but trim removes outer spaces first.
    """
    return F.split(norm_col(c), " ", -1)


def terms_col(c: Column) -> Column:
    """All index terms for a text value: tokens plus the whole
    normalized string when it has >1 token (reference
    ``index.go:546-553``)."""
    toks = tokens_col(c)
    whole = norm_col(c)
    return F.when(F.size(toks) > 1, F.array_append(toks, whole)).otherwise(toks)


def doc_len_col(c: Column) -> Column:
    """BM25 document length: number of split tokens (empties count,
    whole-string term does not)."""
    return F.size(tokens_col(c))


def analyze_query(text: str) -> list[str]:
    """Analyze query text driver-side (tiny, pure Python) with the
    same semantics as the column analyzer; empty tokens dropped for
    scoring (an empty query term matches nothing meaningful).

    The reference does NOT analyze query terms (tests always pass
    lowercase, ``neosearch_test.go:239``); applying the same analyzer
    at query time makes behavior casing-independent — recorded
    divergence, SURVEY §2.11.4.
    """
    norm = text.strip(" ").lower()
    return [t for t in norm.split(" ") if t != ""]
