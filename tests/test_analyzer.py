"""Analyzer golden tests mirroring the reference's
``index_test.go`` style (SURVEY §5a): exact expected term lists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neosearch_spark.analyzer import analyze_query, terms_col, tokens_col, doc_len_col
from neosearch_spark.oracle import index_terms, tokenize


def spark_terms(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(terms_col(F.col("t")).alias("x")).collect()[0]["x"]


def spark_tokens(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(tokens_col(F.col("t")).alias("x")).collect()[0]["x"]


GOLDEN = {
    # whole-string term appended for multi-token values
    # (reference index.go:546-553, neosearch_test.go:239-250)
    "Neoway Business Solution": ["neoway", "business", "solution", "neoway business solution"],
    # punctuation token kept (index_test.go:197-204)
    "hyphen - token": ["hyphen", "-", "token", "hyphen - token"],
    # single token: no whole-string duplicate
    "singletoken": ["singletoken"],
    # trim only outer spaces; empty tokens from internal runs kept
    "  spaced   out  ": ["spaced", "", "", "out", "spaced   out"],
    # unicode values NOT slugified (index_object_test.go:74-79)
    "Florianópolis": ["florianópolis"],
}


def test_golden_terms(spark):
    for text, want in GOLDEN.items():
        assert spark_terms(spark, text) == want, text


def test_python_twin_matches_spark(spark):
    texts = list(GOLDEN) + ["a", "", " ", "A  B C ", "x-y z"]
    for t in texts:
        assert spark_tokens(spark, t) == tokenize(t), t
        assert spark_terms(spark, t) == index_terms(t), t


def test_doc_len_counts_split_tokens(spark):
    df = spark.createDataFrame([("a  b c",)], "t string")
    # tokens: [a, '', b, c] -> dl 4 (empties count; whole-string term doesn't)
    assert df.select(doc_len_col(F.col("t")).alias("d")).collect()[0]["d"] == 4


def test_analyze_query_drops_empties():
    assert analyze_query("  Hello   World ") == ["hello", "world"]
    assert analyze_query("   ") == []


def test_random_string_parity_spark_vs_python_twin(spark):
    """Seeded random sweep (one Spark job for the whole batch): the
    JVM-expression analyzer and the pure-Python twin must agree on
    tokens, index terms, and doc length for arbitrary strings —
    including tabs, newlines, unicode whitespace/letters, control
    chars, quotes, and long multi-space runs, none of which the
    golden set can enumerate.  Divergence here means Spark's
    trim/lower/split semantics drifted from Go's strings.TrimSpace-
    free model (the reference trims ONLY 0x20, keeps empties)."""
    import random

    rng = random.Random(20260819)
    alphabet = (
        "ab YZ09._-'\"\\$;()"
        " \t\n\r\x0b  "   # ws zoo: only 0x20 is a separator
        "éÓß中日́\x00\x1f"     # unicode letters, combining, control
    )
    samples = ["", " ", "  ", "\t", " ", "a", " a ", "a  b"]
    for _ in range(400):
        n = rng.randint(0, 24)
        samples.append("".join(rng.choice(alphabet) for _ in range(n)))

    from neosearch_spark.analyzer import doc_len_col, terms_col, tokens_col
    from neosearch_spark.oracle import index_terms, tokenize

    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            tokens_col(F.col("t")).alias("toks"),
            terms_col(F.col("t")).alias("terms"),
            doc_len_col(F.col("t")).alias("dl"),
        ).collect()
    }
    for i, s in enumerate(samples):
        want_toks = tokenize(s)
        assert rows[i]["toks"] == want_toks, repr(s)
        assert rows[i]["terms"] == index_terms(s), repr(s)
        assert rows[i]["dl"] == len(want_toks), repr(s)
