"""Schema-driven field inference (``IndexBuilder(infer=True)``) —
the declared-schema analog of the reference's reflection dispatch
that indexes ANY JSON document without a field list
(``lib/neosearch/index/index.go:355-480``; goldens mirror
``index_test.go:78-248``: strings analyzed into ``_string.idx``,
numbers into ``_float.idx`` as typed keys, nested objects under
dotted paths, array elements individually)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from neosearch_spark.build import IndexBuilder, infer_fields
from neosearch_spark.query import SparkIndex

ROWS = [
    # (doc_id, title, description, score, active, n, created, meta(author, stars), tags)
    (
        1,
        "NeoSearch - Reverse Index",
        "Neoway Full Text Search",
        1.5,
        True,
        10,
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        ("ana", 3),
        ["go", "search"],
    ),
    (
        2,
        "Google Inc.",
        "Search company",
        2.5,
        False,
        20,
        datetime.datetime(2024, 6, 1, 12, 0, 0),
        ("bob", 5),
        ["ads"],
    ),
    (
        3,
        "Neoway Teste",
        "Neoway Business Solution",
        1.5,
        True,
        10,
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        ("ana", 3),
        [],
    ),
]
SCHEMA = (
    "doc_id long, title string, description string, score double, "
    "active boolean, n int, created timestamp, "
    "meta struct<author:string, stars:int>, tags array<string>"
)


def test_infer_fields_mapping(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    inf = infer_fields(docs.schema)
    # strings (incl. struct-nested dotted path + array<string>) analyzed
    # scalar strings (incl. dotted struct paths) take the primary
    # slots; array<string> fields sort after (r5: an array primary
    # would measure BM25 doc length over joined elements — legal but
    # not the natural choice when a scalar string exists)
    assert inf["analyzed_fields"] == ["description", "meta.author", "title", "tags"]
    # typed top-level columns exact with their cast kind; doc_id skipped
    assert inf["exact_fields"] == ["score", "active", "n", "created"]
    assert inf["typed_fields"] == {
        "score": "numeric",
        "active": "bool",
        "n": "numeric",
        "created": "timestamp",
    }
    # nested non-string (meta.stars) not indexed
    assert "meta.stars" not in inf["analyzed_fields"] + inf["exact_fields"]


def test_infer_prefers_text_as_primary(spark):
    docs = spark.createDataFrame([(1, "a", "b")], "doc_id long, zz string, text string")
    inf = infer_fields(docs.schema)
    assert inf["analyzed_fields"][0] == "text"


def test_infer_requires_a_string_column(spark):
    docs = spark.createDataFrame([(1, 2)], "doc_id long, n long")
    with pytest.raises(ValueError, match="no string column"):
        infer_fields(docs.schema)


@pytest.fixture(scope="module")
def inferred_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("infer_idx"))
    docs = spark.createDataFrame(ROWS, SCHEMA)
    IndexBuilder(d, infer=True, span=4).build(docs)
    return SparkIndex(spark, d)


def test_inferred_build_golden(spark, inferred_idx):
    idx = inferred_idx
    # analyzed string field — index_test.go:144-204 ('neoway' in
    # description of docs 1 and 3)
    assert [
        r["doc_id"] for r in idx.term_docs("neoway", field="description").collect()
    ] == [1, 3]
    # field-scoped analyzed lookup
    assert [r["doc_id"] for r in idx.term_docs("google", field="title").collect()] == [2]
    # whole-string extra term (index.go:546-553) still applies
    assert [r["doc_id"] for r in idx.term_docs("neoway teste", field="title").collect()] == [3]
    # nested struct dotted path (index.go:455-468)
    assert [r["doc_id"] for r in idx.term_docs("ana", field="meta.author").collect()] == [1, 3]
    # array elements individually indexed (index.go:483-508)
    assert [r["doc_id"] for r in idx.term_docs("search", field="tags").collect()] == [1]
    # numeric column → exact term by canonical string (the
    # _float.idx / _int.idx analog, index_test.go:100-120)
    assert [r["doc_id"] for r in idx.term_docs("1.5", field="score").collect()] == [1, 3]
    assert [r["doc_id"] for r in idx.term_docs("20", field="n").collect()] == [2]
    # bool column (index.go:419-432)
    assert [r["doc_id"] for r in idx.term_docs("true", field="active").collect()] == [1, 3]
    # timestamp column → epoch-micros term (index.go:556-574)
    micros = int(datetime.datetime(2024, 6, 1, 12, 0, 0).timestamp() * 1_000_000)
    assert [r["doc_id"] for r in idx.term_docs(str(micros), field="created").collect()] == [2]


def test_inferred_doc_store_keeps_typed_columns(spark, inferred_idx):
    """The doc store keeps the ORIGINAL typed columns (reference
    document.db stores the raw JSON) — only the index terms are
    cast."""
    row = inferred_idx.docs.where(F.col("doc_id") == 2).collect()[0]
    assert row["score"] == 2.5 and row["active"] is False and row["n"] == 20
    assert row["created"] == datetime.datetime(2024, 6, 1, 12, 0, 0)
    assert row["meta"]["stars"] == 5
