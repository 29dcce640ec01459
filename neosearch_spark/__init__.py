"""neosearch_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new distributed engine with the query/data-processing
capabilities of NeowayLabs/neosearch (reference at /root/reference,
Go; see SURVEY.md), re-expressed Spark-first:

- the reference's per-field KV posting databases
  (``lib/neosearch/store/utils.go:39-93`` MergeSet) become
  term-partitioned, docID-sorted, delta+varint-compressed posting
  *block* tables built with one range-partitioned shuffle;
- its boolean posting algebra (``lib/neosearch/search/search.go``)
  becomes DataFrame set ops / joins;
- BM25 top-k with block-max pruning (absent in the reference — the
  north-star addition) runs over the block table with per-block
  max-score metadata.

Everything is DataFrame/SQL + vectorized Arrow UDFs; no per-row
Python anywhere.
"""

__version__ = "0.1.0"
