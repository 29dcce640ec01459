"""End-to-end rank-identity vs the pure-Python oracle over a
synthetic corpus (SURVEY §5c, FIXTURES F5), incl. WAND-pruning
losslessness and the per-turn text-equality invariant."""

from __future__ import annotations

import pytest

from neosearch_spark import fts
from neosearch_spark.build import IndexBuilder
from neosearch_spark.docids import assign_doc_ids
from neosearch_spark.oracle import OracleIndex
from neosearch_spark.query import SparkIndex
from neosearch_spark.synth import synth_transcripts

N_TURNS = 600

QUERIES = [
    "tok1 tok3 tok17",
    "neoway business solution",
    "tok2 tok2 tok5",  # adjacent duplicate query term
    "tok2 tok5 tok9 tok2",  # NON-adjacent duplicate: accumulation
    # order must still be per-occurrence in query order on every path
    "tok1",
    "missingterm tok4",
    "MiXeD case tok9",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    docs = assign_doc_ids(synth_transcripts(spark, N_TURNS, seed=11))
    d = str(tmp_path_factory.mktemp("oracle_idx"))
    IndexBuilder(d, span=128).build(docs)
    rows = docs.select("doc_id", "text").collect()
    oi = OracleIndex({r["doc_id"]: r["text"] for r in rows})
    return SparkIndex(spark, d), oi, docs


def test_boolean_vs_oracle(corpus):
    si, oi, _ = corpus
    assert [r["doc_id"] for r in si.term_docs("tok1").collect()] == oi.term("tok1")
    assert [r["doc_id"] for r in si.and_docs(["tok1", "tok2"]).collect()] == oi.and_(["tok1", "tok2"])
    assert [r["doc_id"] for r in si.or_docs(["neoway", "google"]).collect()] == oi.or_(["neoway", "google"])
    assert [r["doc_id"] for r in si.prefix_docs("tok10").collect()] == oi.prefix("tok10")
    assert [r["doc_id"] for r in si.not_docs(["tok1"], ["tok2"]).collect()] == oi.not_(["tok1"], ["tok2"])


def test_fuzzy_docs_index_equals_direct_and_bounds(corpus):
    """Index-path fuzzy match (vocabulary expansion + posting union)
    ≡ the direct row-local scan on the same corpus; empty expansion
    returns an empty frame with the doc_id schema; the max_terms cap
    errors loudly instead of collecting an unbounded expansion."""
    si, _, docs = corpus
    for term, dist in [("tok1", 1), ("tok42", 1), ("neoway", 2)]:
        got_idx = [r["doc_id"]
                   for r in si.fuzzy_docs(term, max_dist=dist).collect()]
        got_direct = [r["doc_id"]
                      for r in fts.fuzzy_docs(docs, term, max_dist=dist).collect()]
        assert got_idx == got_direct, (term, dist)
        # fuzzy must be a superset of exact
        exact = {r["doc_id"] for r in si.term_docs(term).collect()}
        assert exact <= set(got_idx), (term, dist)
    assert si.fuzzy_docs("zzqqxx", max_dist=1).count() == 0
    with pytest.raises(RuntimeError, match="fuzzy expansion"):
        si.fuzzy_docs("tok1", max_dist=2, max_terms=1)


def test_phrase_docs_index_equals_direct(corpus):
    """Index-path phrase match (AND pre-filter + stored-text
    adjacency confirm) ≡ the direct normalized-substring scan, on
    phrases covering: whole-value, inside-value, wrong-order (AND
    hits, phrase must not), mixed case, multi-space runs (adjacency
    includes empty tokens), punctuation tokens, and single-token."""
    si, _, docs = corpus
    phrases = [
        "neoway business solution",  # whole value (edge text)
        "business solution",         # inside a longer value
        "solution business",         # AND matches, adjacency must not
        "Neoway BUSINESS",           # query-side normalization
        "spaced   out",              # multi-space run must align
        "spaced out",                # single space ≠ the 3-space run
        "- token",                   # punctuation-only token
        "tok1 tok2",                 # random pair on the zipf tail
        "singletoken",               # single-token fast path
    ]
    for ph in phrases:
        got_idx = [r["doc_id"] for r in si.phrase_docs(ph).collect()]
        got_dir = [r["doc_id"] for r in fts.phrase_docs(docs, ph).collect()]
        assert got_idx == got_dir, ph
        # phrase ⊆ AND of its non-empty tokens
        toks = [t for t in ph.strip(" ").lower().split(" ") if t]
        and_ids = {r["doc_id"] for r in si.and_docs(toks).collect()}
        assert set(got_idx) <= and_ids, ph
    # the fixture guarantees real hits for the core cases
    assert si.phrase_docs("business solution").count() > 0
    assert si.phrase_docs("spaced   out").count() > 0
    # wrong order: strictly fewer than the AND candidate set
    assert si.phrase_docs("solution business").count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        si.phrase_docs("   ")
    with pytest.raises(ValueError, match="non-empty"):
        fts.phrase_docs(docs, " ")
    # adjacency confirm uses ANALYZED normalization — meaningless on
    # a non-analyzed field, so the index path refuses loudly
    with pytest.raises(ValueError, match="analyzed"):
        si.phrase_docs("a b", field="role")
    with pytest.raises(ValueError, match="analyzed"):
        si.near_docs("a", "b", field="role")


def test_wildcard_docs_index_equals_direct_and_bounds(corpus):
    """Index-path wildcard match (LIKE vocabulary expansion +
    posting union) ≡ the direct row-local scan; empty expansion is
    empty with the doc_id schema; the cap errors loudly."""
    si, _, docs = corpus
    for pat in ["tok1?", "neo*", "*tion", "to*7", "?", "zzqq*"]:
        got_idx = [r["doc_id"] for r in si.wildcard_docs(pat).collect()]
        got_dir = [r["doc_id"] for r in fts.wildcard_docs(docs, pat).collect()]
        assert got_idx == got_dir, pat
    # prefix wildcard ≡ prefix_docs (same semantics, two paths)
    assert [r["doc_id"] for r in si.wildcard_docs("tok10*").collect()] == [
        r["doc_id"] for r in si.prefix_docs("tok10").collect()
    ]
    assert si.wildcard_docs("zzqq*").count() == 0
    with pytest.raises(RuntimeError, match="wildcard expansion"):
        si.wildcard_docs("tok*", max_terms=1)


def test_near_docs_index_equals_direct(corpus):
    """Index-path proximity (AND pre-filter + position confirm) ≡
    the direct row-local scan; result ⊆ AND of the two terms; the
    equal-terms case needs two distinct occurrences."""
    si, _, docs = corpus
    for a, b, d in [("tok1", "tok2", 2), ("tok1", "tok2", 8),
                    ("neoway", "solution", 2), ("tok1", "tok1", 3),
                    ("tok1", "missingterm", 5)]:
        got_idx = [r["doc_id"]
                   for r in si.near_docs(a, b, max_dist=d).collect()]
        got_dir = [r["doc_id"]
                   for r in fts.near_docs(docs, a, b, max_dist=d).collect()]
        assert got_idx == got_dir, (a, b, d)
        and_ids = {r["doc_id"]
                   for r in si.and_docs(list({a, b})).collect()}
        assert set(got_idx) <= and_ids, (a, b, d)
    # adjacency: "neoway business" is adjacent in the edge text
    assert si.near_docs("neoway", "business", max_dist=1).count() > 0
    with pytest.raises(ValueError, match="max_dist"):
        si.near_docs("tok1", "tok2", max_dist=0)


def test_more_like_this_matches_python_model(corpus):
    """more_like_this ≡ an independent pure-Python model over the
    OracleIndex: tf·idf term selection (score desc, term asc) from
    the source doc's non-empty tokens, then the oracle's own BM25
    top-k with the source dropped.  Also: unknown doc_id raises,
    exclude_self=False keeps the source (a doc is most like
    itself)."""
    import math

    si, oi, _ = corpus

    def model(doc_id, n_terms, k, min_df=2):
        toks = [t for t in oi.docs[doc_id].strip(" ").lower().split(" ")
                if t != ""]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        idf = {
            t: math.log(1.0 + (oi.n_docs - len(oi.postings.get(t, [])) + 0.5)
                        / (len(oi.postings.get(t, [])) + 0.5))
            for t in tf
        }
        cand = [t for t in tf if len(oi.postings.get(t, [])) >= min_df]
        ranked = sorted(cand, key=lambda t: (-(tf[t] * idf[t]), t))[:n_terms]
        hits = oi.bm25_topk(" ".join(ranked), k + 1)
        return [(d, s) for d, s in hits if d != doc_id][:k]

    for src in [0, 23, 117, 300]:
        got = [(r["doc_id"], r["score"])
               for r in si.more_like_this(src, n_terms=5, k=8).collect()]
        want = model(src, 5, 8)
        assert [g[0] for g in got] == [w[0] for w in want], src
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-9, (src, g, w)

    # exclude_self=False ≡ the model without the source filter
    def model_keep(doc_id, n_terms, k, min_df=2):
        toks = [t for t in oi.docs[doc_id].strip(" ").lower().split(" ")
                if t != ""]
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        idf = {
            t: math.log(1.0 + (oi.n_docs - len(oi.postings.get(t, [])) + 0.5)
                        / (len(oi.postings.get(t, [])) + 0.5))
            for t in tf
        }
        cand = [t for t in tf if len(oi.postings.get(t, [])) >= min_df]
        ranked = sorted(cand, key=lambda t: (-(tf[t] * idf[t]), t))[:n_terms]
        return oi.bm25_topk(" ".join(ranked), k)

    kept = [(r["doc_id"], r["score"])
            for r in si.more_like_this(23, k=5, exclude_self=False).collect()]
    assert [g[0] for g in kept] == [w[0] for w in model_keep(23, 5, 5)]
    with pytest.raises(KeyError, match="doc store"):
        si.more_like_this(10**9)


def test_facet_counts_index_equals_direct(corpus):
    """Index-path facet counts (posting OR + doc-store join + facet
    groupBy) ≡ the direct scan, and totals ≡ the matched-doc count."""
    si, _, docs = corpus
    for terms in [["tok1", "tok2"], ["neoway"], ["missingterm"]]:
        got_idx = [(r["facet"], r["n_docs"])
                   for r in si.facet_counts(terms, "role").collect()]
        got_dir = [(r["facet"], r["n_docs"])
                   for r in fts.facet_counts(docs, terms, "role").collect()]
        assert got_idx == got_dir, terms
        total = sum(n for _, n in got_idx)
        assert total == si.or_docs(terms).count(), terms


@pytest.mark.parametrize("mode", ["local", "distributed"])
@pytest.mark.parametrize("q", QUERIES)
def test_bm25_rank_identity(corpus, q, mode):
    si, oi, _ = corpus
    want = oi.bm25_topk(q, 10)
    got = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=False, mode=mode).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want], (q, mode)
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9, (q, mode, g, w)


@pytest.mark.parametrize("q", QUERIES)
def test_wand_pruning_lossless(corpus, q):
    si, _, _ = corpus
    exhaustive = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=False, mode="distributed").collect()
    ]
    pruned = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=True, mode="distributed").collect()
    ]
    assert pruned == exhaustive, q


@pytest.mark.parametrize("q", QUERIES)
def test_local_path_identical_to_distributed(corpus, q):
    """The broadcast-blocks fast path must be bit-identical to the
    distributed per-span path (same float64 op order by design)."""
    si, _, _ = corpus
    local = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, mode="local").collect()
    ]
    dist = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, mode="distributed").collect()
    ]
    assert local == dist, q


def test_exhaustive_merge_distributed_and_bounded(corpus, monkeypatch):
    """With pruning off and many spans, the exhaustive fallback must
    NOT collect ~k-per-span candidates to the driver (76 M rows at
    10^12 docs): past EXHAUSTIVE_COLLECT_MAX_BLOCKS it runs a
    distributed TakeOrdered and the driver receives EXACTLY ≤k rows —
    rank-identical to the driver-side merge."""
    si, oi, _ = corpus
    q, k = "tok1 tok3", 10
    want = oi.bm25_topk(q, k)

    collected_sizes = []
    orig_topk_df = type(si)._topk_df

    def spy_topk_df(self, rows):
        collected_sizes.append(len(rows))
        return orig_topk_df(self, rows)

    monkeypatch.setattr(type(si), "_topk_df", spy_topk_df)
    monkeypatch.setattr(type(si), "EXHAUSTIVE_COLLECT_MAX_BLOCKS", 0)
    got = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, prune=False, mode="distributed").collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9
    # the driver-side materialization saw only the final k rows
    assert collected_sizes and all(n <= k for n in collected_sizes)


def test_meta_cap_fallback_identical(corpus, monkeypatch):
    """Astronomically-hot queries exceed META_COLLECT_CAP and fall
    back to terms-table stats — results must be identical."""
    si, oi, _ = corpus
    normal = [
        (r["doc_id"], r["score"]) for r in si.bm25_topk("tok1 tok3", 10).collect()
    ]
    monkeypatch.setattr(type(si), "FAST_COLLECT_MAX_BLOCKS", 0)
    monkeypatch.setattr(type(si), "LOCAL_SCORE_MAX_POSTINGS", 0)
    monkeypatch.setattr(type(si), "META_COLLECT_CAP", 1)
    fallback = [
        (r["doc_id"], r["score"]) for r in si.bm25_topk("tok1 tok3", 10).collect()
    ]
    assert fallback == normal


@pytest.mark.parametrize("q", ["tok1 tok3 tok17", "tok1", "tok2 tok2 tok5"])
def test_distributed_bounds_prune_identical(corpus, monkeypatch, q):
    """When block metadata can't be collected (META_COLLECT_CAP hit),
    WAND bounds aggregate distributed (groupBy span_id) and survivors
    apply as a join — results must equal the exhaustive path."""
    si, _, _ = corpus
    exhaustive = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=False, mode="distributed").collect()
    ]
    monkeypatch.setattr(type(si), "FAST_COLLECT_MAX_BLOCKS", 0)
    monkeypatch.setattr(type(si), "META_COLLECT_CAP", 1)
    pruned = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=True, mode="distributed").collect()
    ]
    assert pruned == exhaustive, q


def test_many_span_survivors_broadcast_join(corpus, monkeypatch):
    """Past ISIN_MAX_SPANS the span filter must switch to a broadcast
    join (no 10^5-literal In expression in the plan) and stay
    result-identical."""
    si, _, _ = corpus
    q = "tok1 tok3 tok17"
    baseline = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=True, mode="distributed").collect()
    ]
    monkeypatch.setattr(type(si), "ISIN_MAX_SPANS", 0)
    joined = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, 10, prune=True, mode="distributed").collect()
    ]
    assert joined == baseline

    # plan-level: the join form contains a broadcast join on span_id
    # and no literal IN-list over span_id
    plan = si._span_filter(si.blocks, range(50))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "span_id IN" not in plan.replace("#", " ")


def test_survivor_merge_distributed_and_bounded(spark, tmp_path, monkeypatch):
    """A low-θ query can leave nearly every span a WAND survivor
    (all-stopword query over 10^12 docs ≈ 7.6 M spans, ×k candidate
    rows each): past SURVIVOR_COLLECT_MAX_SPANS the boot+rest merge
    must run the same distributed TakeOrdered as the exhaustive
    fallback, so direct driver receipt stays ≤ n_boot·k (boot) + k
    (rest) rows — and results stay rank-identical."""
    docs = assign_doc_ids(synth_transcripts(spark, N_TURNS, seed=11))
    d = str(tmp_path / "surv_idx")
    IndexBuilder(d, span=8).build(docs)  # 600 docs / span 8 → ~75 spans
    si = SparkIndex(spark, d)
    q, k = "tok1 tok2", 10
    n_boot = max(1, (k * 2 + si.span - 1) // si.span, 4)

    exhaustive = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, prune=False, mode="distributed").collect()
    ]

    # spy: count every DIRECT collect() of a _score_spans result —
    # boot rows always; the survivors' candidates only when the
    # driver-side merge is taken (the distributed merge derives an
    # orderBy+limit DataFrame, so its collect is not counted here)
    sizes: list[int] = []
    orig_score_spans = type(si)._score_spans

    def spy(self, blocks, qterms, idf, kk):
        df = orig_score_spans(self, blocks, qterms, idf, kk)
        inner = df.collect

        def counted():
            rows = inner()
            sizes.append(len(rows))
            return rows

        df.collect = counted
        return df

    monkeypatch.setattr(type(si), "_score_spans", spy)

    # phase 1 — default cap: survivors exist and ARE collected
    # driver-side (boot + rest = two direct collects)
    got = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, prune=True, mode="distributed").collect()
    ]
    assert got == exhaustive
    assert len(sizes) == 2, f"expected boot+rest collects, saw {sizes}"
    assert sizes[1] > 0, "test premise: the query must have survivors"

    # phase 2 — cap forced to 0: the rest merge goes distributed; the
    # only direct collect left is the boot (≤ n_boot·k rows), and the
    # distributed rest is limit(k) by construction
    monkeypatch.setattr(type(si), "SURVIVOR_COLLECT_MAX_SPANS", 0)
    sizes.clear()
    got = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, prune=True, mode="distributed").collect()
    ]
    assert got == exhaustive
    assert len(sizes) == 1, f"survivors must not collect driver-side: {sizes}"
    assert sizes[0] <= n_boot * k

    # phase 3 — META_COLLECT_CAP exceeded (distributed bound agg):
    # the rest merge is ALWAYS distributed on that path
    monkeypatch.setattr(type(si), "META_COLLECT_CAP", 1)
    sizes.clear()
    got = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, prune=True, mode="distributed").collect()
    ]
    assert got == exhaustive
    assert len(sizes) == 1, f"survivors must not collect driver-side: {sizes}"
    assert sizes[0] <= n_boot * k


def test_batch_identical_to_per_query(corpus):
    """bm25_topk_batch must return row-for-row what the per-query
    path returns (same floats, same tie-breaks), including queries
    with duplicate and missing terms."""
    si, _, _ = corpus
    queries = ["tok1 tok3 tok17", "tok1", "tok2 tok2 tok5", "missingterm tok4"]
    per = []
    for qi, q in enumerate(queries):
        for r in si.bm25_topk(q, 10).collect():
            per.append((qi, r["doc_id"], r["score"]))
    got = [
        (r["query_id"], r["doc_id"], r["score"])
        for r in si.bm25_topk_batch(queries, 10).collect()
    ]
    assert got == per


def test_batch_fallback_identical(corpus, monkeypatch):
    """Past the local-posting cap the batch falls back to per-query
    evaluation — results must not change."""
    si, _, _ = corpus
    queries = ["tok1 tok3", "tok17"]
    baseline = [
        (r["query_id"], r["doc_id"], r["score"])
        for r in si.bm25_topk_batch(queries, 10).collect()
    ]
    monkeypatch.setattr(type(si), "LOCAL_SCORE_MAX_POSTINGS", 0)
    monkeypatch.setattr(type(si), "FAST_COLLECT_MAX_BLOCKS", 0)
    fallback = [
        (r["query_id"], r["doc_id"], r["score"])
        for r in si.bm25_topk_batch(queries, 10).collect()
    ]
    assert fallback == baseline


def test_batch_is_one_spark_job(corpus):
    """The serving-path amortization claim: with warmed term
    metadata, scoring an N-query batch runs exactly ONE Spark job
    (the union-of-terms payload scan)."""
    si, _, _ = corpus
    queries = ["tok1 tok3", "tok17 tok2", "tok5 tok9"]
    si.bm25_topk_batch(queries, 10)  # warm: memoizes term metadata
    sc = si.spark.sparkContext
    sc.setJobGroup("batch_probe", "batch job count")
    si.bm25_topk_batch(queries, 10)
    sc.setJobGroup("after_probe", "")
    ids = sc.statusTracker().getJobIdsForGroup("batch_probe")
    assert len(ids) == 1, f"expected 1 scan job for the batch, got {len(ids)}"


def test_batch_distributed_identical_and_bounded_jobs(corpus, monkeypatch):
    """Forcing every query hot routes the batch through the
    distributed batched-WAND path: results stay bit-identical to the
    unforced batch, and the WHOLE hot set costs O(1) scoring jobs
    (≤4: metadata probe + capped meta collect + boot + survivors) —
    never a per-query job loop."""
    si, _, _ = corpus
    queries = ["tok1 tok3 tok17", "tok2 tok2 tok5", "tok1", "missingterm tok4"]
    baseline = [
        (r["query_id"], r["doc_id"], r["score"])
        for r in si.bm25_topk_batch(queries, 10).collect()
    ]
    monkeypatch.setattr(type(si), "LOCAL_SCORE_MAX_POSTINGS", 0)
    monkeypatch.setattr(type(si), "FAST_COLLECT_MAX_BLOCKS", 0)
    sc = si.spark.sparkContext

    def count_jobs(group, qs):
        sc.setJobGroup(group, "distributed batch job count")
        rows = [
            (r["query_id"], r["doc_id"], r["score"])
            for r in si.bm25_topk_batch(qs, 10).collect()
        ]
        sc.setJobGroup(f"after_{group}", "")
        return rows, len(sc.statusTracker().getJobIdsForGroup(group))

    got, jobs4 = count_jobs("hot_batch_4", queries)
    assert got == baseline
    # the fixed ladder (meta collect + boot + survivors + result) is
    # independent of the number of hot queries: 2-query and 4-query
    # batches run the SAME number of jobs (a per-query loop would
    # scale linearly)
    _, jobs2 = count_jobs("hot_batch_2", queries[:2])
    assert jobs4 <= jobs2 + 1, f"jobs grew with batch size: {jobs2} -> {jobs4}"


def test_batch_distributed_meta_overflow_exhaustive(corpus, monkeypatch):
    """When the metadata collect overflows its cap, the hot batch
    falls back to ONE exhaustive batch-scoring job — identical rows."""
    si, _, _ = corpus
    queries = ["tok1 tok3", "tok2 tok5"]
    baseline = [
        (r["query_id"], r["doc_id"], r["score"])
        for r in si.bm25_topk_batch(queries, 10).collect()
    ]
    monkeypatch.setattr(type(si), "LOCAL_SCORE_MAX_POSTINGS", 0)
    monkeypatch.setattr(type(si), "META_COLLECT_CAP", 0)
    got = [
        (r["query_id"], r["doc_id"], r["score"])
        for r in si.bm25_topk_batch(queries, 10).collect()
    ]
    assert got == baseline


def test_get_docs_materialization(corpus):
    si, oi, _ = corpus
    top = si.bm25_topk("tok1 tok3", 5)
    docs = si.get_docs(top.select("doc_id")).collect()
    assert len(docs) == 5
    assert {r["doc_id"] for r in docs} == {d for d, _ in oi.bm25_topk("tok1 tok3", 5)}


def test_per_turn_text_equality_invariant(corpus):
    """input_hint invariant: per-turn text survives the pipeline
    byte-identically under stable (conv_id, turn_idx) ordering."""
    si, _, docs = corpus
    src = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in docs.select("conv_id", "turn_idx", "text").collect()
    }
    stored = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in si.docs.select("conv_id", "turn_idx", "text").collect()
    }
    assert src == stored


def test_span_meta_memo_warm_repeat(spark, tmp_path, monkeypatch):
    """The WAND-bounds span metadata is memoized per (field, term):
    a warm repeat of a pruned distributed query must run NO metadata
    scan (straight to the boot job), with results identical to the
    cold run and to the exhaustive path.  The memo's row budget is
    respected: past it, terms are fetched per-query uncached."""
    docs = assign_doc_ids(synth_transcripts(spark, N_TURNS, seed=13))
    d = str(tmp_path / "memo_idx")
    IndexBuilder(d, span=8).build(docs)  # small span → >64 blocks
    si = SparkIndex(spark, d)
    q, k = "tok1 tok2 tok9", 10

    missing_per_call: list[list[str]] = []
    orig = type(si)._span_meta

    def spy(self, uniq, field):
        missing_per_call.append(
            [t for t in uniq if (field, t) not in self._span_meta_cache]
        )
        return orig(self, uniq, field)

    monkeypatch.setattr(type(si), "_span_meta", spy)

    exhaustive = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, prune=False, mode="distributed").collect()
    ]
    cold = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, mode="distributed").collect()
    ]
    warm = [
        (r["doc_id"], r["score"])
        for r in si.bm25_topk(q, k, mode="distributed").collect()
    ]
    assert cold == warm == exhaustive
    assert missing_per_call[0] == ["tok1", "tok2", "tok9"]  # cold: fetch all
    assert missing_per_call[1] == []                        # warm: memo only

    # batch path shares the memo: a batch repeating one term + one new
    batch = si.bm25_topk_batch([q, "tok1 tok17"], k=k)
    got = [
        (r["doc_id"], r["score"])
        for r in batch.where("query_id = 0").select("doc_id", "score").collect()
    ]
    assert got == exhaustive
    if len(missing_per_call) > 2:  # hot batch path taken
        assert "tok1" not in missing_per_call[2]

    # budget exhausted → correct but uncached
    monkeypatch.setattr(type(si), "SPAN_META_MEMO_MAX_ROWS", 0)
    si2 = SparkIndex(spark, d)
    monkeypatch.setattr(type(si2), "_span_meta", spy)
    a = [(r["doc_id"], r["score"])
         for r in si2.bm25_topk(q, k, mode="distributed").collect()]
    b = [(r["doc_id"], r["score"])
         for r in si2.bm25_topk(q, k, mode="distributed").collect()]
    assert a == b == exhaustive
    assert missing_per_call[-1] == ["tok1", "tok2", "tok9"]  # nothing cached


def test_result_cache_zero_jobs_on_repeat(spark, tmp_path, monkeypatch):
    """result_cache=N: an exact repeat query returns the memoized
    rows without re-entering the scoring engine (zero Spark scoring
    jobs), identical to the uncached result; the LRU evicts at
    capacity; default (0) stays uncached."""
    docs = assign_doc_ids(synth_transcripts(spark, 200, seed=5))
    d = str(tmp_path / "rc_idx")
    IndexBuilder(d, span=32).build(docs)

    calls: list[tuple] = []
    impl = SparkIndex._bm25_topk_impl

    def spy(self, query, k=10, field="text", prune=True, mode="auto"):
        calls.append((query, k))
        return impl(self, query, k, field, prune, mode)

    monkeypatch.setattr(SparkIndex, "_bm25_topk_impl", spy)

    plain = SparkIndex(spark, d)
    want = [(r["doc_id"], r["score"]) for r in plain.bm25_topk("tok1 tok2", 5).collect()]
    assert len(calls) == 2 or len(calls) == 1  # uncached: every call hits impl
    n0 = len(calls)
    plain.bm25_topk("tok1 tok2", 5).collect()
    assert len(calls) == n0 + 1  # still uncached by default

    si = SparkIndex(spark, d, result_cache=2)
    calls.clear()
    a = [(r["doc_id"], r["score"]) for r in si.bm25_topk("tok1 tok2", 5).collect()]
    b = [(r["doc_id"], r["score"]) for r in si.bm25_topk("tok1 tok2", 5).collect()]
    assert a == b == want
    assert len(calls) == 1, f"repeat must not re-enter the engine: {calls}"
    # distinct k / query are distinct entries
    si.bm25_topk("tok1 tok2", 3).collect()
    si.bm25_topk("tok3", 5).collect()
    assert len(calls) == 3
    # capacity 2: the oldest entry was evicted and recomputes
    si.bm25_topk("tok1 tok2", 5).collect()
    assert len(calls) == 4


def test_memo_caches_are_thread_safe(spark, tmp_path, monkeypatch):
    """One SparkIndex handle is shared across ThreadingHTTPServer
    handler threads: hammer the result-cache LRU (get/move_to_end vs
    insert/evict) and the term-meta memo (incl. its overflow clear)
    from many threads.  Pre-fix this raced into KeyError (evict
    between a hit's get and its move_to_end; clear between insert and
    read-back) and 400'd valid queries."""
    import threading

    d = str(tmp_path / "mt_idx")
    docs = assign_doc_ids(synth_transcripts(spark, 120, seed=11))
    IndexBuilder(d, span=64).build(docs)
    idx = SparkIndex(spark, d, result_cache=2)  # tiny: constant eviction

    # driver-side stand-ins: no Spark work, so threads interleave at
    # dict-operation granularity and the race window is actually hit
    monkeypatch.setattr(
        idx, "_bm25_topk_impl",
        lambda query, k, field, prune, mode: type(
            "R", (), {"collect": staticmethod(lambda: [])}
        )(),
    )
    monkeypatch.setattr(idx, "_topk_df", lambda rows: rows)

    errors: list[BaseException] = []

    def hammer(seed: int) -> None:
        try:
            for i in range(3000):
                idx.bm25_topk(f"q{(seed + i) % 3}", 10)  # 3 keys, cache of 2
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert len(idx._result_cache) <= 2

    # term-meta memo: force the overflow clear to race the read-back
    idx._meta_cache.clear()
    real_terms = idx._term_meta(["tok1", "tok2", "tok3"])  # real fetch once
    errors2: list[BaseException] = []

    def meta_hammer(seed: int) -> None:
        try:
            for i in range(2000):
                if i % 50 == seed % 50:
                    # simulate the soft-cap clear another thread triggers
                    with idx._memo_lock:
                        idx._meta_cache.clear()
                        idx._meta_cache.update(
                            {("text", t): v for t, v in real_terms.items()}
                        )
                got = idx._term_meta([f"tok{1 + (seed + i) % 3}"])
                assert list(got.values())[0][0] >= 0
        except BaseException as e:  # noqa: BLE001
            errors2.append(e)

    # make misses cheap/driver-side: every term is already cached via
    # real_terms re-seeding, so _term_meta never reaches Spark here
    threads = [threading.Thread(target=meta_hammer, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors2, errors2


def test_suggest_terms_index_equals_direct(corpus):
    """Index-path spelling suggestions (terms-table vocabulary, no
    corpus scan) ≡ the direct token-df aggregation, including the
    (dist asc, df desc, term asc) ranking; max_dist validated."""
    si, _, docs = corpus
    for term, d, n in [("tok", 2, 5), ("neoway", 2, 5), ("tok10", 1, 8),
                       ("zzqqxx", 2, 5)]:
        got_idx = [(r["term"], r["dist"], r["df"])
                   for r in si.suggest_terms(term, max_dist=d, n=n).collect()]
        got_dir = [(r["term"], r["dist"], r["df"])
                   for r in fts.suggest_terms(docs, term, max_dist=d, n=n).collect()]
        assert got_idx == got_dir, (term, d)
        # ranking invariant: dist non-decreasing; within a dist, df
        # non-increasing
        for a, b in zip(got_idx, got_idx[1:]):
            assert a[1] <= b[1]
            if a[1] == b[1]:
                assert a[2] >= b[2]
    # an exact vocabulary hit ranks itself first at dist 0
    first = si.suggest_terms("tok1", max_dist=1, n=3).collect()[0]
    assert (first["term"], first["dist"]) == ("tok1", 0)
    with pytest.raises(ValueError, match="max_dist"):
        si.suggest_terms("tok1", max_dist=0)
    with pytest.raises(ValueError, match="max_dist"):
        fts.suggest_terms(docs, "tok1", max_dist=0)
