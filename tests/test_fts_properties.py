"""Randomized parity for the direct boolean term ops (fts.py) vs a
pure-Python set-algebra oracle.

The r5 rewrite turned these six operators into row-local array
predicates; this suite pins their SEMANTICS against an independent
model over seeded random corpora that exercise every analyzer edge:
empty tokens from multi-space runs, punctuation-only tokens, mixed
case, leading/trailing spaces, null text, absent terms, duplicate
terms, and empty term lists (which match nothing, by the module's
documented parity with the old ``isin([])`` shape).
"""

from __future__ import annotations

import random

import pytest

from neosearch_spark import fts

VOCAB = ["alpha", "beta", "gamma", "-", "x1", "x2", "zz"]


def _toks(text):
    if text is None:
        return set()
    return set(text.strip(" ").lower().split(" "))


def _any(toks, terms):
    return bool(terms) and bool(toks & set(terms))


def _all(toks, terms):
    return bool(terms) and all(t in toks for t in terms)


def _mk_corpus(rng, n):
    rows = []
    for i in range(n):
        if rng.random() < 0.05:
            rows.append((i, None))
            continue
        k = rng.randint(0, 6)
        words = [rng.choice(VOCAB) for _ in range(k)]
        sep = "  " if rng.random() < 0.3 else " "  # double space → empty token
        text = sep.join(words)
        if rng.random() < 0.3:
            text = " " + text + "  "  # outer spaces are trimmed
        if rng.random() < 0.3:
            text = text.upper()  # analyzer lowercases
        rows.append((i, text))
    return rows


def _terms(rng):
    pool = VOCAB + ["", "absent", "ALPHA"]  # "" = the multi-space token
    k = rng.choice([0, 1, 1, 2, 2, 3])
    return [rng.choice(pool) for _ in range(k)]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_boolean_ops_match_set_algebra_oracle(spark, seed):
    rng = random.Random(seed)
    rows = _mk_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = {i: _toks(t) for i, t in rows}

    for _ in range(3):
        a, b = _terms(rng), _terms(rng)
        term = rng.choice(VOCAB + ["absent", ""])
        prefix = rng.choice(["al", "x", "-", "zz", "q"])

        cases = [
            (fts.matching_docs(docs, term), lambda tk: term in tk),
            (fts.and_docs(docs, a), lambda tk: _all(tk, a)),
            (fts.or_docs(docs, a), lambda tk: _any(tk, a)),
            (fts.not_docs(docs, a, b), lambda tk: _all(tk, a) and not _any(tk, b)),
            (fts.xor_docs(docs, a, b), lambda tk: _any(tk, a) != _any(tk, b)),
            (
                fts.prefix_docs(docs, prefix),
                lambda tk: any(t.startswith(prefix) for t in tk),
            ),
        ]
        for df, pred in cases:
            got = [r["doc_id"] for r in df.collect()]
            want = sorted(i for i, tk in model.items() if pred(tk))
            assert got == want, (a, b, term, prefix, df)


def test_snippets_golden(spark):
    """Window clamping at both ends, earliest-term-wins on
    multi-term queries, null text and no-hit docs kept with null
    snippet, empty-terms rejection."""
    docs = spark.createDataFrame(
        [
            (0, "alpha b c d e f g h i j k"),   # hit at pos 1: clamp left
            (1, "a b c d e f g h i j alpha"),   # hit at end: short window
            (2, "x y z"),                        # no hit
            (3, None),                           # null text
            (4, "a beta c d alpha f"),           # beta (pos 2) before alpha
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r
            for r in fts.snippets(docs, ["alpha", "beta"], width=4).collect()}
    assert len(rows) == 5
    assert (rows[0]["hit_pos"], rows[0]["snippet"]) == (1, "alpha b c d")
    # hit at 11, start = max(11-2, 1) = 9 -> tokens 9..11 only
    assert (rows[1]["hit_pos"], rows[1]["snippet"]) == (11, "i j alpha")
    assert (rows[2]["hit_pos"], rows[2]["snippet"]) == (None, None)
    assert (rows[3]["hit_pos"], rows[3]["snippet"]) == (None, None)
    assert (rows[4]["hit_pos"], rows[4]["snippet"]) == (2, "a beta c d")
    with pytest.raises(ValueError, match="at least one"):
        fts.snippets(docs, [])


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzzy_docs_matches_levenshtein_oracle(spark, seed):
    """fts.fuzzy_docs vs a pure-Python Levenshtein model on the same
    edge-heavy random corpora (the VOCAB deliberately contains
    distance-1/2 neighbors: x1/x2/zz, alpha vs ALPHA-lowered)."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(100 + seed)
    rows = _mk_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = {i: _toks(t) for i, t in rows}
    for term, dist in [("x1", 1), ("alpha", 2), ("zz", 1), ("qq", 0)]:
        got = [r["doc_id"]
               for r in fts.fuzzy_docs(docs, term, max_dist=dist).collect()]
        want = sorted(i for i, tk in model.items()
                      if any(lev(t, term) <= dist for t in tk))
        assert got == want, (term, dist)


def test_bm25_empty_query_returns_empty_not_typeerror(spark):
    """analyze_query('  ') legitimately yields [] — bm25_scores/topk
    must build a valid empty plan (pre-r5 groupBy-shape parity), not
    raise at plan-build time."""
    docs = spark.createDataFrame([(0, "alpha beta"), (1, "beta")],
                                 "doc_id long, text string")
    for df in (fts.bm25_scores(docs, []), fts.bm25_topk(docs, [], 5)):
        assert df.columns == ["doc_id", "score"]
        assert df.count() == 0
    # duplicate-only lists reduce to one unique term, still valid
    assert fts.bm25_topk(docs, ["beta", "beta"], 5).count() == 2


@pytest.mark.parametrize("seed", [0, 1])
def test_phrase_docs_matches_sublist_oracle(spark, seed):
    """fts.phrase_docs vs an INDEPENDENT pure-Python model: the
    phrase's token list (split on single space, empties KEPT) is a
    contiguous sublist of the doc's ordered token list.  The random
    corpora contain multi-space runs, so adjacency-across-empties is
    exercised both ways; sampled in-doc windows guarantee hits."""

    def tok_list(text):
        return None if text is None else text.strip(" ").lower().split(" ")

    def sublist(hay, needle):
        n = len(needle)
        return any(hay[i:i + n] == needle for i in range(len(hay) - n + 1))

    rng = random.Random(200 + seed)
    rows = _mk_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = {i: tok_list(t) for i, t in rows}

    phrases = []
    # sampled windows from real docs (guaranteed hits, incl. empties)
    for _ in range(6):
        cands = [tl for tl in model.values() if tl and len(tl) >= 2]
        tl = rng.choice(cands)
        i = rng.randrange(len(tl) - 1)
        w = tl[i:i + rng.choice([2, 2, 3])]
        if any(t != "" for t in w):
            phrases.append(" ".join(w))
    # random pairs (mostly misses) + case normalization
    for _ in range(4):
        phrases.append(f"{rng.choice(VOCAB)} {rng.choice(VOCAB)}".upper())

    for ph in phrases:
        want_toks = ph.strip(" ").lower().split(" ")
        got = [r["doc_id"] for r in fts.phrase_docs(docs, ph).collect()]
        want = sorted(i for i, tl in model.items()
                      if tl is not None and sublist(tl, want_toks))
        assert got == want, ph


@pytest.mark.parametrize("seed", [0, 1])
def test_wildcard_docs_matches_glob_oracle(spark, seed):
    """fts.wildcard_docs vs the pure-Python glob model
    (fts.wildcard_match): * = any run, ? = exactly one char, LIKE
    metacharacters in the pattern are literals."""
    rng = random.Random(300 + seed)
    rows = _mk_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = {i: _toks(t) for i, t in rows}
    for pat in ["al*", "x?", "*a", "?", "-", "z*z", "*", "q*"]:
        got = [r["doc_id"]
               for r in fts.wildcard_docs(docs, pat).collect()]
        want = sorted(i for i, tk in model.items()
                      if any(fts.wildcard_match(t, pat) for t in tk))
        assert got == want, pat


def test_wildcard_like_metacharacters_are_literal(spark):
    """Tokens containing %, _ and \\ must only match themselves
    literally; ? still matches any single char in their place."""
    docs = spark.createDataFrame(
        [(0, "a%b"), (1, "a_b"), (2, "axb"), (3, "a\\b")],
        "doc_id long, text string",
    )
    ids = lambda pat: [r["doc_id"]
                       for r in fts.wildcard_docs(docs, pat).collect()]
    assert ids("a%b") == [0]     # % literal, not any-run
    assert ids("a_b") == [1]     # _ literal, not one-char
    assert ids("a\\b") == [3]    # backslash literal
    assert ids("a?b") == [0, 1, 2, 3]
    assert ids("a*b") == [0, 1, 2, 3]
    # the pure-Python twin agrees
    assert fts.wildcard_match("a%b", "a%b") and not fts.wildcard_match("axb", "a%b")
    assert fts.wildcard_match("a_b", "a_b") and not fts.wildcard_match("axb", "a_b")
    assert fts.wildcard_match("a\\b", "a\\b") and not fts.wildcard_match("axb", "a\\b")


@pytest.mark.parametrize("seed", [0, 1])
def test_facet_counts_matches_counter_oracle(spark, seed):
    """fts.facet_counts vs a pure-Python Counter over the any-term
    match, including a null facet group and the (count desc, facet
    asc) output order."""
    from collections import Counter

    rng = random.Random(400 + seed)
    rows = []
    for i, (doc_id, text) in enumerate(_mk_corpus(rng, 60)):
        facet = rng.choice(["en", "fr", "de", None])
        rows.append((doc_id, text, facet))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = {i: _toks(t) for i, t, _ in rows}
    facet_of = {i: f for i, _, f in rows}
    for _ in range(3):
        terms = _terms(rng)
        got = [(r["facet"], r["n_docs"])
               for r in fts.facet_counts(docs, terms, "lang").collect()]
        c = Counter(facet_of[i] for i, tk in model.items() if _any(tk, terms))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0] is None, kv[0]))
        # null ordering differs by engine convention; compare as multisets
        assert sorted(got, key=str) == sorted(want, key=str), terms


@pytest.mark.parametrize("seed", [0, 1])
def test_near_docs_matches_position_oracle(spark, seed):
    """fts.near_docs vs a pure-Python position model: positions in
    the NON-EMPTY token stream, |pa - pb| <= d, equal terms needing
    two distinct occurrences.  The dup-heavy random corpora give
    real same-term repeats and multi-space runs (whose empty tokens
    must NOT count as positions)."""

    def pos_list(text, term):
        if text is None:
            return []
        toks = [t for t in text.strip(" ").lower().split(" ") if t != ""]
        return [i + 1 for i, t in enumerate(toks) if t == term]

    rng = random.Random(500 + seed)
    rows = _mk_corpus(rng, 60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cases = [("alpha", "beta", 1), ("alpha", "beta", 3),
             ("x1", "x2", 2), ("alpha", "alpha", 2), ("zz", "qq", 5)]
    for a, b, d in cases:
        got = [r["doc_id"]
               for r in fts.near_docs(docs, a, b, max_dist=d).collect()]
        want = []
        for i, t in rows:
            pa, pb = pos_list(t, a), pos_list(t, b)
            if a == b:
                hit = any(abs(x - y) <= d for x in pa for y in pb if x != y)
            else:
                hit = any(abs(x - y) <= d for x in pa for y in pb)
            if hit:
                want.append(i)
        assert got == sorted(want), (a, b, d)
    with pytest.raises(ValueError, match="max_dist"):
        fts.near_docs(docs, "alpha", "beta", max_dist=0)
