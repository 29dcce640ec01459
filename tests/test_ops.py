"""Training-data pipeline operators: dedup, ANN, text stats,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neosearch_spark.ops import ann, curate, dedup, multimodal, textstats


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "the quick brown fox"),          # exact dup of 0
        (2, "The  quick brown fox"),         # normalizes differently (double space)
        (3, "the quick brown fox jumps"),    # near dup
        (4, "completely different text here"),
        (5, "fox brown quick the"),          # same token set, different order
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    out = dedup.exact_dedup(dup_docs).collect()
    groups = {r["survivor_id"]: r["n_dups"] for r in out}
    assert groups[0] == 2  # docs 0,1
    assert sum(groups.values()) == 6
    assert len(groups) == 5


def test_jaccard_pairs(spark, dup_docs):
    out = dedup.jaccard_pairs(dup_docs, threshold=0.99).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0
    assert (0, 5) in pairs  # same token set
    assert (0, 4) not in pairs


def test_minhash_identical_docs_same_signature(spark, dup_docs):
    sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
            for r in dedup.minhash_signatures(dup_docs).collect()}
    assert sigs[0] == sigs[1] == sigs[5]  # same token sets
    assert sigs[0] != sigs[4]


def test_minhash_lsh_buckets(spark, dup_docs):
    buckets = dedup.minhash_lsh_buckets(dup_docs, n_hashes=16, band_size=4).collect()
    # identical docs must co-bucket in every band
    assert any(r["bucket_size"] >= 3 for r in buckets)


def test_minhash_shapes_identical_and_plan_bounds(spark, dup_docs):
    """The grouped (default) and rowlocal signature shapes return the
    same rows; rowlocal's plan has ZERO exchanges (its reason to
    exist) and the posexplode banding plan contains no Union and
    exactly one hash exchange beyond the signature's own."""
    g = sorted(tuple(r) for r in
               dedup.minhash_signatures(dup_docs, n_hashes=8).collect())
    rl = sorted(tuple(r) for r in
                dedup.minhash_signatures(dup_docs, n_hashes=8,
                                         shape="rowlocal").collect())
    assert g == rl and len(g) > 0

    rl_plan = (dedup.minhash_signatures(dup_docs, n_hashes=8,
                                        shape="rowlocal")
               ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in rl_plan

    lsh_plan = (dedup.minhash_lsh_buckets(dup_docs, n_hashes=8,
                                          band_size=4)
                ._jdf.queryExecution().executedPlan().toString())
    assert "Union" not in lsh_plan
    # banding adds exactly ONE hash exchange (the bucket groupBy)
    # over whatever the signature plan needs (+ the presentation
    # orderBy's range exchange)
    sig_plan = (dedup.minhash_signatures(dup_docs, n_hashes=8)
                ._jdf.queryExecution().executedPlan().toString())
    assert (lsh_plan.count("Exchange hashpartitioning")
            == sig_plan.count("Exchange hashpartitioning") + 1)

    lsh_rl = sorted(tuple(r) for r in
                    dedup.minhash_lsh_buckets(dup_docs, n_hashes=8,
                                              band_size=4,
                                              shape="rowlocal").collect())
    lsh_g = sorted(tuple(r) for r in
                   dedup.minhash_lsh_buckets(dup_docs, n_hashes=8,
                                             band_size=4).collect())
    assert lsh_rl == lsh_g

    with pytest.raises(ValueError):
        dedup.minhash_signatures(dup_docs, shape="nope")


def test_repetition_stats_golden(spark):
    """Pinned values for the Gopher-style repetition features,
    including the 0/1-token docs the explode would drop without
    explode_outer."""
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),  # bigrams: "a b"x3, "b a"x2
            (1, "x y z w"),
            (2, "solo"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
    assert len(rows) == 4
    r0 = rows[0]
    assert (r0["n_tok"], r0["n_bigrams"]) == (6, 5)
    assert r0["top_bigram_frac"] == 0.6
    assert r0["dup_bigram_frac"] == 1.0
    assert r0["dup_token_frac"] == round(4 / 6, 6)
    assert rows[1]["dup_bigram_frac"] == 0.0
    assert rows[1]["top_bigram_frac"] == round(1 / 3, 6)
    for did in (2, 3):
        r = rows[did]
        assert (r["n_bigrams"], r["top_bigram_frac"], r["dup_bigram_frac"]) == (0, 0.0, 0.0)


def test_contamination_check_golden(spark):
    """8-gram benchmark-overlap decontamination: a doc sharing one
    8-gram with the benchmark is flagged with the exact fraction;
    sub-8-token docs and clean docs stay unflagged but present."""
    docs = spark.createDataFrame(
        [
            (0, "one two three four five six seven eight nine ten"),
            (1, "totally different words with no overlap at all here"),
            (2, "short doc"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r
            for r in curate.contamination_check(docs, bench, n=8).collect()}
    assert len(rows) == 3
    # doc 0 has 3 distinct 8-grams; exactly one (two..nine) is the
    # benchmark doc's single 8-gram
    assert (rows[0]["n_grams"], rows[0]["n_hit"]) == (3, 1)
    assert rows[0]["contamination_frac"] == round(1 / 3, 6)
    assert rows[0]["contaminated"] is True
    assert (rows[1]["n_hit"], rows[1]["contaminated"]) == (0, False)
    assert (rows[2]["n_grams"], rows[2]["contaminated"]) == (0, False)
    # self-contamination sanity: a benchmark doc checked against the
    # same benchmark is fully contaminated
    self_rows = curate.contamination_check(bench, bench, n=8).collect()
    assert self_rows[0]["contamination_frac"] == 1.0


def test_scrub_pii_golden(spark):
    """Planted PII of each type is redacted and counted; clean text
    passes through byte-identical; a pattern-overlap edge (IP inside
    an email-like string that fails the TLD rule) behaves the same
    as the documented order-of-application semantics."""
    docs = spark.createDataFrame(
        [
            (0, "mail a.b@x.io or c@y.org, ip 10.0.0.1 call 555-123-4567"),
            (1, "clean text with no pii at all"),
            (2, "edge a@10.0.0.1 and 999.999.999.999"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curate.scrub_pii(docs).collect()}
    assert rows[0]["text"] == "mail <EMAIL> or <EMAIL>, ip <IPV4> call <PHONE>"
    assert (rows[0]["n_email"], rows[0]["n_ipv4"], rows[0]["n_phone"],
            rows[0]["n_pii"]) == (2, 1, 1, 4)
    assert rows[1]["text"] == "clean text with no pii at all"
    assert rows[1]["n_pii"] == 0
    # a@10.0.0.1 is NOT an email (no alpha TLD) so its IP is redacted
    assert rows[2]["text"] == "edge a@<IPV4> and <IPV4>"
    assert (rows[2]["n_email"], rows[2]["n_ipv4"]) == (0, 2)


def test_random_string_parity_minhash_simhash_vs_python_twin(spark):
    """Seeded random sweep: MinHash signatures (both plan shapes) and
    SimHash must match a pure-Python twin (hashlib.md5 over UTF-8,
    same K-M mix / per-bit sums) on arbitrary strings — tabs,
    unicode, control chars, multi-space runs, empty docs.  The
    DuckDB oracle covers realistic corpus text at sf0.01; this
    covers the byte-level edges it can't enumerate, and pins the
    hash family itself (a silent md5-substring or mix change would
    still pass structural tests like co-bucketing)."""
    import hashlib
    import random

    from neosearch_spark.oracle import tokenize

    rng = random.Random(20260820)
    alphabet = "ab YZ09._-'\"\\$;() \t\n\r\x0b  éÓß中日́\x00\x1f"
    texts = ["", " ", "a", "a  b", "x x x"]
    for _ in range(200):
        n = rng.randint(0, 40)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    mask = (1 << 60) - 1
    n_hashes, bits = 6, 16

    def py_minhash(text):
        toks = {t for t in tokenize(text) if t != ""}
        if not toks:
            return None
        pairs = []
        for t in toks:
            d = hashlib.md5(t.encode("utf-8")).hexdigest()
            pairs.append((int(d[0:15], 16), int(d[16:27], 16)))
        return tuple(
            min((h1 + i * h2) & mask for h1, h2 in pairs)
            for i in range(n_hashes)
        )

    def py_simhash(text):
        occ = [t for t in tokenize(text) if t != ""]
        if not occ:
            return None
        sums = [0] * bits
        for t in occ:
            h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[0:15], 16)
            for j in range(bits):
                sums[j] += ((h >> j) & 1) * 2 - 1
        return sum(1 << j for j in range(bits) if sums[j] > 0)

    want_mh = {i: py_minhash(t) for i, t in enumerate(texts)}
    want_sh = {i: py_simhash(t) for i, t in enumerate(texts)}

    for shape in ("grouped", "rowlocal"):
        got = {
            r["doc_id"]: tuple(r[f"mh{i}"] for i in range(n_hashes))
            for r in dedup.minhash_signatures(
                docs, n_hashes=n_hashes, shape=shape
            ).collect()
        }
        assert got == {i: s for i, s in want_mh.items() if s is not None}, shape

    got_sh = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(docs, bits=bits).collect()
    }
    assert got_sh == {i: s for i, s in want_sh.items() if s is not None}


def test_random_string_parity_curation_ops_vs_python_twin(spark):
    """Seeded random sweep for the r5 curation ops: repetition
    features, 3-gram contamination, and PII scrubbing must match
    pure-Python twins on arbitrary strings (unicode, control chars,
    multi-space runs, digit soup that brushes the IP/phone regexes).
    The DuckDB oracle covers realistic corpus text; this pins the
    token/regex semantics on inputs it can't enumerate."""
    import hashlib
    import random
    import re as _re
    from collections import Counter

    from neosearch_spark.oracle import tokenize

    rng = random.Random(20260821)
    alphabet = "ab YZ09._-'@\"\\$;() \t\n\r  éÓß中日 0123456789."
    texts = ["", " ", "a b a b a b", "1.2.3.4 x@y.io 555-123-4567"]
    for _ in range(150):
        n = rng.randint(0, 48)
        texts.append("".join(rng.choice(alphabet) for _ in range(n)))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def ftoks(text):
        return [t for t in tokenize(text) if t != ""]

    # --- repetition twin ---
    def py_rep(text):
        toks = ftoks(text)
        nt, nd = len(toks), len(set(toks))
        bgs = Counter(
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        )
        nb = sum(bgs.values())
        top = max(bgs.values()) if bgs else 0
        dup = sum(c for c in bgs.values() if c >= 2)
        r = lambda x: round(x, 6)  # noqa: E731
        return (
            nt, nb,
            r(top / nb) if nb else 0.0,
            r(dup / nb) if nb else 0.0,
            r((nt - nd) / nt) if nt else 0.0,
        )

    got = {r["doc_id"]: tuple(r)[1:]
           for r in textstats.repetition_stats(docs).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_rep(t), repr(t)

    # --- contamination twin (n=3 so random text can actually hit) ---
    mask_n = 3
    bench_texts = texts[:40]
    bench = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench_texts)],
        "doc_id long, text string",
    )

    def py_grams(text):
        toks = ftoks(text)
        out = set()
        for i in range(len(toks) - mask_n + 1):
            g = " ".join(toks[i:i + mask_n])
            out.add(int(hashlib.md5(g.encode("utf-8")).hexdigest()[0:15], 16))
        return out

    bench_set = set().union(*[py_grams(t) for t in bench_texts]) if bench_texts else set()

    def py_con(text):
        g = py_grams(text)
        hits = len(g & bench_set)
        return (
            len(g), hits,
            round(hits / len(g), 6) if g else 0.0,
            hits > 0,
        )

    got_c = {r["doc_id"]: tuple(r)[1:]
             for r in curate.contamination_check(docs, bench, n=mask_n).collect()}
    for i, t in enumerate(texts):
        assert got_c[i] == py_con(t), repr(t)

    # --- PII twin (python re: same span semantics for \b + classes) ---
    def py_pii(text):
        red = text
        counts = []
        for name, pat in curate.PII_PATTERNS.items():
            counts.append(len(_re.findall(pat, text)))
        for name, pat in curate.PII_PATTERNS.items():
            red = _re.sub(pat, f"<{name.upper()}>", red)
        return (red, *counts, sum(counts))

    got_p = {r["doc_id"]: tuple(r)[1:]
             for r in curate.scrub_pii(docs).collect()}
    for i, t in enumerate(texts):
        assert got_p[i] == py_pii(t), repr(t)


def test_simhash_close_for_neardups(spark, dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(dup_docs, bits=32).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert sh[0] == sh[1]
    assert hamming(sh[0], sh[3]) <= hamming(sh[0], sh[4])


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((20, 8))
    base[1] = base[0] + 0.01 * rng.standard_normal(8)  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_finds_neardup(spark, vectors):
    top = ann.cosine_topk(vectors, query_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 1
    assert top[0]["cosine"] > 0.99


def test_numpy_variant_matches_sql_variant(spark, vectors):
    qv = np.array(vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"])
    a = [(r["vec_id"], round(r["cosine"], 6))
         for r in ann.cosine_topk(vectors, 0, k=5).collect()]
    b = [(r["vec_id"], round(r["cosine"], 6))
         for r in ann.cosine_topk_numpy(vectors.where(F.col("vec_id") != 0), qv, k=5).collect()]
    assert a == b


def test_lsh_bucketed_pairs_subset_of_exact(spark, vectors):
    exact = {(r["id_a"], r["id_b"]) for r in ann.cosine_pairs_above(vectors, 0.9).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in ann.lsh_bucketed_pairs(vectors, 0.9, n_planes=4, dim=8).collect()}
    assert lsh <= exact
    assert (0, 1) in exact


def test_minhash_lsh_measured_recall(spark):
    """MEASURED recall of the LSH banding path (the `no_oracle` gate's
    quantitative story): plant near-dup pairs of known Jaccard
    (20-token docs, 2 tokens replaced → J = 18/22 ≈ 0.82), then
    check how many planted pairs the banding co-buckets.  With 4
    bands of 4 rows the S-curve gives P(candidate) = 1-(1-0.82^4)^4
    ≈ 0.90; the corpus and hashes are deterministic, so the measured
    recall is stable — assert a 0.70 floor (and that non-dup pairs
    stay un-bucketed: precision side is the existing subset test)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(5000)]
    rows, planted = [], []
    did = 0
    for i in range(60):
        toks = list(rng.choice(len(vocab), size=20, replace=False))
        rows.append((did, " ".join(vocab[t] for t in toks)))
        mut = list(toks)
        for j in rng.choice(20, size=2, replace=False):
            mut[j] = int(rng.integers(0, 5000))
        rows.append((did + 1, " ".join(vocab[t] for t in mut)))
        planted.append((did, did + 1))
        did += 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    n_hashes, band_size = 16, 4
    sigs = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(n_hashes)]
        for r in dedup.minhash_signatures(docs, n_hashes=n_hashes).collect()
    }
    def bands(s):
        return [tuple(s[b * band_size:(b + 1) * band_size])
                for b in range(n_hashes // band_size)]
    def co_bucketed(a, b):
        return any(x == y for x, y in zip(bands(sigs[a]), bands(sigs[b])))

    hits = sum(1 for a, b in planted if co_bucketed(a, b))
    recall = hits / len(planted)
    assert recall >= 0.70, f"LSH recall {recall:.2f} below floor"
    # unrelated docs (disjoint-ish token sets) must not co-bucket
    false_pairs = sum(
        1 for a, b in [(0, 2), (4, 10), (20, 50), (8, 62), (30, 100)]
        if co_bucketed(a, b)
    )
    assert false_pairs == 0


def test_ivf_measured_recall_and_nprobe_monotone(spark):
    """MEASURED recall@10 of IVF vs exact cosine (the `ann_ivf_topk`
    gate's quantitative story) on a clustered corpus, plus the probe
    monotonicity theorem: a larger nprobe's candidate set is a
    superset (argsort prefix), so recall can only rise."""
    rng = np.random.default_rng(3)
    dim, n_clusters = 16, 6
    # heavily-overlapping clusters: true neighbors straddle inverted
    # lists, so the recall/nprobe tradeoff is actually exercised
    # (measured on this seeded corpus: 0.688 @ nprobe=1, 0.850 @ 2,
    # 1.0 @ full probe)
    centers = rng.standard_normal((n_clusters, dim)) * 0.5
    vecs = np.concatenate(
        [centers[c] + rng.standard_normal((50, dim)) for c in range(n_clusters)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    cents = ann.ivf_train_centroids(df, n_centroids=n_clusters, n_iters=3, dim=dim)

    queries = vecs[rng.choice(len(vecs), size=8, replace=False)] + 0.1
    def recall_at(nprobe):
        tot = 0.0
        for qv in queries:
            exact = [r["vec_id"] for r in
                     ann.cosine_topk_numpy(df, qv, k=10).collect()]
            got = [r["vec_id"] for r in
                   ann.ivf_topk(df, qv, cents, k=10, nprobe=nprobe).collect()]
            tot += len(set(exact) & set(got)) / 10
        return tot / len(queries)

    r1, r2 = recall_at(1), recall_at(2)
    assert r2 >= r1
    assert r2 >= 0.75, f"IVF recall@10 nprobe=2/6 is {r2:.2f}, below floor"
    assert recall_at(n_clusters) == 1.0  # full probe ≡ exact


def test_ivf_full_probe_equals_exact(spark, vectors):
    """Probing every inverted list must reproduce the exact top-k —
    IVF's approximation comes ONLY from probing fewer lists."""
    cents = ann.ivf_train_centroids(vectors, n_centroids=4, n_iters=2, dim=8)
    qv = np.array(
        vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"], dtype=np.float64
    )
    exact = [
        (r["vec_id"], r["cosine"])
        for r in ann.cosine_topk(vectors, query_vec_id=0, k=5).collect()
    ]
    full = [
        (r["vec_id"], r["cosine"])
        for r in ann.ivf_topk(
            vectors.where(F.col("vec_id") != 0), qv, cents, k=5, nprobe=4
        ).collect()
    ]
    assert full == exact


def test_ivf_probe_subset_and_deterministic(spark, vectors):
    cents1 = ann.ivf_train_centroids(vectors, n_centroids=4, n_iters=2, dim=8)
    cents2 = ann.ivf_train_centroids(vectors, n_centroids=4, n_iters=2, dim=8)
    assert np.allclose(cents1, cents2)  # seeded → identical
    qv = np.array(
        vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"], dtype=np.float64
    )
    exact_scores = {
        r["vec_id"]: r["cosine"]
        for r in ann.cosine_topk(vectors, query_vec_id=0, k=19).collect()
    }
    probe1 = ann.ivf_topk(
        vectors.where(F.col("vec_id") != 0), qv, cents1, k=5, nprobe=1
    ).collect()
    # every returned cosine is the true cosine for that id (IVF only
    # restricts the candidate set, never alters scores)
    for r in probe1:
        assert abs(exact_scores[r["vec_id"]] - r["cosine"]) < 1e-9


def test_quality_stats(spark, dup_docs):
    out = {r["doc_id"]: r for r in textstats.quality_stats(dup_docs).collect()}
    assert out[0]["n_tokens"] == 4
    assert out[0]["ttr"] == 1.0
    assert out[0]["stopword_ratio"] == 0.25  # 'the'
    assert 0.0 <= out[4]["quality"] <= 1.0


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog is here"),
        (1, "el perro de la casa que ladra"),
        (2, "der hund und die katze das haus"),
        (3, "le chat et la maison les arbres"),
        (4, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(df).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "de" and out[3] == "fr"
    assert out[4] == "und"


def test_fingerprints_order_insensitive(spark, dup_docs):
    fp = {r["doc_id"]: r for r in textstats.fingerprints(dup_docs).collect()}
    assert fp[0]["text_md5"] == fp[1]["text_md5"]
    assert fp[0]["content_md5"] == fp[5]["content_md5"]  # shuffled tokens
    assert fp[0]["text_md5"] != fp[5]["text_md5"]


def test_multimodal_features_deterministic(spark):
    media = multimodal.synth_media(spark, 30, seed=1)
    f1 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media, dim=8).collect()}
    f2 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media, dim=8).collect()}
    assert f1 == f2
    assert len(f1) == 30 and len(f1[0]) == 8


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, 30, seed=1)
    frames = multimodal.frame_sample_plan(media, every_ms=500)
    rows = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in rows)


def test_jaccard_df_cap_excludes_hot_token(spark):
    """A token with df > max_token_df must not GENERATE candidate
    pairs (the quadratic-bucket guard), while pairs found via rarer
    tokens keep EXACT scores (full token sets in the intersection)."""
    from neosearch_spark.ops.dedup import jaccard_pairs

    rows = [
        (1, "common alpha beta"),
        (2, "common gamma delta"),
        (3, "common alpha beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.1).collect()
    }
    # 'common' (df=3) connects everything when uncapped
    assert set(uncapped) == {(1, 2), (1, 3), (2, 3)}
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.1, max_token_df=2).collect()
    }
    # only (1,3) shares a token under the cap; its score still counts
    # 'common' in the intersection (exact jaccard = 1.0)
    assert set(capped) == {(1, 3)}
    assert capped[(1, 3)] == 1.0
    assert uncapped[(1, 3)] == 1.0


def test_jaccard_df_cap_engages_by_default(spark):
    """max_token_df defaults to 10_000 (VERDICT r3 #5): a stop-word-
    like token with df > 10_000 must not generate candidates under
    DEFAULT arguments — the quadratic blow-up is opt-in (None), not
    opt-out."""
    from pyspark.sql import functions as F

    from neosearch_spark.ops.dedup import jaccard_pairs

    n = 10_050
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hot u"), F.col("id").cast("string")).alias("text"),
    )
    # planted rare pair: two extra docs sharing a rare token
    extra = spark.createDataFrame(
        [(n, "hot rare x1"), (n + 1, "hot rare x2")], "doc_id long, text string"
    )
    docs = docs.unionByName(extra)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.1).collect()
    }
    # 'hot' (df = 10_052 > default cap) generated nothing; the rare
    # token still pairs the planted docs, scored with 'hot' included
    # (intersection {hot, rare} of 3-token sets → J = 2/4 = 0.5)
    assert pairs == {(n, n + 1)}


def test_ivf_large_quantizer_numpy_path(spark):
    """64-centroid × 256-dim quantizer: assignment must route through
    the mapInPandas matmul (no 64-struct ``greatest`` expression —
    the Catalyst plan/codegen blow-up guard) and stay exact under a
    full probe."""
    import numpy as np
    from pyspark.sql import functions as F

    n, dim = 300, 256
    rng = np.random.default_rng(5)
    data = [(int(i), rng.standard_normal(dim).tolist()) for i in range(n)]
    vecs = spark.createDataFrame(data, "vec_id long, embedding array<double>")

    cents = ann.ivf_train_centroids(vecs, n_centroids=64, n_iters=1, dim=dim)
    assert cents.shape == (64, dim)
    assigned = ann.assign_centroids(vecs, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "greatest" not in plan.lower()

    qv = np.asarray(data[0][1], dtype=np.float64)
    exact = [r["vec_id"] for r in ann.cosine_topk(vecs, 0, k=10).collect()]
    full_probe = [
        r["vec_id"]
        for r in ann.ivf_topk(
            vecs.where(F.col("vec_id") != 0), qv, cents, k=10, nprobe=64
        ).collect()
    ]
    assert full_probe == exact


def test_lsh_large_plane_set_numpy_path(spark, vectors):
    """Past the literal-expression cap the LSH signature computes as
    a numpy matmul; bucketing stays deterministic."""
    import numpy as np

    big = ann.hyperplane_lsh_buckets(vectors, n_planes=16, seed=3, dim=8)
    # force the numpy path by shrinking the cap
    old = ann.EXPR_CENTROID_MAX_CELLS
    ann.EXPR_CENTROID_MAX_CELLS = 1
    try:
        np_path = ann.hyperplane_lsh_buckets(vectors, n_planes=16, seed=3, dim=8)
        a = {r["vec_id"]: r["bucket"] for r in big.collect()}
        b = {r["vec_id"]: r["bucket"] for r in np_path.collect()}
        assert a == b
    finally:
        ann.EXPR_CENTROID_MAX_CELLS = old


def test_ppm_roundtrip_and_wav_roundtrip():
    """The REAL in-container decoders: byte-exact round-trips."""
    img = (np.arange(24 * 32 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    img = img.reshape(24, 32, 3)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(img)), img)
    # comment + extra whitespace in the header must parse too
    with_comment = b"P6\n# a comment\n 32 24\n255\n" + img.tobytes()
    assert np.array_equal(multimodal.decode_ppm(with_comment), img)

    s = (np.sin(2 * np.pi * 440 * np.arange(800) / 16000) * 16000).astype(np.int16)
    rate, back = multimodal.decode_wav(multimodal.encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(back, s)


def test_real_decoder_features_physical():
    """Extracted features carry real physical meaning: a sine's RMS
    is amplitude/sqrt(2), its zero-crossing rate tracks 2f/sr, and a
    uniform-color image has zero std and a one-bin luma histogram."""
    rate, amp, freq = 16000, 0.5 * 32767, 1000
    s = (np.sin(2 * np.pi * freq * np.arange(1600) / rate) * amp).astype(np.int16)
    f = multimodal.audio_features(rate, s, dim=8)
    assert abs(f[0] - 0.1) < 1e-9                    # duration 0.1s
    assert abs(f[1] - 0.5 / np.sqrt(2)) < 0.01       # RMS
    assert abs(f[2] - 2 * freq / rate) < 0.01        # ZCR
    img = np.full((10, 10, 3), 200, dtype=np.uint8)
    g = multimodal.image_features(img, dim=10)
    assert np.allclose(g[:3], 200) and np.allclose(g[3:6], 0)
    assert g[6:].sum() == pytest.approx(1.0)         # histogram mass


def test_real_decoder_end_to_end(spark):
    """synth_decodable_media → extract_features(decoder=real_decoder)
    runs the REAL decode distributed (mapInPandas) and yields
    deterministic, format-correct features for both modalities."""
    media = multimodal.synth_decodable_media(spark, 24, seed=5)
    out = multimodal.extract_features(
        media, dim=12, decoder=multimodal.real_decoder
    ).collect()
    assert len(out) == 24
    feats = {r["media_id"]: r["feature"] for r in out}
    kinds = {r["media_id"]: r["kind"] for r in out}
    for mid, f in feats.items():
        assert len(f) == 12
        if kinds[mid] == "audio":
            assert abs(f[0] - 0.05) < 1e-9  # synth tones are 50 ms
        else:
            assert 0 <= f[0] <= 255  # channel mean in pixel range
    # deterministic across runs
    again = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(
            media, dim=12, decoder=multimodal.real_decoder
        ).collect()
    }
    assert feats == again


def test_multimodal_injected_decoder(spark):
    """The decode seam: a caller-supplied decoder callable replaces
    the stub without touching the engine (schema, batching, plumbing
    unchanged)."""
    import numpy as np

    media = multimodal.synth_media(spark, 20, seed=2)

    def hist_decoder(payload: bytes, dim: int):
        arr = np.frombuffer(payload, dtype=np.uint8)
        return np.bincount(arr % dim, minlength=dim).astype(np.float64)

    got = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media, dim=16, decoder=hist_decoder).collect()
    }
    for r in media.collect():
        want = hist_decoder(bytes(r["payload"]), 16)
        assert got[r["media_id"]] == want.tolist()


def test_embedding_neardup_exact_and_lsh(spark, vectors):
    """Embedding-cosine near-dup dedup: vec 1 (a perturbed copy of
    vec 0) must lose to the min-id survivor; the LSH variant may only
    MISS pairs (recall < 1), so every exact survivor also survives
    under LSH."""
    exact = [r["vec_id"] for r in dedup.embedding_neardup(vectors, 0.95).collect()]
    assert 0 in exact and 1 not in exact
    lsh = [
        r["vec_id"]
        for r in dedup.embedding_neardup(
            vectors, 0.95, use_lsh=True, n_planes=4, dim=8
        ).collect()
    ]
    assert set(exact) <= set(lsh)


def _winnow_py(text, k=5, window=4, hasher=None):
    """Pure-Python winnowing oracle (selection rule shared by both
    Spark variants)."""
    import hashlib

    def md5h(s):
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

    h = hasher or md5h
    norm = text.strip(" ").lower()
    if len(norm) < k:
        return []
    grams = [h(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    if len(grams) <= window:
        return [min(grams)]
    return sorted(
        {min(grams[j : j + window]) for j in range(len(grams) - window + 1)}
    )


def test_winnow_fingerprints_match_python_oracle(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox leaps over the lazy dog"),
        (2, "completely different content here"),
        (3, "tiny"),       # shorter than k
        (4, "exact"),      # exactly k chars -> one gram
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["fingerprints"])
        for r in textstats.winnow_fingerprints(docs).collect()
    }
    for i, t in rows:
        assert got[i] == _winnow_py(t), (i, t)
    # the winnowing guarantee: docs 0 and 1 share a long substring
    # (>= k + window - 1 chars) -> must share a fingerprint
    assert set(got[0]) & set(got[1])
    assert not (set(got[0]) & set(got[2]))


def test_winnow_rolling_matches_python_oracle(spark):
    base, mod = 257, (1 << 31) - 1

    def poly(s):
        acc = 0
        for ch in s.encode("utf-8"):
            acc = (acc * base + ch) % mod
        return acc

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "shared middle segment appears here too"),
        (2, "xy"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["fingerprints"])
        for r in textstats.winnow_fingerprints_rolling(docs).collect()
    }
    for i, t in rows:
        assert got[i] == _winnow_py(t, hasher=poly), (i, t)


def test_winnow_candidates_find_neardups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog at noon"),
        (2, "entirely unrelated text with nothing in common at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in textstats.winnow_candidates(docs, min_shared=2).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


# --------------------------------------------------------- curation


def test_pack_shards_matches_global_window(spark):
    """Two-pass partition-offset prefix sum ≡ a global window, at
    several partition counts (the scale-correctness property: shard
    assignment must not depend on layout)."""
    from pyspark.sql import Window

    from neosearch_spark.analyzer import doc_len_col
    from neosearch_spark.ops import curate
    from neosearch_spark.synth import synth_transcripts
    from neosearch_spark.docids import assign_doc_ids

    docs = assign_doc_ids(synth_transcripts(spark, 400, seed=13)).cache()
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r["doc_id"], r["n_tokens"], r["shard_id"])
        for r in docs.select(
            "doc_id", doc_len_col(F.col("text")).alias("n_tokens")
        )
        .withColumn(
            "shard_id",
            (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 64).cast("long"),
        )
        .collect()
    }
    for nparts in (1, 3, 8):
        got = {
            (r["doc_id"], r["n_tokens"], r["shard_id"])
            for r in curate.pack_shards(
                docs, budget=64, num_partitions=nparts
            ).collect()
        }
        assert got == want, nparts


def test_pack_shards_budget_property(spark):
    """Every shard except possibly its last doc fits the budget: a
    doc starts in shard k iff its starting offset is in
    [k*budget, (k+1)*budget)."""
    from neosearch_spark.ops import curate
    from neosearch_spark.synth import synth_transcripts
    from neosearch_spark.docids import assign_doc_ids

    docs = assign_doc_ids(synth_transcripts(spark, 300, seed=14))
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["shard_id"])
        for r in curate.pack_shards(docs, budget=100).collect()
    )
    offset = 0
    for _, n, shard in rows:
        assert shard == offset // 100
        offset += n


def test_sample_hash_layout_independent_and_stratified(spark):
    from neosearch_spark.ops import curate

    rows = [(i, "en" if i % 3 else "fr") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {
        r["doc_id"]
        for r in curate.sample_hash(docs, rate=0.3, seed=5).collect()
    }
    b = {
        r["doc_id"]
        for r in curate.sample_hash(
            docs.repartition(13), rate=0.3, seed=5
        ).collect()
    }
    assert a == b, "sample must not depend on partition layout"
    assert abs(len(a) / 2000 - 0.3) < 0.05
    # different seed → different (but still ~30%) sample
    c = {
        r["doc_id"]
        for r in curate.sample_hash(docs, rate=0.3, seed=6).collect()
    }
    assert c != a and abs(len(c) / 2000 - 0.3) < 0.05
    # stratified: per-lang rates honored
    s = curate.sample_hash(
        docs, rate=0.0, seed=5, strata_col="lang",
        strata_rates={"en": 0.5, "fr": 0.1},
    ).groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in s}
    n_en = sum(1 for _, l in rows if l == "en")
    n_fr = 2000 - n_en
    assert abs(by.get("en", 0) / n_en - 0.5) < 0.07
    assert abs(by.get("fr", 0) / n_fr - 0.1) < 0.07


def test_dedup_against_finds_cross_snapshot_dups(spark):
    corpus = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, "ALPHA  beta"), (101, "Gamma Delta"), (102, "unseen text")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["dup_of"])
        for r in dedup.dedup_against(batch, corpus).collect()
    }
    # normalization: lowercase+trim (internal double space ≠ single)
    assert got == {(101, 1)}
    batch2 = spark.createDataFrame(
        [(100, "Alpha Beta")], "doc_id long, text string"
    )
    assert {
        (r["doc_id"], r["dup_of"])
        for r in dedup.dedup_against(batch2, corpus).collect()
    } == {(100, 0)}


def test_dedup_against_confirm_modes_and_band_guard(spark):
    corpus = spark.createDataFrame(
        [(i, f"text number {i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100 + j, f"text number {j}") for j in range(8)],
        "doc_id long, text string",
    )
    # no hash collisions in clean data → the confirm join changes
    # nothing (it only ever REMOVES false positives)
    a = sorted(
        (r["doc_id"], r["dup_of"])
        for r in dedup.dedup_against(batch, corpus, confirm=True).collect()
    )
    b = sorted(
        (r["doc_id"], r["dup_of"])
        for r in dedup.dedup_against(batch, corpus, confirm=False).collect()
    )
    assert a == b
    # batch docs 100..104 duplicate corpus texts 'text number 0..4';
    # dup_of is the smallest matching corpus id (= j itself here);
    # 105..107 have no corpus match
    assert a == [(100 + j, j) for j in range(5)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        dedup.minhash_lsh_buckets(corpus, n_hashes=10, band_size=4)
