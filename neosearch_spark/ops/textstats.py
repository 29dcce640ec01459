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
    char ratio, plus a composite quality score in [0,1].

    The tokenize+filter and normalize expressions are projected ONCE
    in a first select and the features read them as columns: Spark's
    subexpression elimination skips expressions containing lambda
    variables, so the single-select shape recomputed the token array
    for each of its 4 uses, and CollapseProject keeps the two-stage
    shape split because the aliases are non-cheap and multiply
    referenced.  A/B at sf0.1 (5k docs, local[32], min-of-3, noop
    sink): single-select 1.03 s → two-stage 0.829 s, identical rows.

    Measured and REJECTED (r5): replacing the stopword
    ``array_contains`` linear scan with ``isin`` (Catalyst In→InSet
    hash lookup) — identical rows, 0.372 s vs 0.389 s min-of-3 at
    sf0.1, i.e. no win; the 30-element scan is not the bottleneck at
    this vocabulary size, so the simpler expression stays."""
    base = docs.select(
        "doc_id",
        F.filter(tokens_col(F.col(field)), lambda t: t != "").alias("_toks"),
        norm_col(F.col(field)).alias("_norm"),
    )
    nonempty = F.col("_toks")
    n_tok = F.size(nonempty).cast("long")
    n_dist = F.size(F.array_distinct(nonempty)).cast("long")
    total_len = F.aggregate(
        nonempty, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    norm = F.col("_norm")
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
    return base.select(
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


def repetition_stats(
    docs: DataFrame, field: str = "text", round_to: int = 6
) -> DataFrame:
    """Within-document repetition features — the MassiveText/Gopher
    repetition filter family (Rae et al. 2021, "Scaling Language
    Models", table A1: documents dominated by a few repeated
    n-grams are boilerplate/spam and get dropped before training):

    - ``n_tok``           non-empty tokens
    - ``n_bigrams``       token 2-gram occurrences (= n_tok-1, 0 for
                          0/1-token docs)
    - ``top_bigram_frac`` occurrences of the MOST FREQUENT bigram /
                          n_bigrams ("top n-gram fraction")
    - ``dup_bigram_frac`` occurrences of bigrams appearing ≥2 times /
                          n_bigrams ("duplicate n-gram fraction")
    - ``dup_token_frac``  (n_tok - distinct tokens) / n_tok

    Shape: the bigram array is built ROW-LOCALLY (consecutive pairs
    of the non-empty token sequence via a sequence/transform
    expression), then one explode feeds groupBy(doc_id, bigram) →
    groupBy(doc_id) — two hash exchanges, both reduced by map-side
    partial aggregation (a doc's bigrams sit in one input row, so
    the second shuffle carries one row per doc).  ``explode_outer``
    keeps 0/1-token docs in the output with zero fractions; the
    token-level counts ride the same stream via ``first()`` instead
    of a second scan or a join.  All expressions JVM-side.

    Measured and REJECTED (r5): grouping on a 60-bit md5 of the
    bigram instead of the bigram string to shrink the exchange —
    identical rows, but 2.51 → 2.82 s at sf0.1 (min-of-3): the
    per-occurrence md5 costs more than the saved shuffle bytes on a
    node-local exchange, and unlike the dedup ops the hash isn't
    needed for semantics here.  On a network-bound cluster the
    trade reverses the same way the MinHash ``shape`` knob does —
    revisit there, not by default."""
    toks = F.filter(tokens_col(F.col(field)), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("_toks"))
    nt = F.size(F.col("_toks"))
    # sequence(1, 0) would step DOWNWARD ([1,0]) — guard short docs
    bigrams = F.when(
        nt >= 2,
        F.expr(
            "transform(sequence(1, size(_toks) - 1),"
            " i -> concat(_toks[i-1], ' ', _toks[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select(
        "doc_id",
        nt.cast("long").alias("_nt"),
        F.size(F.array_distinct(F.col("_toks"))).cast("long").alias("_nd"),
        F.explode_outer(bigrams).alias("bg"),
    )
    bc = ex.groupBy("doc_id", "bg").agg(
        F.count(F.col("bg")).cast("long").alias("c"),
        F.first("_nt").alias("_nt"),
        F.first("_nd").alias("_nd"),
    )
    agg = bc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.max("c").cast("long").alias("_max_c"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
        .cast("long")
        .alias("_dup_c"),
        F.first("_nt").alias("_nt"),
        F.first("_nd").alias("_nd"),
    )
    nb = F.col("n_bigrams")
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(0.0), round_to
    )
    return agg.select(
        "doc_id",
        F.col("_nt").alias("n_tok"),
        "n_bigrams",
        frac(F.col("_max_c"), nb).alias("top_bigram_frac"),
        frac(F.col("_dup_c"), nb).alias("dup_bigram_frac"),
        frac(F.col("_nt") - F.col("_nd"), F.col("_nt")).alias("dup_token_frac"),
    )


def lang_id(docs: DataFrame, field: str = "text") -> DataFrame:
    """Stopword-marker language heuristic: score per language =
    marker hits in the token set; argmax with fixed language order
    tie-break ('und' if no hits).

    Distinct-token array projected once, read per-language as a
    column — same two-stage shape (and rationale) as
    ``quality_stats``: lambda-bearing expressions are exempt from
    Spark's subexpression elimination, so the single-select form
    re-tokenized the doc once per language."""
    docs = docs.select(
        "doc_id",
        F.array_distinct(tokens_col(F.col(field))).alias("_dtoks"),
    )
    toks = F.col("_dtoks")
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


def winnow_fingerprints(
    docs: DataFrame,
    field: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the standard rolling-hash near-dup fingerprinting):
    hash every character k-gram of the normalized text, slide a
    window of ``window`` consecutive k-gram hashes, keep the minimum
    hash of each window, return the sorted distinct selection.  A
    shared substring of length ≥ k + window - 1 between two docs
    GUARANTEES a shared fingerprint — the property that makes this a
    recall-safe candidate generator.

    The k-gram hash here is the portable 60-bit md5 hash (same family
    as the dedup ops) so the DuckDB oracle computes identical
    fingerprints; everything is one codegen'd higher-order-function
    expression (no Python).  ``winnow_fingerprints_rolling`` is the
    same selection rule over a true O(len) polynomial ROLLING hash
    (numpy mapInPandas) — the cheaper scale path when k grows.

    Returns (doc_id, fingerprints array<long>)."""
    # guard short docs explicitly: sequence(1, 0) would produce a
    # DESCENDING [1, 0] in Spark, not an empty array
    g = (
        f"CASE WHEN length(_norm) < {k} THEN cast(array() as array<bigint>) "
        f"ELSE transform(sequence(1, length(_norm) - {k - 1}), "
        f"i -> cast(conv(substr(md5(substr(_norm, i, {k})), 1, 15), 16, 10) as bigint)) END"
    )
    fps = (
        "array_sort(array_distinct(transform("
        f"CASE WHEN size(_grams) = 0 THEN cast(array() as array<int>) "
        f"     WHEN size(_grams) <= {window} THEN array(1) "
        f"     ELSE sequence(1, size(_grams) - {window} + 1) END, "
        f"j -> array_min(slice(_grams, j, {window})))))"
    )
    return (
        docs.select("doc_id", norm_col(F.col(field)).alias("_norm"))
        .withColumn("_grams", F.expr(g))
        .select("doc_id", F.expr(fps).alias("fingerprints"))
    )


def winnow_candidates(
    docs: DataFrame,
    field: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
    max_doc_id: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints:
    explode → (cap hot fingerprints at ``max_fp_df`` docs, like the
    Jaccard token-df cap — candidate generation stays bounded at any
    corpus size) → self-join per fingerprint → pairs sharing ≥
    ``min_shared`` fingerprints.  Returns (doc_a, doc_b, n_shared),
    doc_a < doc_b."""
    d = docs if max_doc_id is None else docs.where(F.col("doc_id") < max_doc_id)
    # The identity mapInArrow BETWEEN fingerprint computation and
    # explode is load-bearing: exploding the higher-order-function
    # expression directly makes Generate re-evaluate the whole
    # grams+windows chain per OUTPUT row — O(fps × grams) per doc,
    # measured ~100x slowdown, with or without an exchange in between
    # (an exchange does not stop the regeneration; a materialization
    # barrier does).  The Arrow round-trip materializes each array
    # exactly once and costs only the small (doc_id, fingerprints)
    # rows.
    fps_df = winnow_fingerprints(d, field, k, window)
    fp = fps_df.mapInArrow(lambda it: it, schema=fps_df.schema).select(
        "doc_id", F.explode("fingerprints").alias("fp")
    )
    rare = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_fp_df)
        .select("fp")
    )
    fp = fp.join(rare, "fp")
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def winnow_fingerprints_rolling(
    docs: DataFrame,
    field: str = "text",
    k: int = 5,
    window: int = 4,
    base: int = 257,
    mod: int = (1 << 31) - 1,
) -> DataFrame:
    """Same winnowing selection rule as ``winnow_fingerprints`` but
    over a TRUE rolling polynomial hash, computed batch-vectorized:

    - all texts in an Arrow batch concatenate into one byte blob;
    - prefix sums S(i) = SUM_{j<i} b[j]*B^(-j) (mod m) come from ONE
      numpy cumsum, so every k-gram hash is
      H(i) = (S(i+k) - S(i)) * B^(i+k-1) (mod m) — O(blob) total
      work with no per-byte loop (the classic rolling-hash recurrence
      re-expressed as a scan so it vectorizes);
    - modular power tables build in O(sqrt-ish) scalar steps via the
      i = q*4096 + r decomposition.

    Only the final ragged per-doc window-min/dedup runs as a per-DOC
    loop of numpy slices (output is a ragged array column — same
    bounded pattern as block decoding).  Fingerprint VALUES differ
    from the md5 variant (different hash family); the selection
    semantics are identical and pytest-oracled against a pure-Python
    reimplementation.  m = 2^31 - 1 (prime) keeps every intermediate
    product inside int64."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    C = 1 << 12

    def powmod_array(b: int, n: int, m: int) -> "np.ndarray":
        # b^0..b^(n-1) mod m without an O(n) scalar loop: decompose
        # i = q*C + r, build the two small tables scalar-ly (C and
        # n/C steps), combine vectorized (products < m^2 < 2^62)
        pr = np.empty(min(n, C), dtype=np.int64)
        x = 1
        for r in range(len(pr)):
            pr[r] = x
            x = (x * b) % m
        if n <= C:
            return pr[:n]
        bc = pow(b, C, m)
        nq = (n + C - 1) // C
        pq = np.empty(nq, dtype=np.int64)
        x = 1
        for q in range(nq):
            pq[q] = x
            x = (x * bc) % m
        i = np.arange(n, dtype=np.int64)
        return (pq[i >> 12] * pr[i & (C - 1)]) % m

    binv = pow(base, mod - 2, mod)  # modular inverse (m prime)

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            texts = [t if t is not None else "" for t in pdf["_norm"].tolist()]
            enc = [t.encode("utf-8", "surrogatepass") for t in texts]
            blob = b"\x00".join(enc)
            b = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
            n = len(b)
            if n >= k:
                ip = powmod_array(binv, n, mod)
                terms = (b * ip) % mod
                S = np.zeros(n + 1, dtype=np.int64)
                # cumsum stays < n * m < 2^63 for batch blobs < 4 GB
                np.cumsum(terms, out=S[1:])
                S %= mod
                bp = powmod_array(base, n, mod)
                H = (((S[k:] - S[:-k]) % mod) * bp[k - 1 :]) % mod
            else:
                H = np.empty(0, dtype=np.int64)
            offs = np.cumsum([0] + [len(e) + 1 for e in enc])
            out = []
            for r, (o, ln) in enumerate(zip(offs[:-1], (len(e) for e in enc))):
                ng = max(ln - k + 1, 0)
                g = H[o : o + ng]
                if ng == 0:
                    fps: list[int] = []
                elif ng <= window:
                    fps = [int(g.min())]
                else:
                    fps = sorted(
                        {int(x) for x in sliding_window_view(g, window).min(axis=1)}
                    )
                out.append((int(pdf["doc_id"].iloc[r]), fps))
            yield pd.DataFrame(out, columns=["doc_id", "fingerprints"])

    return docs.select(
        "doc_id", norm_col(F.col(field)).alias("_norm")
    ).mapInPandas(run, schema="doc_id long, fingerprints array<long>")
