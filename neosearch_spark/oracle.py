"""Pure-Python/numpy oracle defining correct semantics for pytest.

Mirrors the reference's semantics where they exist and defines them
where the reference is silent (BM25 — the reference stores no term
frequencies and scores nothing, SURVEY §0) or broken (``$or`` drops
clauses after the first, ``/root/reference/lib/neosearch/search/
search.go:60-68``; we implement the documented union,
``PROPOSAL.md:230-235`` — divergence recorded in SURVEY §2.11.1).

Scoring uses float64 with a FIXED operation order (sum over query
terms in query order, numpy ops) so Spark-side scoring can be made
bit-comparable; rank comparisons additionally round to 9 decimals.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

K1 = 1.2
B = 0.75


def tokenize(text: str) -> list[str]:
    """trim spaces -> lower -> split on single space; empties kept.

    Twin of analyzer.tokens_col (reference ``index.go:510-554``)."""
    return text.strip(" ").lower().split(" ")


def index_terms(text: str) -> list[str]:
    """tokens + whole normalized string when >1 token
    (reference ``index.go:546-553``)."""
    norm = text.strip(" ").lower()
    toks = norm.split(" ")
    if len(toks) > 1:
        return toks + [norm]
    return toks


class OracleIndex:
    """In-memory inverted index over {doc_id: text}."""

    def __init__(self, docs: dict[int, str]):
        self.docs = docs
        self.postings: dict[str, list[int]] = defaultdict(list)  # sorted unique
        self.tf: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        for doc_id in sorted(docs):
            text = docs[doc_id]
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            counts = Counter(index_terms(text))
            for term, c in counts.items():
                self.postings[term].append(doc_id)  # doc_ids visited in order
                self.tf[term][doc_id] = c
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    # --- boolean ops (docID-ascending results, SURVEY §2.11.3) ---

    def term(self, t: str) -> list[int]:
        return list(self.postings.get(t, []))

    def and_(self, terms: list[str]) -> list[int]:
        """Sorted intersection (reference ``search.go:75-106``)."""
        if not terms:
            return []
        res = set(self.term(terms[0]))
        for t in terms[1:]:
            res &= set(self.term(t))
        return sorted(res)

    def or_(self, terms: list[str]) -> list[int]:
        """Documented union semantics (PROPOSAL.md:230-235)."""
        res: set[int] = set()
        for t in terms:
            res |= set(self.term(t))
        return sorted(res)

    def not_(self, include: list[str], exclude: list[str]) -> list[int]:
        return sorted(set(self.and_(include)) - set(self.or_(exclude)))

    def prefix(self, p: str) -> list[int]:
        """Union over terms with prefix, normalized to docID-asc
        (reference first-seen order is divergence §2.11.3)."""
        res: set[int] = set()
        for t, ids in self.postings.items():
            if t.startswith(p):
                res |= set(ids)
        return sorted(res)

    # --- BM25 (north-star addition; Lucene-style idf) ---

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, []))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_scores(self, query: str) -> dict[int, float]:
        qterms = [t for t in tokenize(query) if t != ""]
        scores: dict[int, float] = defaultdict(float)
        for t in qterms:
            idf = self.idf(t)
            for doc_id, tf in self.tf.get(t, {}).items():
                dl = self.doc_len[doc_id]
                tf_norm = (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * dl / self.avgdl)
                )
                scores[doc_id] += idf * tf_norm
        return dict(scores)

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """(doc_id, score) ordered (score desc, doc_id asc)."""
        scores = self.bm25_scores(query)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
