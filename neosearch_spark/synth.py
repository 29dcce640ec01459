"""Deterministic synthetic transcripts table (the BASELINE.json
``input_hint`` corpus shape).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp) — FIXTURES.md F1.  Generated fully
distributed from ``spark.range`` using only built-in expressions
(xxhash64-seeded pseudo-randomness → identical output for a given
(n_turns, seed) at any parallelism level — required for the
two-cluster-size scaling evidence).

Vocabulary is Zipfian (rank drawn log-uniformly → P(rank) ∝ 1/rank)
so genuinely hot terms exist for the skew/salting tests; a small
fraction of rows carry analyzer edge cases (multi-space runs,
punctuation-only tokens, mixed case, single-token texts) mirroring
the reference's golden analyzer tests
(``/root/reference/lib/neosearch/index/index_test.go:197-204``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_PER_CONV = 8
VOCAB = 50_000
ROLES = ["user", "assistant", "tool"]
EDGE_TEXTS = [
    "Neoway Business Solution",
    "Google Inc.",
    "Facebook Company",
    "Neoway Teste",
    "  spaced   out  tokens  ",
    "hyphen - token",
    "singletoken",
    "MiXeD CaSe TeXt",
]


def _u(seed: int, *cols) -> F.Column:
    """Uniform double in [0,1) from xxhash64 — deterministic."""
    h = F.xxhash64(F.lit(seed), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    if num_partitions is None:
        num_partitions = max(4, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_turns, 1, num_partitions)
    cid = (F.col("id") / TURNS_PER_CONV).cast("long")
    tix = F.pmod(F.col("id"), F.lit(TURNS_PER_CONV)).cast("int")

    # 5-15 Zipfian tokens per turn; rank = floor(exp(u * ln(V)))
    n_tok = (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(11)) + 5).cast("int")
    import math

    ln_v = math.log(VOCAB)

    def tok(j):
        u = _u(seed + 2, F.col("id"), j)
        rank = F.floor(F.exp(u * F.lit(ln_v))).cast("long")
        return F.concat(F.lit("tok"), rank.cast("string"))

    words = F.transform(F.sequence(F.lit(0), n_tok - 1), tok)
    normal_text = F.array_join(words, " ")

    # 8/64 = 12.5% of rows get one of the 8 fixed edge-case texts
    # (golden fixture F2/F3 shapes) — a deliberately dup-heavy tail:
    # it exercises hot-term salting in the build and gives the dedup
    # operators real duplicate mass.  (Do NOT retune: every recorded
    # benchmark/baseline was measured on this corpus shape.)
    edge_pick = F.pmod(F.xxhash64(F.lit(seed + 3), F.col("id")), F.lit(64))
    edge_arr = F.array(*[F.lit(t) for t in EDGE_TEXTS])
    text = F.when(
        edge_pick < len(EDGE_TEXTS), F.element_at(edge_arr, edge_pick.cast("int") + 1)
    ).otherwise(normal_text)

    role_arr = F.array(*[F.lit(r) for r in ROLES])
    role = F.element_at(role_arr, F.pmod(tix, F.lit(3)).cast("int") + 1)
    tool = F.when(
        role == "tool",
        F.concat(F.lit("tool_"), F.pmod(F.xxhash64(F.lit(seed + 4), F.col("id")), F.lit(20)).cast("string")),
    ).otherwise(F.lit(""))

    # monotonically increasing within conversation
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + cid * 3600 + tix.cast("long") * 30)

    return base.select(
        F.concat(F.lit("conv-"), F.lpad(cid.cast("string"), 8, "0")).alias("conv_id"),
        tix.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
