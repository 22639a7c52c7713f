"""Training-data curation operators: PII scanning/redaction, benchmark
contamination detection, and unigram-LM quality scoring.

These are the compliance/quality half of an LLM data pipeline (the dedup
half lives in operators/dedup.py). No reference counterpart — the reference
never parses payloads (Processor receives opaque records,
src/Kinesis/Coordination.hs:51-53); this is engine surface per SURVEY.md
§2.2's north-star rows.

Scale notes:
- PII scan/redaction is pure JVM regexp inside whole-stage codegen — a
  per-row map, no shuffle, no Python.
- Contamination broadcasts the BENCHMARK side (benchmark suites are tiny —
  thousands of docs) against the training corpus's shingle postings: the
  100 TB corpus is scanned once and never shuffled; the only aggregation
  state is (train_id, bench_id) pair counts for colliding shingles.
- Unigram scoring shuffles (token) once to build the vocabulary and once
  to score; both are map-side-combined hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_app_spark.functions.text import let_bound, tokens, word_shingles
from kinesis_app_spark.operators.util import spread

#: PII patterns, most-specific first: redaction applies them in this order
#: so e.g. a credit-card number is consumed before the phone pattern could
#: match a substring of it. Same regex dialect subset works in Java (Spark)
#: and RE2 (DuckDB oracle): character classes, bounded repeats, \b, \d.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ccn": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + a fully redacted copy of the text.

    All columns are regexp expressions (count = size of regexp_extract_all,
    redaction = chained regexp_replace with [KIND] placeholders) — JVM-side,
    codegen-eligible, zero shuffles: the operator is a projection.

    Null text scans as empty (counts 0, has_pii false): a scrubbing gate
    must never emit has_pii=NULL, which a downstream NOT-filter would
    silently drop.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.cast("long").alias(f"n_{kind}") for kind, c in counts.items()],
        total.cast("long").alias("pii_total"),
        (total > 0).alias("has_pii"),
        redacted.alias("redacted"),
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_shared: int = 3,
) -> DataFrame:
    """Benchmark contamination: (train_doc, bench_doc) pairs sharing at
    least ``min_shared`` distinct k-word shingles.

    The benchmark side is broadcast (benchmark suites are small by
    construction); the training corpus's shingle postings stream past it —
    one corpus scan, no corpus shuffle, then a (train_id, bench_id)
    hash-aggregate of collision counts. The inverted-index form of the
    n-gram overlap check: never an all-pairs text comparison.

    Returns (train_id, bench_id, n_shared).
    """
    def postings(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(word_shingles(F.col(text_col), k=k)).alias("shingle"),
        )

    train_p = postings(spread(train), "train_id")
    bench_p = postings(bench, "bench_id")
    return (
        train_p.join(F.broadcast(bench_p), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower_q, upper_q] exact
    quantiles (winsorization — the standard numeric-outlier cleaning step
    before training-statistics aggregation).

    Plan: one hash-aggregate computes the tiny per-group quantile table
    (groups x 2 doubles), which broadcasts back onto the stream of rows —
    the data itself is scanned twice but never shuffled (at 100 TB the
    quantile pass can run on a sample; exact here for oracle parity).
    Exact interpolated percentile matches DuckDB's quantile_cont.
    """
    groups = group_cols or []
    q = df.groupBy(*groups).agg(
        F.percentile(value_col, F.lit(lower_q)).alias("__q_lo"),
        F.percentile(value_col, F.lit(upper_q)).alias("__q_hi"),
    )
    joined = df.join(F.broadcast(q), groups) if groups else df.crossJoin(F.broadcast(q))
    return joined.withColumn(
        f"{value_col}_wins",
        F.least(F.greatest(F.col(value_col), F.col("__q_lo")), F.col("__q_hi")),
    ).drop("__q_lo", "__q_hi")


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    add-k-smoothed bigram LM — the next step up from
    :func:`unigram_logprob_scores` as a fluency signal (word-order
    scrambles keep their unigram score but crater here).

    score(d) = mean over bigram instances (w1,w2) of
               ln((c(w1,w2) + k) / (c(w1,·) + k·V))

    with V = corpus unigram vocabulary size. Plan: one explode of the
    per-row bigram array feeds the per-doc counts; the corpus bigram table
    re-aggregates from those (sharing the shuffle), the context counts
    re-aggregate again by w1, and V is a broadcast single row. All
    built-ins; the only Python is plan construction.

    Returns (doc_id, n_bigrams, logprob) with logprob rounded to 3
    decimals for cross-engine float stability (ln of rationals — not on
    rounding boundaries).
    """
    bigram = let_bound(
        tokens(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    big = spread(df).select(F.col(id_col), F.explode(bigram).alias("b")).select(
        id_col, "b.w1", "b.w2"
    )
    bf = big.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    bcnt = bf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    ccnt = bcnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V = distinct unigram tokens: count over the union of both positions
    vocab = (
        big.select(F.col("w1").alias("tok"))
        .union(big.select(F.col("w2").alias("tok")))
        .agg(F.count_distinct("tok").alias("v"))
    )
    return (
        bf.join(bcnt, ["w1", "w2"])
        .join(ccnt, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("tf")
                    * (F.log(F.col("c12") + F.lit(k)) - F.log(F.col("c1") + F.lit(k) * F.col("v")))
                )
                / F.sum("tf"),
                3,
            ).alias("logprob"),
        )
    )


def unigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap fluency/quality signal (gibberish and
    boilerplate-heavy documents score low).

    score(d) = sum_t tf(t,d) * ln(cnt(t)/N) / len(d)

    Plan: one explode of the tokenizer output feeds BOTH the per-doc term
    frequencies and (re-aggregated) the corpus vocabulary — two
    map-side-combined hash aggregates sharing a shuffle key of (token), then
    a token-to-token join that AQE plans as broadcast when the vocab is
    small. No Python anywhere.

    Returns (doc_id, n_tokens, logprob) with logprob rounded to 3 decimals
    for cross-engine float stability.
    """
    toks = spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    totals = vocab.agg(F.sum("cnt").alias("n_total"))
    return (
        tf.join(vocab, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * (F.log("cnt") - F.log("n_total")))
                / F.sum("tf"),
                3,
            ).alias("logprob"),
        )
    )
