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

from kinesis_app_spark.pinning import pin

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
    # pinned: bf feeds the final join AND the corpus bigram table, and
    # bcnt feeds the join, the context counts AND the vocabulary —
    # without the pins the tokenize+explode pass re-ran once per
    # consumer (10 duplicated scans in the before plan)
    bf = big.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    ).transform(pin, eager=False)
    bcnt = bf.groupBy("w1", "w2").agg(
        F.sum("tf").alias("c12")
    ).transform(pin, eager=False)
    ccnt = bcnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V = distinct unigram tokens over both positions; the DISTINCT
    # bigram table spans the identical token set as the instance table
    # (dedup cannot change a distinct count), at a fraction of the rows
    vocab = (
        bcnt.select(F.col("w1").alias("tok"))
        .union(bcnt.select(F.col("w2").alias("tok")))
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


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal at segment granularity (the
    CCNet / RefinedWeb "line dedup" step): split each document into
    consecutive ``seg_tokens``-token segments, count each distinct
    segment's document frequency across the WHOLE corpus, drop every
    segment appearing in >= ``min_df`` documents, and reassemble the
    surviving segments in order.

    Returns (id, n_segments, n_dropped, clean_text); a document whose
    segments are all boilerplate comes back with clean_text = ''.

    Scale notes (100 TB):
    - Two keyed shuffles, both on bounded-width keys: (segment) for the
      corpus-wide document-frequency aggregate — map-side combined — and
      (doc id) for reassembly. Full documents never shuffle; only
      seg_tokens-token strings do.
    - At petabyte scale swap the DF-count group key for
      xxhash64(segment) so the shuffle carries 8-byte keys; semantics
      are identical modulo 64-bit collisions. The boilerplate set
      (df >= min_df) is typically tiny and could instead be collected
      into a broadcast filter, trading the reassembly join for a
      broadcast hash lookup.
    - No Python anywhere: tokenization, segmentation, and reassembly
      are Column expressions inside whole-stage codegen.
    """
    n_seg = F.ceil(F.size(tokens(F.col(text_col))) / F.lit(seg_tokens)).cast(
        "int"
    )
    # sequence(0, n-1) is invalid when n = 0 (Spark infers step -1):
    # guard empty docs to an empty segment array.
    segs = F.when(
        n_seg >= 1,
        let_bound(
            tokens(F.col(text_col)),
            lambda toks: F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.struct(
                    i.cast("int").alias("seg_idx"),
                    F.array_join(
                        F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
                    ).alias("seg"),
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<seg_idx:int,seg:string>>"))
    exploded = (
        spread(df)
        .select(F.col(id_col), F.explode(segs).alias("s"))
        .select(id_col, F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
    )
    dfreq = exploded.groupBy("seg").agg(
        F.countDistinct(id_col).alias("seg_df")
    )
    kept = exploded.join(dfreq, "seg")
    dropped = F.col("seg_df") >= F.lit(min_df)
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(dropped.cast("long")).alias("n_dropped"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~dropped, F.struct("seg_idx", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 10,
) -> DataFrame:
    """Exact duplicated-substring statistics per document (the span-level
    dedup of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499 — scaled to token ``ngram`` grams
    instead of a 50-token suffix-array threshold): a position is
    duplicated if the ``ngram``-token gram starting there occurs more
    than once in the ENTIRE corpus (cross- or within-document); maximal
    runs of overlapping/adjacent duplicated grams are merged into spans.

    Returns (id, n_spans, dup_tokens, total_tokens, dup_frac) for every
    document, zero-filled for documents with no duplicated span.

    Scale notes (100 TB):
    - The suffix array of the original paper is replaced by its
      shuffle-native equivalent: stride-1 gram postings keyed by the
      gram — one map-side-combined count shuffle — then a per-document
      sort-window interval merge, which shuffles (doc, start, end)
      triples only, never text.
    - Gram strings are bounded (ngram tokens); at petabyte scale key the
      frequency count by xxhash64(gram) for an 8-byte shuffle key.
    - The interval merge is the standard gaps-and-islands window (max
      running end, cumulative island sum) — one shuffle on doc id,
      whole-stage codegen, no Python, no iteration.
    """
    base = spread(df).select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("toks"),
    )
    with_n = base.withColumn("n", F.size("toks"))
    occ = (
        with_n.select(
            id_col,
            "toks",
            F.explode(
                F.when(
                    F.col("n") >= ngram,
                    F.sequence(F.lit(1), F.col("n") - F.lit(ngram - 1)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("start"),
        )
        .select(
            id_col,
            "start",
            F.array_join(F.slice("toks", F.col("start"), ngram), " ").alias(
                "gram"
            ),
        )
    )
    # corpus frequency per gram as a COUNT OVER (PARTITION BY gram)
    # window: ONE shuffle of the postings computes each occurrence's
    # frequency in place — the groupBy+join-back formulation this
    # replaces shuffled the postings twice AND re-ran the tokenize/
    # slice/join projection on the second pass (measured ~35% of the
    # operator's time at sf0.1)
    from pyspark.sql import Window

    w_gram = Window.partitionBy("gram")
    spans = (
        occ.withColumn("freq", F.count(F.lit(1)).over(w_gram))
        .filter(F.col("freq") >= 2)
        .select(
            id_col,
            "start",
            (F.col("start") + F.lit(ngram - 1)).alias("end"),
        )
    )

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        spans.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_island",
            (
                F.col("prev_end").isNull()
                | (F.col("start") > F.col("prev_end") + 1)
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    merged = islands.groupBy(id_col, "island").agg(
        F.min("start").alias("s"), F.max("end").alias("e")
    )
    per_doc = merged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
    )
    totals = with_n.select(id_col, F.col("n").alias("total_tokens"))
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.col("total_tokens").cast("long"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("total_tokens"), 4
        ).alias("dup_frac"),
    )


def source_quota_sample(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document caps (the RefinedWeb / C4 "domain quota"
    step): keep at most ``cap`` documents per source, selected by a
    deterministic md5 order so the sample is stable across runs and
    engines — no rand(), no seed plumbing.

    Returns the kept (id, source, rk) rows, rk = 1..cap within source.

    Scale notes (100 TB): one shuffle on source. A web-scale corpus has
    heavy-tailed sources (a few domains with billions of pages) — the
    row_number window on a hot source is a single-task sort, so for
    those swap in the two-phase variant: filter md5 < t where t
    over-selects ~2x the cap cheaply (scan-local, no shuffle), then
    window only the survivors. The salted-window building block for
    that lives in operators/scale.py.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        spread(df)
        .select(id_col, source_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
    )


# ---------- URL canonicalization / registrable-domain extraction ----------

#: Two-level public suffixes handled by the registrable-domain rule. The
#: real Public Suffix List has ~9k entries and ships as data; this is the
#: documented subset the engine embeds (extend by passing extra_suffixes).
PUBLIC_SUFFIX_2LD = (
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp",
    "com.br", "co.in", "com.cn", "co.kr", "com.mx", "co.nz",
)


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Web-corpus URL canonicalization (the CommonCrawl-curation staple):
    adds three columns derived from ``url_col`` —

    - ``canon_host``: lowercased host with a leading ``www.`` stripped
      (other subdomains are meaningful and kept);
    - ``reg_domain``: the registrable domain — last two labels, or last
      THREE when the last two are a public suffix like ``co.uk`` (the
      key for per-domain quotas, crawls politeness, and domain-level
      dedup; grouping by raw host would split www./cdn. variants,
      grouping by bare TLD would merge the whole of .co.uk);
    - ``canonical_url``: scheme-normalized ``https://`` + canon_host +
      path without its trailing slash + the ``id`` query param if
      present — tracking params (utm_* etc.) and fragments dropped, so
      syntactic variants of the same page compare equal for exact dedup.

    Everything is JVM parse_url/regexp inside one codegen projection:
    zero shuffle, zero Python — at 100 TB this runs at scan speed, and
    downstream groupBys shuffle short domain strings, never pages."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    three = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    suffixes = PUBLIC_SUFFIX_2LD + tuple(extra_suffixes)
    reg_domain = F.when(
        two.isin(*suffixes) & (n >= 3), three
    ).otherwise(two)
    path = F.coalesce(
        F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("")
    )
    path = F.regexp_replace(path, r"/+$", "")
    id_param = F.parse_url(F.col(url_col), F.lit("QUERY"), F.lit("id"))
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(
            id_param.isNotNull(), F.concat(F.lit("?id="), id_param)
        ).otherwise(F.lit("")),
    )
    return (
        df.withColumn("canon_host", host)
        .withColumn("reg_domain", reg_domain)
        .withColumn("canonical_url", canonical)
    )


def paragraph_dedup_first_wins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
) -> DataFrame:
    """Global paragraph-level dedup with first-occurrence survivorship
    (the Dolma/RefinedWeb paragraph-dedup step, distinct from
    segment_dedup's boilerplate REMOVAL): every distinct
    ``seg_tokens``-token segment survives exactly once corpus-wide — in
    the document where it first appears by (doc id, position) — and every
    later occurrence is dropped; documents are reassembled from their
    surviving segments.

    Returns (id, n_segments, n_dup_dropped, clean_text).

    Scale notes (100 TB):
    - The winner per segment is a plain MIN aggregate over the packed
      (doc_id, seg_idx) struct — map-side combinable, NO window function:
      a hot segment (classic boilerplate, df in the millions) folds to
      one row per partition before the shuffle instead of routing every
      occurrence through one window task. The winner set then joins back
      on the segment key.
    - Shuffles carry seg_tokens-token strings at most (xxhash64(segment)
      is the petabyte-scale key swap, same note as segment_dedup);
      whole documents never shuffle.
    - Everything is Column algebra inside whole-stage codegen.
    """
    n_seg = F.ceil(F.size(tokens(F.col(text_col))) / F.lit(seg_tokens)).cast(
        "int"
    )
    segs = F.when(
        n_seg >= 1,
        let_bound(
            tokens(F.col(text_col)),
            lambda toks: F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.struct(
                    i.cast("int").alias("seg_idx"),
                    F.array_join(
                        F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
                    ).alias("seg"),
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<seg_idx:int,seg:string>>"))
    exploded = (
        spread(df)
        .select(F.col(id_col), F.explode(segs).alias("s"))
        .select(
            id_col,
            F.col("s.seg_idx").alias("seg_idx"),
            F.col("s.seg").alias("seg"),
        )
    )
    winners = exploded.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("seg_idx").alias("x"))).alias("w")
    )
    marked = exploded.join(winners, "seg").withColumn(
        "is_first",
        (F.col("w.i") == F.col(id_col)) & (F.col("w.x") == F.col("seg_idx")),
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum((~F.col("is_first")).cast("long")).alias("n_dup_dropped"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_first"), F.struct("seg_idx", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )
