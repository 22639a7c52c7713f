"""Third operator battery: LLM-training-data pipeline text operators.

Document chunking (overlapping token windows), TF-IDF top-terms, stratified
source-mixture sampling, and per-language character-trigram profiles — the
corpus-preparation steps a training-data pipeline runs after curation
(operators/pipeline.py) and before tokenization. None exist in the reference
(its only computation surface is the opaque Processor callback,
src/Kinesis/Coordination.hs:51-53); all are mandated by the north-star spec.

Conventions as in registry_funcs.py: JVM-side Column algebra only (no Python
UDFs — chunk slicing and trigram extraction are higher-order-function
lambdas inside whole-stage codegen), aliases shared with the DuckDB oracle,
`let_bound` around every expression referenced from a per-element lambda
(no CSE inside lambdas — see functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.functions import text as T
from kinesis_app_spark.operators.util import spread
from kinesis_app_spark.registry_util import QuerySpec, table as _t

#: chunk geometry: 32-token windows every 24 tokens (8-token overlap).
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


# ---------------------------------------------------------------------
# overlapping token-window chunking
# ---------------------------------------------------------------------

def text_chunking(spark, sf_dir):
    """Split each document into overlapping fixed-size token chunks.

    One narrow pass: tokenize -> per-row transform over the chunk starts
    (sequence(1, n, stride)) -> posexplode. No shuffle at all — chunking is
    embarrassingly parallel, so at 100 TB this runs at scan speed and the
    output keeps the input's partitioning for the downstream tokenizer.
    `let_bound` keeps tokenization O(n) per doc (the start/slice lambdas see
    a bound variable, not the token-array expression).
    """
    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    chunks = T.let_bound(
        T.tokens(F.col("text")),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(CHUNK_STRIDE)),
            lambda s: F.slice(t, s, CHUNK_SIZE),
        ),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").cast("long").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
        )
    )


TEXT_CHUNKING_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), starts AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t), 1), {CHUNK_STRIDE})) AS s
  FROM toks
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_STRIDE} AS INT) AS chunk_idx,
       len(t[s : s + {CHUNK_SIZE - 1}]) AS n_tokens,
       md5(array_to_string(t[s : s + {CHUNK_SIZE - 1}], ' ')) AS chunk_md5
FROM starts
"""


# ---------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------

def tfidf_top_terms(spark, sf_dir):
    """Top-3 terms per document by TF-IDF.

    Plan: explode -> (doc_id, term) count [shuffle 1] -> term doc-frequency
    [shuffle 2, tiny: one row per distinct term] broadcast back -> per-doc
    ranking window [reuses shuffle 1's partitioning by doc_id? no — window
    repartitions by doc_id, shuffle 3 over the already-aggregated rows].
    The two aggregations are partial+final hash aggs; the DF side after agg
    is vocabulary-sized, hence the broadcast join. At 100 TB the vocabulary
    still fits an executor (term dictionary), so the join stays broadcast.
    """
    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    terms = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), df_ AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df_.df,
         round(tf.tf * ln(((SELECT count(*) FROM documents) + 1.0) / (df_.df + 1.0)), 4) AS score
  FROM tf JOIN df_ USING (term)
)
SELECT doc_id, term, tf, df, score, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------
# stratified source-mixture sampling
# ---------------------------------------------------------------------

#: per-language keep rates out of 10 (training-mixture weights):
#: en 80%, de/fr 50%, es 30%, everything else 20%.
_RATE = (
    "CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 5 WHEN 'fr' THEN 5 "
    "WHEN 'es' THEN 3 ELSE 2 END"
)


def stratified_sample_mixture(spark, sf_dir):
    """Deterministic stratified sample: per-language keep rates applied via
    doc_id modulo (reproducible across engines and runs — the property a
    training-data mixture needs for audits), then per-stratum stats.

    The rate predicate is pushed into the scan (doc_id % 10 < rate is a
    deterministic row-local filter); the only shuffle is the tiny
    (lang, source) aggregation. At 100 TB swap doc_id for xxhash64(doc_id)
    if ids are not uniform — the plan shape is identical.
    """
    d = _t(spark, sf_dir, "documents")
    kept = d.filter(F.expr(f"doc_id % 10 < ({_RATE})"))
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(n_chars), 2) AS avg_chars,
       sum(n_chars) AS total_chars
FROM documents
WHERE doc_id % 10 < ({_RATE})
GROUP BY lang, source
"""


# ---------------------------------------------------------------------
# per-language character-trigram profile
# ---------------------------------------------------------------------

def char_trigram_profile(spark, sf_dir):
    """Top-5 character trigrams per language — the statistic behind the
    n-gram language-ID heuristic (operators/textanalysis.lang_id), computed
    corpus-wide so the per-row classifier's tables can be audited/refit.

    Trigram extraction is a per-row lambda (sequence + substr) inside
    codegen — no Python, no shuffle until the (lang, trigram) count. The
    count output is tiny (distinct trigrams), so the ranking window is
    cheap regardless of corpus size.
    """
    from pyspark.sql import Window

    d = spread(_t(spark, sf_dir, "documents").select("lang", "text"))
    tris = T.let_bound(
        T.normalize_ws(F.col("text")),
        lambda s: F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - 2, F.lit(1))),
            lambda i: s.substr(i, F.lit(3)),
        ),
    )
    counts = (
        d.select("lang", F.explode(tris).alias("trigram"))
        .filter(F.length("trigram") == 3)
        .groupBy("lang", "trigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("trigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "trigram", "n", "rnk")
    )


CHAR_TRIGRAM_SQL = """
WITH norm AS (
  SELECT lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
  FROM documents
), tris AS (
  SELECT lang, substr(s, CAST(i AS INT), 3) AS trigram
  FROM norm, unnest(generate_series(1, greatest(len(s) - 2, 1))) AS u(i)
)
SELECT lang, trigram, n, rnk
FROM (
  SELECT lang, trigram, count(*) AS n,
         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, trigram ASC) AS rnk
  FROM tris
  WHERE len(trigram) = 3
  GROUP BY lang, trigram
)
WHERE rnk <= 5
"""


# ---------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------

#: fixed keyword query + standard BM25 constants.
_BM25_TERMS = ("window", "join", "table")
_K1 = 1.2
_B = 0.75


def bm25_topk(spark, sf_dir):
    """Top-10 documents for a keyword query under BM25 (k1=1.2, b=0.75) —
    lexical retrieval beside the vector-KNN entries (knn_*), i.e. the
    sparse half of a hybrid search stack.

    Plan: one explode filtered to the query terms (the filter lands before
    the aggregation, so the shuffle carries only matching postings — at
    100 TB that is |query terms| * docs-containing-term rows, not the whole
    posting list) -> (doc_id, term) tf agg -> broadcast joins with the
    term df table and the corpus stats scalar (both tiny) -> per-doc score
    sum -> global top-10 (TakeOrderedAndProject, no full sort).
    """
    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    doclen = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = doclen.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    postings = toks.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    tf = postings.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(doclen), "doc_id")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (_K1 + 1.0))
            / (
                F.col("tf")
                + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    # DECIMAL sum => addition order cannot perturb the rounded score
    # (double sums fold in engine-dependent order; see q9).
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("term_score").cast("decimal(30,12)")), 4)
            .cast("double")
            .alias("bm25")
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


_terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), doclen AS (
  SELECT doc_id, len(t) AS dl FROM toks
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen
), postings AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM postings
  WHERE term IN ({_terms_sql}) GROUP BY doc_id, term
), df_ AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         ln((stats.n_docs - df_.df + 0.5) / (df_.df + 0.5) + 1.0)
         * (tf.tf * ({_K1} + 1.0))
         / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * doclen.dl / stats.avgdl))
           AS term_score
  FROM tf
  JOIN df_ USING (term)
  JOIN doclen USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id,
       CAST(round(sum(CAST(term_score AS DECIMAL(30,12))), 4) AS DOUBLE) AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------
# repetition scoring (Gopher-style quality filter)
# ---------------------------------------------------------------------

def repetition_scores(spark, sf_dir):
    """Per-document repetition fractions: the share of tokens taken by the
    single most frequent unigram and bigram — the Gopher/RefinedWeb-style
    repetition filters that catch boilerplate and degenerate generations.

    Unigrams and bigrams are counted in one pass over one explode (bigrams
    come from a per-row slide lambda, no second scan); the shuffle key is
    (doc_id, gram) and the per-doc reduction is a partial+final max — at
    100 TB this is two hash aggs over posting-sized rows, no windows, no
    joins except the final per-doc zip of the two maxima (co-partitioned on
    doc_id).
    """
    d = spread(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    grams = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(
            T.let_bound(
                F.col("toks"),
                lambda t: F.concat(
                    t,
                    F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))
                        ),
                        lambda i: F.concat_ws(
                            " ", F.element_at(t, i), F.element_at(t, i + 1)
                        ),
                    ),
                ),
            )
        ).alias("gram"),
    ).withColumn("is_bigram", F.col("gram").contains(" "))
    counts = grams.groupBy("doc_id", "dl", "is_bigram", "gram").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.groupBy("doc_id", "dl")
        .agg(
            F.max(F.when(~F.col("is_bigram"), F.col("n"))).alias("max_uni"),
            F.max(F.when(F.col("is_bigram"), F.col("n"))).alias("max_bi"),
        )
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            F.round(F.col("max_uni") / F.col("dl"), 4).alias("uni_frac"),
            F.round(F.col("max_bi") / (F.col("dl") - 1), 4).alias("bi_frac"),
            (
                (F.col("max_uni") / F.col("dl") <= 0.2)
                & (F.col("max_bi") / (F.col("dl") - 1) <= 0.18)
            ).alias("keep"),
        )
    )


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
), grams AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS gram, FALSE AS is_bigram FROM toks
  UNION ALL
  SELECT doc_id, len(t) AS dl,
         t[i] || ' ' || t[i + 1] AS gram, TRUE AS is_bigram
  FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 1))) AS u(i)
  WHERE i + 1 <= len(t)
), counts AS (
  SELECT doc_id, dl, is_bigram, gram, count(*) AS n
  FROM grams GROUP BY ALL
)
SELECT doc_id, dl,
       round(max(CASE WHEN NOT is_bigram THEN n END) / CAST(dl AS DOUBLE), 4) AS uni_frac,
       round(max(CASE WHEN is_bigram THEN n END) / CAST(dl - 1 AS DOUBLE), 4) AS bi_frac,
       (max(CASE WHEN NOT is_bigram THEN n END) / CAST(dl AS DOUBLE) <= 0.2
        AND max(CASE WHEN is_bigram THEN n END) / CAST(dl - 1 AS DOUBLE) <= 0.18) AS keep
FROM counts
GROUP BY doc_id, dl
"""


# ---------------------------------------------------------------------
# chunk-level dedup stats (chunker ∘ exact dedup composition)
# ---------------------------------------------------------------------

def chunk_dedup_stats(spark, sf_dir):
    """Corpus-wide duplicated-chunk summary: total chunks, distinct chunk
    fingerprints, duplicated fingerprints, and the duplication ratio —
    the chunk-granularity dedup signal (exact doc dups produce identical
    chunk runs; partial overlap shows up here but not in doc-level dedup).

    Composes text_chunking (shuffle-free) with one hash aggregation on the
    16-byte md5 — the shuffle carries fingerprints, never text, the same
    discipline as doc-level exact dedup.
    """
    chunks = text_chunking(spark, sf_dir)
    per_hash = chunks.groupBy("chunk_md5").agg(F.count(F.lit(1)).alias("n"))
    return per_hash.groupBy().agg(
        F.sum("n").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_duplicated"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))) / F.sum("n"), 6
        ).alias("dup_ratio"),
    )


CHUNK_DEDUP_SQL = f"""
WITH chunks AS ({TEXT_CHUNKING_SQL}),
per_hash AS (
  SELECT chunk_md5, count(*) AS n FROM chunks GROUP BY chunk_md5
)
SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicated,
       round((sum(n) - count(*)) / CAST(sum(n) AS DOUBLE), 6) AS dup_ratio
FROM per_hash
"""


# =====================================================================
# sequence packing (token-budget bins for training)
# =====================================================================

def sequence_packing_docs(spark, sf_dir):
    """Pack documents (in doc_id order) into contiguous 2048-token
    training bins: pack_id = floor(tokens-before-this-doc / budget).
    The prefix sum is computed DISTRIBUTED — the classic two-phase
    construction, not one global window: a per-block local running sum
    (window partitioned by doc_id div 1000), plus a broadcast-joined
    running offset over the tiny per-block totals. Identical integers to
    the single-window formulation (the oracle uses that one), but no
    stage ever sorts the full corpus in one partition."""
    from kinesis_app_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    budget = 2048
    toks = d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        (F.col("doc_id") / 1000).cast("long").alias("block"),
    )
    wl = (
        Window.partitionBy("block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = toks.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(wl), F.lit(0))
    )
    wb = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        toks.groupBy("block")
        .agg(F.sum("n_tokens").alias("btot"))
        .select(
            "block",
            F.coalesce(F.sum("btot").over(wb), F.lit(0)).alias("offset"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "block")
        .select(
            "n_tokens",
            F.floor(
                (F.col("offset") + F.col("local_before")) / budget
            ).alias("pack_id"),
        )
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("pack_id")
    )


SEQUENCE_PACKING_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN len(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0
              THEN 0
              ELSE len(string_split(
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
         END AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM toks
)
SELECT CAST(floor(before / 2048.0) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


# =====================================================================
# token-weighted corpus sampling
# =====================================================================

def token_weighted_doc_sample(spark, sf_dir):
    """200-document Efraimidis–Spirakis sample with inclusion probability
    proportional to token count — the standard length-weighted draw for
    token-budgeted corpus subsets. Same md5-derived deterministic u as
    weighted_sample_lineitem, so the oracle computes the identical
    sample; plans as TakeOrderedAndProject (no global sort)."""
    from kinesis_app_spark.functions.text import token_count
    from kinesis_app_spark.operators.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    sampled = weighted_sample(
        d,
        id_str=F.col("doc_id").cast("string"),
        weight=F.col("n_tokens"),
        k=200,
        tiebreak=["doc_id"],
    )
    return sampled.select("doc_id", "lang", "n_tokens").orderBy("doc_id")


TOKEN_WEIGHTED_SAMPLE_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN len(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0
              THEN 0
              ELSE len(string_split(
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
         END AS n_tokens
  FROM documents
), keyed AS (
  SELECT doc_id, lang, n_tokens,
         power(
           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) / 4294967296.0,
           1.0 / n_tokens
         ) AS key
  FROM toks WHERE n_tokens > 0
)
SELECT doc_id, lang, n_tokens
FROM keyed
ORDER BY key DESC, doc_id
LIMIT 200
"""


# =====================================================================
# BPE merge-candidate mining (one tokenizer-induction iteration)
# =====================================================================

def bpe_merge_candidates(spark, sf_dir):
    """The inner statistic of BPE tokenizer training — corpus-wide counts
    of adjacent symbol pairs within words — for the first merge
    iteration (symbols = characters). Full BPE training is this exact
    query iterated with the winning pair merged; each iteration is one
    explode + one map-side-combined count, so training cost is
    O(iterations) shuffles of (pair, count) — the corpus text shuffles
    never. Top-50 pairs in deterministic (count desc, pair) order,
    TakeOrderedAndProject — no global sort."""
    from kinesis_app_spark.functions.text import let_bound, tokens

    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            let_bound(
                F.col("w"),
                lambda w: F.transform(
                    F.sequence(F.lit(1), F.length(w) - 1),
                    lambda i: w.substr(i, F.lit(2)),
                ),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
    )


BPE_SQL = r"""
WITH words AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents
), pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM words, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
  WHERE len(w) >= 2
)
SELECT pair, count(*) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 50
"""


#: ordered BPE merge table (pair -> merged symbol) — the APPLY side's
#: model, as a tokenizer shipped to production would carry it. Pairs are
#: ASCII-only and applied in priority order.
_BPE_MERGES = [
    ("t h", "th"),
    ("th e", "the"),
    ("i n", "in"),
    ("a n", "an"),
    ("e r", "er"),
    ("o n", "on"),
    ("r e", "re"),
    ("a t", "at"),
]


def bpe_apply_tokenize(spark, sf_dir):
    """BPE tokenizer APPLICATION — the other half of bpe_merge_candidates
    (that entry computes the training statistic; this one runs a trained
    merge table over the corpus, the tokenize-everything step of an LLM
    data pipeline). Each merge is a single-pass left-to-right
    replace-all of the space-delimited symbol pair, applied in priority
    order; Spark's and DuckDB's regex engines share leftmost
    non-overlapping semantics, so the whole chain is value-gateable.

    Scale shape — the production tokenizer-batching trick: tokenize each
    DISTINCT word once (the vocabulary is orders of magnitude smaller
    than the corpus), then join the per-word symbol counts back onto the
    per-doc tf — the expensive merge chain runs |vocab| times, not
    |corpus| times, and what shuffles is (word, counts), never text.
    ASCII-only words: the entry pins itself to '^[a-z]+$' so char
    splitting is engine-agnostic (Java regex '.' is UTF-16-code-unit
    based, RE2 is code-point based — astral chars would diverge)."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            )
        ).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("n"))
    vocab = tf.select("w").distinct()
    s = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
        F.lit(" "),
    )
    for pair, merged in _BPE_MERGES:
        s = F.regexp_replace(s, f" {pair} ", f" {merged} ")
    vt = vocab.select(
        "w",
        F.length("w").alias("n_before"),
        F.size(F.split(F.trim(s), " ")).alias("n_after"),
    )
    return (
        tf.join(F.broadcast(vt), "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("n_before")).alias("n_syms_before"),
            F.sum(F.col("n") * F.col("n_after")).alias("n_syms_after"),
            F.sum("n").alias("n_words"),
        )
        .orderBy("doc_id")
    )


def _bpe_chain_sql() -> str:
    s = "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '"
    for pair, merged in _BPE_MERGES:
        s = f"regexp_replace({s}, ' {pair} ', ' {merged} ', 'g')"
    return s


BPE_APPLY_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
  FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS n
  FROM toks WHERE regexp_matches(w, '^[a-z]+$')
  GROUP BY 1, 2
), vocab AS (
  SELECT DISTINCT w FROM tf
), vt AS (
  SELECT w, length(w) AS n_before,
         len(string_split(trim({_bpe_chain_sql()}), ' ')) AS n_after
  FROM vocab
)
SELECT tf.doc_id,
       CAST(sum(tf.n * vt.n_before) AS BIGINT) AS n_syms_before,
       CAST(sum(tf.n * vt.n_after) AS BIGINT) AS n_syms_after,
       CAST(sum(tf.n) AS BIGINT) AS n_words
FROM tf JOIN vt ON tf.w = vt.w
GROUP BY tf.doc_id
ORDER BY doc_id
"""


REGISTRY_FUNCS3 = {
    "bpe_apply_tokenize": QuerySpec(bpe_apply_tokenize, BPE_APPLY_SQL),
    "bpe_merge_candidates": QuerySpec(bpe_merge_candidates, BPE_SQL),
    "text_chunking": QuerySpec(text_chunking, TEXT_CHUNKING_SQL),
    "tfidf_top_terms": QuerySpec(tfidf_top_terms, TFIDF_SQL),
    "stratified_sample_mixture": QuerySpec(
        stratified_sample_mixture, STRATIFIED_SAMPLE_SQL
    ),
    "char_trigram_profile": QuerySpec(char_trigram_profile, CHAR_TRIGRAM_SQL),
    "bm25_topk": QuerySpec(bm25_topk, BM25_SQL),
    "repetition_scores": QuerySpec(repetition_scores, REPETITION_SQL),
    "chunk_dedup_stats": QuerySpec(chunk_dedup_stats, CHUNK_DEDUP_SQL),
    "sequence_packing_docs": QuerySpec(
        sequence_packing_docs, SEQUENCE_PACKING_SQL
    ),
    "token_weighted_doc_sample": QuerySpec(
        token_weighted_doc_sample, TOKEN_WEIGHTED_SAMPLE_SQL
    ),
}
