"""Registry: training-data curation operators (PII, contamination,
unigram-LM quality, radius search).

The synthetic documents contain no digits at all, so the PII entry injects
deterministic PII derived from doc_id into the text — with the identical
injection expressed in the oracle SQL — making the detector/redactor
end-to-end checkable rather than trivially all-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kinesis_app_spark.functions import text as TXT
from kinesis_app_spark.operators import curation as CU
from kinesis_app_spark.operators import similarity as SIM
from kinesis_app_spark.registry_util import QuerySpec, table as _t


# =====================================================================
# PII scan + redaction
# =====================================================================

def _inject_pii(docs):
    """Deterministic PII injection by doc_id % 5: email / phone / ipv4 /
    ssn / clean. Mirrored verbatim in the oracle SQL."""
    d = F.col("doc_id")
    tail = (
        F.when(d % 5 == 0, F.concat(F.lit(" contact user"), d, F.lit("@example.com now")))
        .when(d % 5 == 1, F.concat(F.lit(" call 555-"), (d % 900 + 100), F.lit("-"), (d % 9000 + 1000)))
        .when(d % 5 == 2, F.concat(F.lit(" server 10."), (d % 256), F.lit(".0."), (d % 250), F.lit(" logged")))
        .when(d % 5 == 3, F.concat(F.lit(" ssn "), (d % 900 + 100), F.lit("-"), (d % 90 + 10), F.lit("-"), (d % 9000 + 1000)))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat(F.col("text"), tail).alias("text"))


def pii_scan_docs(spark, sf_dir):
    """PII detection + redaction over documents with deterministic injected
    PII (the raw corpus is digit-free). Pure regexp projection — no
    shuffle; see operators/curation.py."""
    return CU.pii_scan(_inject_pii(_t(spark, sf_dir, "documents")))


_PII_AUG = r"""
SELECT doc_id,
       text || CASE
         WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com now'
         WHEN doc_id % 5 = 1 THEN ' call 555-' || (doc_id % 900 + 100) || '-' || (doc_id % 9000 + 1000)
         WHEN doc_id % 5 = 2 THEN ' server 10.' || (doc_id % 256) || '.0.' || (doc_id % 250) || ' logged'
         WHEN doc_id % 5 = 3 THEN ' ssn ' || (doc_id % 900 + 100) || '-' || (doc_id % 90 + 10) || '-' || (doc_id % 9000 + 1000)
         ELSE '' END AS text
FROM documents
"""

PII_SQL = r"""
WITH aug AS (
""" + _PII_AUG + r"""
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b')) AS BIGINT) AS n_ccn,
       CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(text, '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b'))
          + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
          + len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
          + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS pii_total,
       (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(text, '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b'))
          + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
          + len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
          + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) > 0 AS has_pii,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b', '[CCN]', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g') AS redacted
FROM aug
"""


# =====================================================================
# benchmark contamination
# =====================================================================

def contamination_check(spark, sf_dir):
    """Docs with doc_id % 101 == 0 play the benchmark set; every other doc
    is training data. Pairs sharing >= 3 distinct 3-shingles are flagged.
    Benchmark postings broadcast; corpus scanned once."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    train = docs.filter(F.col("doc_id") % 101 != 0)
    return CU.contamination_pairs(train, bench, k=3, min_shared=3)


CONTAMINATION_SQL = r"""
WITH norm AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS shingles
  FROM norm WHERE len(toks) >= 3
), postings AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
)
SELECT t.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS n_shared
FROM (SELECT * FROM postings WHERE doc_id % 101 <> 0) t
JOIN (SELECT * FROM postings WHERE doc_id % 101 = 0) b ON t.shingle = b.shingle
GROUP BY 1, 2
HAVING count(*) >= 3
"""


# =====================================================================
# incremental (cross-corpus) dedup
# =====================================================================

def incremental_dedup_batch(spark, sf_dir):
    """Docs with doc_id % 10 == 0 play the freshly ingested batch; the rest
    are the existing corpus. Admitted = new docs that are neither exact-
    fingerprint nor Jaccard>=0.5 duplicates of the corpus."""
    from kinesis_app_spark.operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup(new, existing, k=3, threshold=0.5).select("doc_id")


INCREMENTAL_DEDUP_SQL = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
), fpnew AS (
  SELECT doc_id, md5(norm) AS fp FROM norm WHERE doc_id % 10 = 0
), fpold AS (
  SELECT DISTINCT md5(norm) AS fp FROM norm WHERE doc_id % 10 <> 0
), fresh AS (
  SELECT doc_id FROM fpnew WHERE fp NOT IN (SELECT fp FROM fpold)
), toks AS (
  SELECT doc_id, string_split(norm, ' ') AS toks FROM norm
), sh AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS shingles
  FROM toks WHERE len(toks) >= 3
), post AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
), inter AS (
  SELECT n.doc_id AS new_id, o.doc_id AS old_id, count(*) AS n_inter,
         max(n.n_sh) AS n_a, max(o.n_sh) AS n_b
  FROM (SELECT post.* FROM post JOIN fresh USING (doc_id)) n
  JOIN (SELECT * FROM post WHERE doc_id % 10 <> 0) o ON n.shingle = o.shingle
  GROUP BY 1, 2
), rejected AS (
  SELECT DISTINCT new_id FROM inter
  WHERE n_inter / (n_a + n_b - n_inter) >= 0.5
)
SELECT doc_id FROM fresh WHERE doc_id NOT IN (SELECT new_id FROM rejected)
"""


# =====================================================================
# unigram-LM quality score
# =====================================================================

def unigram_quality_scores(spark, sf_dir):
    """Mean unigram log-probability per document under the corpus's own
    unigram LM (rounded to 3 decimals for cross-engine float parity)."""
    return CU.unigram_logprob_scores(_t(spark, sf_dir, "documents"))


UNIGRAM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1
), tot AS (
  SELECT sum(cnt) AS n_total FROM vocab
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(sum(tf * (ln(cnt) - ln(n_total))) / sum(tf), 3) AS logprob
FROM tf JOIN vocab USING (token) CROSS JOIN tot
GROUP BY doc_id
"""


# =====================================================================
# winsorization (quantile outlier clipping)
# =====================================================================

def winsorized_event_values(spark, sf_dir):
    """Per-event-type 5/95% winsorization of event values, then clipped
    aggregates — exact interpolated percentiles (quantile_cont parity),
    quantile table broadcast back, data never shuffled."""
    ev = _t(spark, sf_dir, "events")
    w = CU.winsorize(ev, "value", ["event_type"], 0.05, 0.95)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value_wins").cast("decimal(30,8)")), 2)
        .cast("double")
        .alias("wins_sum"),
        F.round(F.min("value_wins"), 6).alias("wins_min"),
        F.round(F.max("value_wins"), 6).alias("wins_max"),
    )


WINSORIZE_SQL = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS q_lo,
         quantile_cont(value, 0.95) AS q_hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       round(sum(CAST(least(greatest(value, q_lo), q_hi) AS DECIMAL(30,8))), 2)::DOUBLE AS wins_sum,
       round(min(least(greatest(value, q_lo), q_hi)), 6) AS wins_min,
       round(max(least(greatest(value, q_lo), q_hi)), 6) AS wins_max
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type
"""


# =====================================================================
# radius (threshold) similarity search
# =====================================================================

def radius_search(spark, sf_dir):
    """All neighbors with cosine >= 0.25 of each query vector — scan +
    broadcast-join + filter, fully pipelined (no top-k shuffle)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return SIM.radius_neighbors(emb, queries, threshold=0.25)


RADIUS_SQL = """
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos
FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
JOIN embeddings c ON c.vec_id != q.vec_id
WHERE round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) >= 0.25
"""


# =====================================================================
# segment-level boilerplate dedup (CCNet-style line dedup)
# =====================================================================

#: exactly 8 tokens each, so they occupy whole segments when prepended
_BP1 = "subscribe to our newsletter for daily updates now"
_BP2 = "follow us on social media for more content"


def _inject_boilerplate(docs):
    """Deterministic shared headers by doc_id % 4: two boilerplate
    segments / one / none — the raw corpus is random word soup with
    essentially no exact duplicate 8-grams, so without injection the op
    would be a trivially-empty no-op. Mirrored verbatim in the oracle."""
    d = F.col("doc_id")
    text = (
        F.when(d % 4 == 0, F.concat(F.lit(_BP1 + " " + _BP2 + " "), F.col("text")))
        .when(d % 4 == 1, F.concat(F.lit(_BP1 + " "), F.col("text")))
        .otherwise(F.col("text"))
    )
    return docs.withColumn("text", text)


def segment_dedup_docs(spark, sf_dir):
    """Corpus-wide duplicate-segment (boilerplate) removal: 8-token
    segments, drop any segment seen in >= 2 documents, reassemble.
    See operators/curation.py segment_dedup for the scale story."""
    return CU.segment_dedup(
        _inject_boilerplate(_t(spark, sf_dir, "documents")),
        seg_tokens=8,
        min_df=2,
    ).orderBy("doc_id")


_BOILER_AUG = f"""
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN '{_BP1} {_BP2} ' || text
            WHEN doc_id % 4 = 1 THEN '{_BP1} ' || text
            ELSE text END AS text
FROM documents
"""

SEGMENT_DEDUP_SQL = r"""
WITH aug AS (
""" + _BOILER_AUG + r"""
), toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM aug
), segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(t[(i*8+1):(i*8+8)], ' ') AS seg
  FROM toks,
       UNNEST(CASE WHEN len(t) >= 1
                   THEN generate_series(0, CAST(ceil(len(t)/8.0) AS BIGINT)-1)
                   ELSE [] END) AS g(i)
), dfreq AS (
  SELECT seg, count(DISTINCT doc_id) AS seg_df FROM segs GROUP BY 1
)
SELECT s.doc_id,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN d.seg_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       coalesce(
         string_agg(CASE WHEN d.seg_df < 2 THEN s.seg END, ' ' ORDER BY s.seg_idx),
         '') AS clean_text
FROM segs s JOIN dfreq d USING (seg)
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


# =====================================================================
# duplicated-span statistics (Lee et al. substring dedup, gram-posting form)
# =====================================================================

#: 12 tokens: any stride-1 10-gram inside it repeats corpus-wide
_DUP_SENT = "this content is provided as is without any warranty of correctness"


def _inject_spans(docs):
    """doc_id % 2 == 0: append a shared 12-token sentence (cross-doc
    duplication); doc_id % 7 == 0: additionally append the document's own
    first 15 tokens (within-doc duplication). Mirrored in the oracle."""
    d = F.col("doc_id")
    toks = TXT.tokens(F.col("text"))
    t1 = F.when(d % 2 == 0, F.concat(F.col("text"), F.lit(" " + _DUP_SENT))).otherwise(
        F.col("text")
    )
    t2 = F.when(
        d % 7 == 0,
        F.concat(t1, F.lit(" "), F.array_join(F.slice(toks, 1, 15), " ")),
    ).otherwise(t1)
    return docs.withColumn("text", t2)


def duplicate_span_stats_docs(spark, sf_dir):
    """Per-document duplicated-span stats over corpus-wide 10-gram
    postings with interval merge. See operators/curation.py
    duplicate_span_stats for the scale story."""
    return CU.duplicate_span_stats(
        _inject_spans(_t(spark, sf_dir, "documents")), ngram=10
    ).orderBy("doc_id")


_SPAN_AUG = f"""
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN t1 || ' ' ||
              array_to_string((string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))[1:15], ' ')
            ELSE t1 END AS text
FROM (
  SELECT doc_id, text,
         CASE WHEN doc_id % 2 = 0 THEN text || ' {_DUP_SENT}' ELSE text END AS t1
  FROM documents
)
"""

DUP_SPANS_SQL = r"""
WITH aug AS (
""" + _SPAN_AUG + r"""
), toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM aug
), occ AS (
  SELECT doc_id, i AS start, array_to_string(t[i:(i+9)], ' ') AS gram
  FROM toks,
       UNNEST(CASE WHEN len(t) >= 10 THEN generate_series(1, len(t)-9) ELSE [] END) AS g(i)
), freq AS (
  SELECT gram, count(*) AS freq FROM occ GROUP BY 1
), spans AS (
  SELECT doc_id, start, start + 9 AS "end"
  FROM occ JOIN freq USING (gram) WHERE freq >= 2
), islands AS (
  SELECT doc_id, start, "end",
         CASE WHEN max("end") OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR start > max("end") OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM spans
), runs AS (
  SELECT doc_id, start, "end",
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM islands
), merged AS (
  SELECT doc_id, island, min(start) AS s, max("end") AS e
  FROM runs GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS dup_tokens
  FROM merged GROUP BY 1
)
SELECT t.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(len(t.t) AS BIGINT) AS total_tokens,
       round(coalesce(p.dup_tokens, 0) / len(t.t), 4) AS dup_frac
FROM toks t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""


# =====================================================================
# Gopher-style quality rule filter
# =====================================================================

def gopher_pass() -> Column:
    """The conjunction of the Gopher-style rules below as a reusable
    boolean over a `text` column — the pipeline composition filters with
    this exact predicate so its oracle mirrors one expression, not two."""
    toks = TXT.tokens(F.col("text"))
    n_words = F.size(toks)
    mean_wlen = (F.length(TXT.normalize_ws(F.col("text"))) - (n_words - 1)) / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in ("the", "a", "and", "of", "to")]),
        )
    )
    return (
        (n_words >= 20)
        & (n_words <= 120)
        & (mean_wlen >= 3)
        & (mean_wlen <= 10)
        & (stop_hits >= 2)
    )


def gopher_rules_docs(spark, sf_dir):
    """Rule-based document quality gate in the style of Gopher (Rae et
    al. 2021, arXiv:2112.11446 §A1.1) / FineWeb: word-count bounds, mean
    word length bounds, and minimum stopword evidence, with thresholds
    scaled to the synthetic corpus (20..120 words vs Gopher's 50..100k).
    Emits one boolean per rule plus the conjunction — keeping per-rule
    flags is deliberate: real pipelines tune rules from their individual
    fire rates, not the aggregate.

    Pure Column arithmetic over one tokenize — a projection inside
    whole-stage codegen, zero shuffles, the cheapest possible 100 TB op:
    it runs at scan speed and pushes nothing anywhere."""
    d = _t(spark, sf_dir, "documents")
    toks = TXT.tokens(F.col("text"))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in ("the", "a", "and", "of", "to")]),
        )
    )
    n_words = F.size(toks)
    mean_wlen = (F.length(TXT.normalize_ws(F.col("text"))) - (n_words - 1)) / n_words
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        stop_hits.cast("long").alias("n_stopwords"),
        (n_words >= 20).alias("rule_min_words"),
        (n_words <= 120).alias("rule_max_words"),
        ((mean_wlen >= 3) & (mean_wlen <= 10)).alias("rule_word_len"),
        (stop_hits >= 2).alias("rule_stopwords"),
        (
            (n_words >= 20)
            & (n_words <= 120)
            & (mean_wlen >= 3)
            & (mean_wlen <= 10)
            & (stop_hits >= 2)
        ).alias("passes"),
    ).orderBy("doc_id")


GOPHER_SQL = r"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         (len(norm) - (len(toks) - 1)) / len(toks) AS mean_wlen,
         len(list_intersect(list_distinct(toks),
                            ['the', 'a', 'and', 'of', 'to'])) AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mean_wlen, 4) AS mean_word_len,
       CAST(stop_hits AS BIGINT) AS n_stopwords,
       n_words >= 20 AS rule_min_words,
       n_words <= 120 AS rule_max_words,
       mean_wlen >= 3 AND mean_wlen <= 10 AS rule_word_len,
       stop_hits >= 2 AS rule_stopwords,
       n_words >= 20 AND n_words <= 120
         AND mean_wlen >= 3 AND mean_wlen <= 10
         AND stop_hits >= 2 AS passes
FROM m
ORDER BY doc_id
"""


# =====================================================================
# per-source quota sampling (domain caps)
# =====================================================================

def source_quota_sample_docs(spark, sf_dir):
    """Keep at most 15 documents per source, ordered by a deterministic
    md5 of the doc id — stable across engines and runs. See
    operators/curation.py source_quota_sample for the hot-source story."""
    return CU.source_quota_sample(
        _t(spark, sf_dir, "documents"), cap=15
    ).orderBy("source", "rk")


QUOTA_SQL = """
SELECT doc_id, source, rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
WHERE rk <= 15
ORDER BY source, rk
"""


REGISTRY_CURATION = {
    "pii_scan_docs": QuerySpec(pii_scan_docs, PII_SQL),
    "contamination_check": QuerySpec(contamination_check, CONTAMINATION_SQL),
    "incremental_dedup_batch": QuerySpec(
        incremental_dedup_batch, INCREMENTAL_DEDUP_SQL
    ),
    "unigram_quality_scores": QuerySpec(unigram_quality_scores, UNIGRAM_SQL),
    "winsorized_event_values": QuerySpec(winsorized_event_values, WINSORIZE_SQL),
    "radius_search": QuerySpec(radius_search, RADIUS_SQL),
    "segment_dedup_docs": QuerySpec(segment_dedup_docs, SEGMENT_DEDUP_SQL),
    "duplicate_span_stats_docs": QuerySpec(
        duplicate_span_stats_docs, DUP_SPANS_SQL
    ),
    "source_quota_sample_docs": QuerySpec(source_quota_sample_docs, QUOTA_SQL),
    "gopher_rules_docs": QuerySpec(gopher_rules_docs, GOPHER_SQL),
}
