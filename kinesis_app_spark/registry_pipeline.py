"""The end-to-end corpus-curation pipeline under the correctness gate.

One query composes the whole training-data path (quality gate -> language
gate -> exact dedup -> near-dup removal); its oracle re-derives every stage
in SQL, so the *composition* — not just each operator — is value-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_app_spark.pinning import pin

from kinesis_app_spark.operators.pipeline import curate_corpus
from kinesis_app_spark.registry_util import QuerySpec, table as _t


def pipeline_corpus_curation(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return curate_corpus(
        docs, min_quality=0.30, langs=("en",), jaccard_threshold=0.5
    )


PIPELINE_SQL = """
WITH norm AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), quality AS (
  SELECT doc_id,
         round(0.4 * (least(len(toks), 100)::DOUBLE / 100.0)
             + 0.4 * (len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in','it','on','for')))::DOUBLE
                      / greatest(len(toks), 1))
             + 0.2 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                      / greatest(length(text), 1)), 4) AS quality
  FROM norm
), lang AS (
  SELECT doc_id,
         CASE WHEN c_zh > greatest(c_en, c_es, c_fr, c_de) THEN 'zh'
              WHEN c_de > greatest(c_en, c_es, c_fr)       THEN 'de'
              WHEN c_fr > greatest(c_en, c_es)             THEN 'fr'
              WHEN c_es > c_en                             THEN 'es'
              ELSE 'en' END AS pred_lang
  FROM (SELECT doc_id,
               len(list_filter(toks, x -> x IN ('the','a','of','and','is')))     AS c_en,
               len(list_filter(toks, x -> x IN ('el','la','de','y','es')))       AS c_es,
               len(list_filter(toks, x -> x IN ('le','la','de','et','est')))     AS c_fr,
               len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS c_de,
               len(list_filter(toks, x -> x IN ('zh0','zh1','zh2','zh3','zh4'))) AS c_zh
        FROM norm)
), gated AS (
  SELECT d.doc_id, d.text, l.pred_lang, q.quality
  FROM documents d
  JOIN quality q USING (doc_id)
  JOIN lang l USING (doc_id)
  WHERE q.quality >= 0.30 AND l.pred_lang IN ('en')
), exact AS (
  SELECT * FROM gated
  QUALIFY row_number() OVER (
    PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ORDER BY doc_id) = 1
), sh AS (
  SELECT doc_id, list_distinct([array_to_string(toks2[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks2) - 1, 1))]) AS shingles
  FROM (SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks2
        FROM exact)
  WHERE len(toks2) >= 3
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM sh
), postings AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), drop_ids AS (
  SELECT DISTINCT id_b AS doc_id
  FROM pairs
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
)
SELECT doc_id, pred_lang, round(quality, 4) AS quality
FROM exact
WHERE doc_id NOT IN (SELECT doc_id FROM drop_ids)
"""


def dedup_cluster_components(spark, sf_dir):
    """Connected components of the near-dup graph (iterative min-label
    propagation) — the cluster-level view of dedup: one canonical doc per
    component. The oracle computes the same components with a recursive
    transitive-closure CTE."""
    from kinesis_app_spark.operators.dedup import ngram_jaccard_pairs
    from kinesis_app_spark.operators.graph import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup_clusters(pairs)


DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE norm AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks) - 1, 1))]) AS shingles
  FROM norm WHERE len(toks) >= 3
), sizes AS (
  SELECT doc_id, len(shingles) AS n_sh FROM sh
), postings AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), near AS (
  SELECT id_a, id_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM near
  UNION
  SELECT id_b, id_a FROM near
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT v.id, least(v.id, coalesce(min(r.dst), v.id)) AS component,
       v.id = least(v.id, coalesce(min(r.dst), v.id)) AS is_canonical
FROM (SELECT DISTINCT src AS id FROM edges) v
LEFT JOIN reach r ON r.src = v.id
GROUP BY v.id
"""




# =====================================================================
# fixed-point PageRank (iterative algorithm #2 under the gate)
# =====================================================================

_PR_ITERS = 3
_PR_SCALE = 10**12


def pagerank_customer_supplier(spark, sf_dir):
    """PageRank over the customer<->supplier purchase graph in fixed-point
    integer arithmetic (operators/graph.pagerank_fixed_point): every
    operation is exact integer math, so the iterative result value-hashes
    against the oracle's unrolled-CTE replica - something an IEEE-double
    PageRank cannot do (contribution sums fold in engine order)."""
    from pyspark.sql import functions as F

    from kinesis_app_spark.operators.graph import pagerank_fixed_point

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    be = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .filter(F.col("l_partkey") % 20 == 0)
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_suppkey") + 1_000_000).alias("v"),
        )
        .distinct()
    )
    edges = be.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        be.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    pr = pagerank_fixed_point(edges, iterations=_PR_ITERS, scale=_PR_SCALE)
    return pr.orderBy(F.desc("rank"), F.asc("node")).limit(20)


def _pagerank_sql(iters: int, scale: int) -> str:
    head = f"""
WITH base_edges AS (
  SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE l_partkey % 20 = 0
), edges AS (
  SELECT u AS src, v AS dst FROM base_edges
  UNION
  SELECT v, u FROM base_edges
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), stats AS (
  SELECT count(*) AS n FROM nodes
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY src
), r0 AS (
  SELECT node, {scale} // n AS rank FROM nodes CROSS JOIN stats
)"""
    iter_cte = """, r{i} AS (
  SELECT n2.node,
         (15 * ({scale} // st.n)) // 100 + (85 * coalesce(c.cs, 0)) // 100 AS rank
  FROM nodes n2
  CROSS JOIN stats st
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank // d.deg) AS cs
    FROM edges e
    JOIN r{prev} r ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n2.node
)"""
    body = "".join(
        iter_cte.format(i=i, prev=i - 1, scale=scale) for i in range(1, iters + 1)
    )
    return (
        head
        + body
        + f"""
SELECT node, CAST(rank AS BIGINT) AS rank
FROM r{iters} ORDER BY rank DESC, node LIMIT 20
"""
    )


PAGERANK_SQL = _pagerank_sql(_PR_ITERS, _PR_SCALE)


# =====================================================================
# curation pipeline v2: the round-2 operator funnel
# =====================================================================

def pipeline_curation_v2(spark, sf_dir):
    """The round-2 curation funnel as ONE composition, reported as
    per-stage surviving-document counts:

        raw -> Gopher rule gate -> exact dedup -> segment-boilerplate
        gate (docs > 1/3 duplicated segments dropped) -> duplicated-span
        gate (docs > 1/2 duplicated tokens dropped) -> per-source quota

    The rule gate and exact dedup run on the RAW text (so the corpus's
    natural exact duplicates are actually removed); the deterministic
    boilerplate/span injections (mirrored in the oracle) are applied to
    the deduped cohort to make the segment/span stages non-trivial.
    Stage ordering is the 100 TB discipline: the zero-shuffle rule gate
    first, exact dedup (one bounded-key shuffle) before the gram-posting
    stages so duplicate copies never pay posting costs, and the quota
    window last on the smallest cohort. Gates use integer comparisons
    (3*n_dropped <= n_segments, 2*dup_tokens <= total_tokens) so no
    float rounding sits on a filter boundary. The deduped+injected
    cohort is checkpointed once — three downstream stages and two
    counts read it without re-running the scan+gates."""
    from kinesis_app_spark.operators.curation import (
        duplicate_span_stats,
        segment_dedup,
        source_quota_sample,
    )
    from kinesis_app_spark.operators.dedup import exact_dedup
    from kinesis_app_spark.registry_curation import (
        _inject_boilerplate,
        _inject_spans,
        gopher_pass,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    s1 = docs.filter(gopher_pass())
    s2 = _inject_boilerplate(_inject_spans(exact_dedup(s1))).transform(pin, eager=True)
    seg = segment_dedup(s2, seg_tokens=8, min_df=2)
    keep3 = seg.filter(
        3 * F.col("n_dropped") <= F.col("n_segments")
    ).select("doc_id")
    s3 = s2.join(keep3, "doc_id", "left_semi").transform(pin, eager=True)
    spans = duplicate_span_stats(s3, ngram=10)
    keep4 = spans.filter(
        2 * F.col("dup_tokens") <= F.col("total_tokens")
    ).select("doc_id")
    # s4 feeds TWO consumers (the stage-4 count and the quota stage);
    # pinned so the duplicate-span posting pass (10-gram occurrences +
    # island windows) behind keep4 runs once, not twice
    s4 = s3.join(keep4, "doc_id", "left_semi").transform(pin, eager=True)
    s5 = source_quota_sample(s4, cap=15)

    def stage(idx, name, df):
        return df.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    return (
        stage(0, "raw", docs)
        .unionByName(stage(1, "gopher_gate", s1))
        .unionByName(stage(2, "exact_dedup", s2))
        .unionByName(stage(3, "segment_gate", s3))
        .unionByName(stage(4, "span_gate", s4))
        .unionByName(stage(5, "source_quota", s5))
        .orderBy("stage_idx")
    )


from kinesis_app_spark.registry_curation import (  # noqa: E402
    _BP1 as _V2_BP1,
    _BP2 as _V2_BP2,
    _DUP_SENT as _V2_SENT,
)

PIPELINE_V2_SQL = (
    r"""
WITH toks0 AS (
  SELECT doc_id, source, text,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), s1 AS (
  SELECT * FROM toks0
  WHERE len(t) BETWEEN 20 AND 120
    AND (len(norm) - (len(t) - 1)) / len(t) BETWEEN 3 AND 10
    AND len(list_intersect(list_distinct(t), ['the','a','and','of','to'])) >= 2
), dedup AS (
  SELECT * FROM s1
  QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
), aug1 AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN t1 || ' ' ||
                array_to_string((string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))[1:15], ' ')
              ELSE t1 END AS text
  FROM (
    SELECT doc_id, source, text,
           CASE WHEN doc_id % 2 = 0 THEN text || ' """
    + _V2_SENT
    + r"""' ELSE text END AS t1
    FROM dedup
  )
), s2 AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(
           CASE WHEN doc_id % 4 = 0 THEN '"""
    + _V2_BP1
    + " "
    + _V2_BP2
    + r""" ' || text
                WHEN doc_id % 4 = 1 THEN '"""
    + _V2_BP1
    + r""" ' || text
                ELSE text END), '\s+', ' ', 'g')), ' ') AS t
  FROM aug1
), segs AS (
  SELECT doc_id, i AS seg_idx, array_to_string(t[(i*8+1):(i*8+8)], ' ') AS seg
  FROM s2,
       UNNEST(CASE WHEN len(t) >= 1
                   THEN generate_series(0, CAST(ceil(len(t)/8.0) AS BIGINT)-1)
                   ELSE [] END) AS g(i)
), dfreq AS (
  SELECT seg, count(DISTINCT doc_id) AS seg_df FROM segs GROUP BY 1
), segstat AS (
  SELECT s.doc_id, count(*) AS n_segments,
         sum(CASE WHEN d.seg_df >= 2 THEN 1 ELSE 0 END) AS n_dropped
  FROM segs s JOIN dfreq d USING (seg) GROUP BY 1
), s3 AS (
  SELECT s2.* FROM s2 JOIN segstat USING (doc_id)
  WHERE 3 * segstat.n_dropped <= segstat.n_segments
), occ AS (
  SELECT doc_id, i AS start, array_to_string(t[i:(i+9)], ' ') AS gram
  FROM s3,
       UNNEST(CASE WHEN len(t) >= 10 THEN generate_series(1, len(t)-9) ELSE [] END) AS g(i)
), freq AS (
  SELECT gram, count(*) AS freq FROM occ GROUP BY 1
), spans AS (
  SELECT doc_id, start, start + 9 AS e
  FROM occ JOIN freq USING (gram) WHERE freq >= 2
), islands AS (
  SELECT doc_id, start, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR start > max(e) OVER (PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM spans
), runs AS (
  SELECT doc_id, start, e,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM islands
), merged AS (
  SELECT doc_id, island, min(start) AS s, max(e) AS e FROM runs GROUP BY 1, 2
), spanstat AS (
  SELECT doc_id, sum(e - s + 1) AS dup_tokens FROM merged GROUP BY 1
), s4 AS (
  SELECT s3.* FROM s3 LEFT JOIN spanstat USING (doc_id)
  WHERE 2 * coalesce(spanstat.dup_tokens, 0) <= len(s3.t)
), s5 AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM s4
  ) WHERE rk <= 15
)
SELECT 0 AS stage_idx, 'raw' AS stage, (SELECT count(*) FROM documents) AS n_docs
UNION ALL SELECT 1, 'gopher_gate', (SELECT count(*) FROM s1)
UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'segment_gate', (SELECT count(*) FROM s3)
UNION ALL SELECT 4, 'span_gate', (SELECT count(*) FROM s4)
UNION ALL SELECT 5, 'source_quota', (SELECT count(*) FROM s5)
ORDER BY stage_idx
"""
)


REGISTRY_PIPELINE = {
    "pipeline_curation_v2": QuerySpec(pipeline_curation_v2, PIPELINE_V2_SQL),
    "pagerank_customer_supplier": QuerySpec(
        pagerank_customer_supplier, PAGERANK_SQL
    ),
    "pipeline_corpus_curation": QuerySpec(pipeline_corpus_curation, PIPELINE_SQL),
    "dedup_cluster_components": QuerySpec(
        dedup_cluster_components, DEDUP_CLUSTERS_SQL
    ),
}
