"""Classifier-evaluation operators: ROC AUC, score calibration, and a
precision/recall threshold sweep over the model-based quality
classifier (registry_mlprep.quality_classifier_scores — the
FineWeb-Edu / DCLM-style filtering stage).

A training-data engine that scores documents must also be able to
EVALUATE those scores at corpus scale — choosing the keep-threshold for
a 100 TB filtering run is exactly a distributed PR sweep + calibration
read. The reference has no counterpart (per-record callbacks only,
/root/reference/src/Kinesis/Coordination.hs:51-53); these extend the
SURVEY.md §2.2 north-star ML-prep surface.

Scale shapes: every entry collapses the corpus to one row per doc
(logit) and then to one row per DISTINCT INTEGER LOGIT before any
rank/band work — the classifier emits small integers, so the reduced
relation is score-range-sized, not corpus-sized. AUC reuses the
Mann-Whitney two-phase binned prefix-sum (fixed 1024-bin histogram +
bin-partitioned windows, never a data-sized global sort); the threshold
sweep is ONE aggregate pass with 3x9 conditional sums unpivoted to rows
(no grid replication of the fact table); calibration is a plain
groupBy. Integer logits keep every count and rank exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_app_spark.registry_util import QuerySpec, table as _t

#: threshold grid for the PR sweep (integer logits)
_PR_THRESHOLDS = [-20, -15, -10, -5, 0, 5, 10, 15, 20]

_AUC_BINS = 1024


def _doc_logits(spark, sf_dir):
    """(doc_id, logit, pos): the quality_classifier_scores fixed linear
    model (64 hashed buckets, integer weights — see
    registry_mlprep.py), labeled pos = (lang == 'en')."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("tok"),
    )
    tf = (
        toks.withColumn(
            "bucket",
            (
                F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast(
                    "long"
                )
                % 64
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    weights = spark.range(64).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 37) % 21 - 10).alias("w"),
    )
    logits = (
        tf.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg((F.lit(3) + F.sum(F.col("tf") * F.col("w"))).alias("logit"))
    )
    return logits.join(
        d.select("doc_id", (F.col("lang") == "en").cast("long").alias("pos")),
        "doc_id",
    )


_SCORED_SQL = r"""
  SELECT tf.doc_id,
         CAST(3 + sum(tf * ((bucket * 37) % 21 - 10)) AS BIGINT) AS logit,
         max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
  FROM (
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
           count(*) AS tf
    FROM (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      FROM documents
    )
    GROUP BY 1, 2
  ) tf JOIN documents USING (doc_id)
  GROUP BY tf.doc_id
"""


# =====================================================================
# ROC AUC via the rank (Mann-Whitney) identity
# =====================================================================

def classifier_auc_docs(spark, sf_dir):
    """ROC AUC of the quality-classifier logit predicting lang == 'en',
    via the rank identity AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos *
    n_neg) with average ranks for tied scores — the exact trapezoidal
    ROC area, computed without materializing a single ROC point.

    Scale shape: corpus -> one row per doc -> one row per DISTINCT
    integer logit; average ranks via the mann_whitney_events two-phase
    binned prefix-sum (1024-bin histogram offsets + bin-partitioned
    within prefixes) — no data-sized global sort at any step. Ranks are
    half-integers, so every sum is exact in double regardless of order
    and the naive-ranking oracle matches bit-for-bit."""
    scored = _doc_logits(spark, sf_dir)
    byv = scored.groupBy("logit").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("cp")
    )
    edges = byv.agg(F.min("logit").alias("lo"), F.max("logit").alias("hi"))
    binned = byv.crossJoin(F.broadcast(edges)).withColumn(
        "bin",
        F.greatest(
            F.lit(0),
            F.least(
                F.floor(
                    (F.col("logit") - F.col("lo"))
                    / (
                        (F.col("hi") - F.col("lo") + 1)
                        / F.lit(float(_AUC_BINS))
                    )
                ).cast("int"),
                F.lit(_AUC_BINS - 1),
            ),
        ),
    )
    bins = binned.groupBy("bin").agg(F.sum("c").alias("nb"))
    w_off = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    bins = bins.withColumn(
        "off", F.coalesce(F.sum("nb").over(w_off), F.lit(0))
    )
    w_in = Window.partitionBy("bin").orderBy("logit").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = (
        binned.join(bins.select("bin", "off"), "bin")
        .withColumn("within", F.coalesce(F.sum("c").over(w_in), F.lit(0)))
        .withColumn(
            "avg_rank",
            F.col("off") + F.col("within") + (F.col("c") + 1) / F.lit(2.0),
        )
    )
    agg = ranked.agg(
        F.sum("cp").alias("n_pos"),
        F.sum(F.col("c") - F.col("cp")).alias("n_neg"),
        F.sum(F.col("cp") * F.col("avg_rank")).alias("rp"),
    )
    auc = (
        F.col("rp") - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0)
    ) / (F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


CLASSIFIER_AUC_SQL = f"""
WITH scored AS ({_SCORED_SQL}
), byv AS (
  SELECT logit, count(*) AS c, sum(pos) AS cp FROM scored GROUP BY logit
), r AS (
  SELECT logit, c, cp,
         coalesce(sum(c) OVER (ORDER BY logit
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl
  FROM byv
), agg AS (
  SELECT sum(cp) AS n_pos, sum(c - cp) AS n_neg,
         sum(cp * (cl + (c + 1) / 2.0)) AS rp
  FROM r
)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       round((rp - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc,
       round(2 * ((rp - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)) - 1, 6)
         AS gini
FROM agg
"""


# =====================================================================
# score calibration bands
# =====================================================================

def score_band_calibration(spark, sf_dir):
    """Reliability table of the quality classifier: width-5 integer
    logit bands (clamped to [-5..5] band indices), per-band document
    count, mean logit, and observed positive rate — the calibration
    read that decides whether 'logit > 0' is actually the right keep
    gate, and the distributed form of a reliability diagram.

    Scale shape: one groupBy over per-doc logits; every statistic is
    exact integer arithmetic (mean of integer logits is one exact
    division)."""
    scored = _doc_logits(spark, sf_dir)
    band = F.greatest(
        F.lit(-5),
        F.least(F.lit(5), F.floor(F.col("logit") / 5).cast("int")),
    )
    return (
        scored.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.round(F.avg("logit"), 4).alias("mean_logit"),
            F.round(F.sum("pos") / F.count(F.lit(1)), 6).alias("pos_rate"),
        )
        .orderBy("band")
    )


SCORE_CALIBRATION_SQL = f"""
WITH scored AS ({_SCORED_SQL}
)
SELECT greatest(-5, least(5, CAST(floor(logit / 5.0) AS INT))) AS band,
       count(*) AS n_docs,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       round(avg(logit), 4) AS mean_logit,
       round(sum(pos) / CAST(count(*) AS DOUBLE), 6) AS pos_rate
FROM scored
GROUP BY 1
ORDER BY band
"""


# =====================================================================
# precision / recall / F1 threshold sweep — one aggregate pass
# =====================================================================

def pr_threshold_sweep_docs(spark, sf_dir):
    """Precision, recall and F1 of 'keep if logit > t' for a fixed
    9-threshold grid — the sweep that picks the filtering operating
    point before a 100 TB run.

    Scale shape: ONE aggregate pass over per-doc logits computes all
    3x9 conditional sums (tp/fp/fn per threshold) map-side-combinably;
    the 9 output rows come from unpivoting the single aggregate row
    (stack), so the corpus is never replicated across the grid. All
    metrics are exact-integer ratios."""
    scored = _doc_logits(spark, sf_dir)
    aggs = []

    def _tag(t: int) -> str:
        return f"m{-t}" if t < 0 else str(t)

    for t in _PR_THRESHOLDS:
        kept = F.col("logit") > t
        pos = F.col("pos") == 1
        g = _tag(t)
        aggs += [
            F.sum((kept & pos).cast("long")).alias(f"tp_{g}"),
            F.sum((kept & ~pos).cast("long")).alias(f"fp_{g}"),
            F.sum((~kept & pos).cast("long")).alias(f"fn_{g}"),
            F.sum(((~kept) & ~pos).cast("long")).alias(f"tn_{g}"),
        ]
    wide = scored.agg(*aggs)
    stack_args = ", ".join(
        f"{t}, tp_{_tag(t)}, fp_{_tag(t)}, fn_{_tag(t)}, tn_{_tag(t)}"
        for t in _PR_THRESHOLDS
    )
    long = wide.select(
        F.expr(
            f"stack({len(_PR_THRESHOLDS)}, {stack_args}) "
            "AS (threshold, tp, fp, fn, tn)"
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp") / (F.col("tp") + F.col("fp")),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2 * prec * rec / (prec + rec),
    )
    return long.select(
        F.col("threshold").cast("int").alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("threshold")


PR_SWEEP_SQL = f"""
WITH scored AS ({_SCORED_SQL}
), grid AS (
  SELECT unnest([{", ".join(str(t) for t in _PR_THRESHOLDS)}]) AS threshold
), agg AS (
  SELECT threshold,
         sum(CASE WHEN logit > threshold AND pos = 1 THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN logit > threshold AND pos = 0 THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN logit <= threshold AND pos = 1 THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN logit <= threshold AND pos = 0 THEN 1 ELSE 0 END) AS tn
  FROM scored CROSS JOIN grid
  GROUP BY threshold
)
SELECT CAST(threshold AS INT) AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       round(CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) END, 6)
         AS precision,
       round(CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) END, 6)
         AS recall,
       round(CASE WHEN tp + fp > 0 AND tp + fn > 0
                       AND tp / CAST(tp + fp AS DOUBLE)
                           + tp / CAST(tp + fn AS DOUBLE) > 0
                  THEN 2 * (tp / CAST(tp + fp AS DOUBLE))
                         * (tp / CAST(tp + fn AS DOUBLE))
                       / (tp / CAST(tp + fp AS DOUBLE)
                          + tp / CAST(tp + fn AS DOUBLE))
             END, 6) AS f1
FROM agg
ORDER BY threshold
"""


REGISTRY_MLEVAL: dict[str, QuerySpec] = {
    "classifier_auc_docs": QuerySpec(classifier_auc_docs, CLASSIFIER_AUC_SQL),
    "score_band_calibration": QuerySpec(
        score_band_calibration, SCORE_CALIBRATION_SQL
    ),
    "pr_threshold_sweep_docs": QuerySpec(
        pr_threshold_sweep_docs, PR_SWEEP_SQL
    ),
}
