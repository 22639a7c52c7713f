"""End-to-end training-data curation pipeline — the composition the
LLM-pipeline operators exist for, as one declarative DataFrame program:

    raw documents
      -> quality gate        (textanalysis.quality_score)
      -> language gate       (textanalysis.lang_id)
      -> exact dedup         (dedup.exact_dedup: min-id survivor per
                              normalized fingerprint)
      -> near-dup removal    (greedy: for every near-dup pair, the higher
                              id is dropped; pairs from the exact
                              inverted-index Jaccard join so the whole
                              pipeline stays oracle-checkable — swap in
                              dedup.minhash_lsh_pairs at scale, same shape)
      -> corpus stats

Everything is one lazy plan: Catalyst pushes the quality/language gates
into the scan side of the pair join, and the near-dup join only sees
already-gated survivors (the cheap filters run before the expensive
quadratic-ish step — filter-first ordering matters more at 100 TB than any
single operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_app_spark.pinning import pin

from kinesis_app_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from kinesis_app_spark.operators.textanalysis import lang_quality_struct
from kinesis_app_spark.operators.util import bind_row, spread


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.30,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    use_lsh: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return the curated survivor documents (id, lang verdict, quality)."""
    # quality and language are pure per-row expressions over the text, so
    # they are projected inline — no shuffle join back onto df (two whole
    # exchanges of document text saved vs. the score-then-join shape).
    # bind_row evaluates the fused tokenize-once fold exactly once per row
    # (a Generate barrier CollapseProject cannot inline through).
    scored = bind_row(spread(df), lang_quality_struct(text_col), "__lq").select(
        "*",
        F.col("__lq.quality").alias("quality"),
        F.col("__lq.pred_lang").alias("pred_lang"),
    ).drop("__lq")
    gated = scored.filter(
        (F.col("quality") >= min_quality) & F.col("pred_lang").isin(*langs)
    )
    # Materialize the gated+exact-deduped corpus once: both the near-dup
    # pair build and the survivor anti-join consume it, and without the
    # checkpoint the scan + gates + dedup re-execute for each (swap for
    # persist(DISK_ONLY) on a real cluster).
    exact = exact_dedup(gated, text_col, id_col).transform(pin, eager=True)
    pair_fn = minhash_lsh_pairs if use_lsh else ngram_jaccard_pairs
    pairs = pair_fn(exact, text_col, id_col, threshold=jaccard_threshold)
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = exact.join(drop, id_col, "left_anti")
    return survivors.select(id_col, "pred_lang", F.round("quality", 4).alias("quality"))


def curation_stats(survivors: DataFrame, raw: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One-row funnel summary: raw vs surviving counts + mean quality."""
    n_raw = raw.select(F.count(F.lit(1)).alias("n_raw"))
    agg = survivors.agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    )
    return agg.join(F.broadcast(n_raw))
