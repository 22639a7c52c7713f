"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Column algebra (regexp / split / higher-order functions) — the
whole module runs inside whole-stage codegen, so at 100 TB these are
scan-bound, not CPU-bound. Each has an exact ANSI-SQL twin used as the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_app_spark.operators.util import bind_row, spread
from kinesis_app_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    let_bound,
    normalize_ws,
    token_count,
    tokens,
)

#: marker (stop)words per language for the n-gram/stopword language-ID
#: heuristic. Order matters: deterministic tie-break = first in this list.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("zh0", "zh1", "zh2", "zh3", "zh4"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "it", "on", "for")


def _marker_fold(toks: Column, slots: list[tuple[str, ...]]) -> Column:
    """array<int> of per-slot marker counts in ONE fold over the tokens.

    One aggregate() pass replaces len(slots) separate filter+size scans.
    Higher-order functions are CodegenFallback with no common-subexpression
    elimination, so N separate marker counts each re-tokenize the text —
    the single fold is ~8x faster on the documents table and bit-identical
    (integer counts).
    """
    init = F.array(*[F.lit(0) for _ in slots])

    def step(acc: Column, tk: Column) -> Column:
        return F.array(
            *[
                F.element_at(acc, i + 1) + F.when(tk.isin(*mk), 1).otherwise(0)
                for i, mk in enumerate(slots)
            ]
        )

    return F.aggregate(toks, init, step)


def lang_quality_struct(text_col: str = "text") -> Column:
    """struct(pred_lang, marker_hits, stop_ratio, alpha_ratio, quality) —
    the full language-ID + quality gate in one pass: tokenize once, one
    fold counting every language's markers and the stopwords together.

    Evaluate through :func:`~kinesis_app_spark.operators.util.bind_row`
    (Generate barrier) so the fold runs exactly once per row no matter how
    many fields downstream code reads. Values are identical to the
    separate lang_id / quality_score results.
    """
    slots = list(LANG_MARKERS.values()) + [STOPWORDS]
    langs = list(LANG_MARKERS)

    def body(toks: Column) -> Column:
        def body2(c: Column) -> Column:
            best = F.lit(langs[0])
            best_n = F.element_at(c, 1)
            for i, lang in enumerate(langs[1:], start=2):
                better = F.element_at(c, i) > best_n
                best = F.when(better, F.lit(lang)).otherwise(best)
                best_n = F.when(better, F.element_at(c, i)).otherwise(best_n)
            n_tok = F.size(toks)
            stop_ratio = F.element_at(c, len(slots)).cast("double") / F.greatest(
                n_tok, F.lit(1)
            )
            alpha_ratio = F.length(
                F.regexp_replace(F.col(text_col), r"[^A-Za-z]", "")
            ).cast("double") / F.greatest(F.length(F.col(text_col)), F.lit(1))
            len_score = F.least(n_tok, F.lit(100)).cast("double") / 100.0
            quality = F.round(0.4 * len_score + 0.4 * stop_ratio + 0.2 * alpha_ratio, 4)
            return F.struct(
                best.alias("pred_lang"),
                best_n.alias("marker_hits"),
                F.round(stop_ratio, 4).alias("stop_ratio"),
                F.round(alpha_ratio, 4).alias("alpha_ratio"),
                quality.alias("quality"),
            )

        return let_bound(_marker_fold(toks, slots), body2)

    return let_bound(tokens(F.col(text_col)), body)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts and mean token length per doc."""
    toks = tokens(F.col(text_col))
    return spread(df).select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        bpe_ish_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic [0,1] quality score: length component + stopword ratio
    + alphabetic-character ratio. The shape (not the exact weights) is the
    standard pretraining-data quality heuristic."""
    b = bind_row(spread(df), lang_quality_struct(text_col), "__lq")
    return b.select(
        F.col(id_col),
        F.col("__lq.stop_ratio").alias("stop_ratio"),
        F.col("__lq.alpha_ratio").alias("alpha_ratio"),
        F.col("__lq.quality").alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: argmax of per-language marker counts,
    ties broken by LANG_MARKERS declaration order (en first)."""
    b = bind_row(spread(df), lang_quality_struct(text_col), "__lq")
    return b.select(
        F.col(id_col),
        F.col("__lq.pred_lang").alias("pred_lang"),
        F.col("__lq.marker_hits").alias("marker_hits"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprints: md5 of every `window`-token
    rolling slice, keeping the minimum hash per `stride`-position bucket.

    The standard local-fingerprinting scheme for plagiarism/near-dup
    detection: a shared passage of >= window+stride tokens guarantees a
    shared fingerprint. Pure Column algebra (sequence/transform/slice +
    explode + min) — the per-doc work is linear in tokens; the groupBy
    shuffles (id, bucket, 32-char hash), never text.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # n < window guard: sequence(1, 0) infers step -1 -> [1, 0] and
    # slice(toks, 0, window) throws; short docs have no window fingerprints.
    idx = F.when(
        n >= F.lit(window), F.sequence(F.lit(1), n - F.lit(window - 1))
    ).otherwise(F.array().cast("array<int>"))
    win_hash = F.transform(
        idx,
        lambda i: F.struct(
            ((i - 1) / stride).cast("long").alias("bucket"),
            F.md5(F.array_join(F.slice(toks, i, window), " ")).alias("h"),
        ),
    )
    return (
        spread(df)
        .select(F.col(id_col), F.explode(win_hash).alias("w"))
        .groupBy(id_col, F.col("w.bucket").alias("bucket"))
        .agg(F.min("w.h").alias("fp"))
    )


def fingerprint_docs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable md5 fingerprint of the whitespace/case-normalized text."""
    return spread(df).select(
        F.col(id_col),
        fingerprint(F.col(text_col)).alias("fp"),
        normalize_ws(F.col(text_col)).substr(1, 40).alias("norm_prefix"),
    )
