"""Registry: round-2 curation additions — Gopher repetition signals.

Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) gates documents on
*internal repetition*: the fraction of characters covered by the most
frequent word n-gram, and the fraction of characters covered by ALL word
n-grams that occur more than once. The reference corpus here is synthetic
word soup with no newlines, so the line-based repetition rules are
meaningless, but the n-gram rules fire richly on a ~30-word vocabulary —
n=2 and n=3 with thresholds scaled to these short documents (Gopher uses
n=2..4 for top-gram and n=5..10 for dup-gram over much longer pages).

Scale story: per-document statistics computed ENTIRELY inside the row —
one tokenize (codegen regexp), per-n gram arrays, and a sorted-array
run-length fold, all in one projection. ZERO shuffles: at any corpus
size this runs at scan speed and ships nothing anywhere (the alternative
groupBy-per-(doc, gram) formulation ships ~150 rows per document; per-doc
stats should not touch the network). No Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from kinesis_app_spark.functions import text as TXT
from kinesis_app_spark.registry_util import QuerySpec, table as _t


def gopher_repetition_docs(spark, sf_dir):
    """Per-document n-gram repetition statistics (n = 2, 3):

    - ``top{n}_freq`` / ``top{n}_gram``: occurrence count and value of the
      most frequent n-gram (ties broken by lexicographically smallest gram
      — deterministic cross-engine);
    - ``top{n}_char_frac``: chars covered by all occurrences of that gram
      (freq × len(gram)) over the normalized text length;
    - ``dup{n}_char_frac``: same numerator summed over every n-gram with
      freq ≥ 2. Overlapping occurrences are counted per-occurrence, as in
      Gopher — the value may exceed 1 for degenerate docs;
    - ``rule_top2`` / ``rule_top3`` / ``passes``: threshold flags
      (top2 ≤ 0.20, top3 ≤ 0.18, Gopher's published cutoffs).

    Fractions are exact integer ratios rounded to 4 decimals, so the
    DuckDB oracle hash-matches bit-for-bit.
    """
    d = _t(spark, sf_dir, "documents")

    def _grams(toks, n: int):
        # All positional n-grams (with repeats) as strings; toks is a
        # bound lambda slot so the tokenizer runs once per document.
        cnt = F.size(toks)
        idx = F.when(
            cnt >= F.lit(n), F.sequence(F.lit(1), cnt - F.lit(n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))

    def _rep_stats(grams):
        # ZERO-SHUFFLE per-doc statistics: sort the gram array and fold a
        # run-length scan over it (gaps-and-islands inside one codegen
        # expression). Scanning ascending with a strictly-greater best
        # update reproduces the (count desc, gram asc) tie-break of a
        # rank window — without shuffling one row per (doc, gram) (750k
        # rows at sf0.1; the groupBy formulation measured 3s, this ~1s,
        # and at 100 TB per-doc stats simply should not touch the
        # network at all).
        zero = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit("").alias("bestg"),
            F.lit(0).cast("long").alias("dup"),
        )

        def close(acc):
            # finalize the open run: fold it into best/dup
            better = acc["run"] > acc["best"]
            return (
                F.when(better, acc["run"]).otherwise(acc["best"]),
                F.when(better, acc["prev"]).otherwise(acc["bestg"]),
                acc["dup"]
                + F.when(
                    acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
                ).otherwise(F.lit(0).cast("long")),
            )

        def step(acc, g):
            same = acc["prev"] == g
            best, bestg, dup = close(acc)
            return F.struct(
                g.alias("prev"),
                F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
                F.when(same, acc["best"]).otherwise(best).alias("best"),
                F.when(same, acc["bestg"]).otherwise(bestg).alias("bestg"),
                F.when(same, acc["dup"]).otherwise(dup).alias("dup"),
            )

        def fin(acc):
            best, bestg, dup = close(acc)
            return F.struct(
                best.alias("top_freq"),
                bestg.alias("top_gram"),
                (best * F.length(bestg)).alias("top_chars"),
                dup.alias("dup_chars"),
            )

        return F.aggregate(F.array_sort(grams), zero, step, fin)

    # inline() is a Generate node — a CollapseProject BARRIER: without it
    # every downstream field access would inline and re-run the whole
    # interpreted fold (HOFs are not codegen'd and get no CSE; same
    # 489s->4s failure mode as the MinHash banding, operators/dedup.py).
    # With the barrier each fold runs exactly once per document.
    out = d.select(
        "doc_id",
        F.length(TXT.normalize_ws(F.col("text"))).alias("nchars"),
        F.inline(
            F.array(
                F.struct(
                    TXT.let_bound(
                        TXT.tokens(F.col("text")),
                        lambda toks: _rep_stats(_grams(toks, 2)),
                    ).alias("t2"),
                    TXT.let_bound(
                        TXT.tokens(F.col("text")),
                        lambda toks: _rep_stats(_grams(toks, 3)),
                    ).alias("t3"),
                )
            )
        ),
    )
    for n in (2, 3):
        out = (
            out.withColumn(f"top{n}_freq", F.col(f"t{n}.top_freq"))
            .withColumn(f"top{n}_gram", F.col(f"t{n}.top_gram"))
            .withColumn(f"top{n}_chars", F.col(f"t{n}.top_chars"))
            .withColumn(f"dup{n}_chars", F.col(f"t{n}.dup_chars"))
        )
    frac = lambda c: F.round(
        F.coalesce(c, F.lit(0)).cast("double") / F.col("nchars"), 4
    )
    top2 = frac(F.col("top2_chars"))
    top3 = frac(F.col("top3_chars"))
    return out.select(
        "doc_id",
        F.col("nchars").cast("long").alias("nchars"),
        F.coalesce("top2_freq", F.lit(0)).cast("long").alias("top2_freq"),
        F.coalesce("top2_gram", F.lit("")).alias("top2_gram"),
        top2.alias("top2_char_frac"),
        frac(F.col("dup2_chars")).alias("dup2_char_frac"),
        F.coalesce("top3_freq", F.lit(0)).cast("long").alias("top3_freq"),
        F.coalesce("top3_gram", F.lit("")).alias("top3_gram"),
        top3.alias("top3_char_frac"),
        frac(F.col("dup3_chars")).alias("dup3_char_frac"),
        (top2 <= 0.20).alias("rule_top2"),
        (top3 <= 0.18).alias("rule_top3"),
        ((top2 <= 0.20) & (top3 <= 0.18)).alias("passes"),
    ).orderBy("doc_id")


GOPHER_REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), occ AS (
  SELECT doc_id, n, array_to_string(toks[i:(i + n - 1)], ' ') AS gram
  FROM t,
       (VALUES (2), (3)) AS ns(n),
       UNNEST(CASE WHEN len(toks) >= n
                   THEN generate_series(1, len(toks) - n + 1) ELSE [] END) AS g(i)
), counts AS (
  SELECT doc_id, n, gram, count(*) AS cnt
  FROM occ GROUP BY 1, 2, 3
), ranked AS (
  SELECT doc_id, n, gram, cnt,
         row_number() OVER (PARTITION BY doc_id, n
                            ORDER BY cnt DESC, gram ASC) AS rk
  FROM counts
), per_n AS (
  SELECT doc_id, n,
         max(CASE WHEN rk = 1 THEN cnt END) AS top_freq,
         max(CASE WHEN rk = 1 THEN gram END) AS top_gram,
         max(CASE WHEN rk = 1 THEN cnt * len(gram) END) AS top_chars,
         coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * len(gram) END), 0) AS dup_chars
  FROM ranked GROUP BY 1, 2
), wide AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN top_freq END) AS top2_freq,
         max(CASE WHEN n = 2 THEN top_gram END) AS top2_gram,
         max(CASE WHEN n = 2 THEN top_chars END) AS top2_chars,
         max(CASE WHEN n = 2 THEN dup_chars END) AS dup2_chars,
         max(CASE WHEN n = 3 THEN top_freq END) AS top3_freq,
         max(CASE WHEN n = 3 THEN top_gram END) AS top3_gram,
         max(CASE WHEN n = 3 THEN top_chars END) AS top3_chars,
         max(CASE WHEN n = 3 THEN dup_chars END) AS dup3_chars
  FROM per_n GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.norm) AS BIGINT) AS nchars,
       CAST(coalesce(w.top2_freq, 0) AS BIGINT) AS top2_freq,
       coalesce(w.top2_gram, '') AS top2_gram,
       round(coalesce(w.top2_chars, 0) / len(t.norm), 4) AS top2_char_frac,
       round(coalesce(w.dup2_chars, 0) / len(t.norm), 4) AS dup2_char_frac,
       CAST(coalesce(w.top3_freq, 0) AS BIGINT) AS top3_freq,
       coalesce(w.top3_gram, '') AS top3_gram,
       round(coalesce(w.top3_chars, 0) / len(t.norm), 4) AS top3_char_frac,
       round(coalesce(w.dup3_chars, 0) / len(t.norm), 4) AS dup3_char_frac,
       round(coalesce(w.top2_chars, 0) / len(t.norm), 4) <= 0.20 AS rule_top2,
       round(coalesce(w.top3_chars, 0) / len(t.norm), 4) <= 0.18 AS rule_top3,
       round(coalesce(w.top2_chars, 0) / len(t.norm), 4) <= 0.20
         AND round(coalesce(w.top3_chars, 0) / len(t.norm), 4) <= 0.18 AS passes
FROM t LEFT JOIN wide w USING (doc_id)
ORDER BY t.doc_id
"""


def template_prefix_clusters(spark, sf_dir):
    """Boilerplate-template detection by shared document PREFIX: documents
    whose first 8 tokens hash identically form a template cluster (the
    CCNet observation that crawl boilerplate concentrates at document
    heads — headers, cookie banners, nav bars). Reports clusters with ≥ 2
    members: size, representative (min doc_id), and distinct sources
    touched — a cluster spanning many sources is a site template, within
    one source a mirrored page.

    One tokenize + one groupBy on the 128-bit prefix hash; documents
    never shuffle (only (hash, doc_id, source) triples), identical to the
    exact-dedup scale shape."""
    d = _t(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(TXT.tokens(F.col("text")), 1, 8), " ")
    return (
        d.select("doc_id", "source", F.md5(prefix).alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("prefix_hash")
    )


TEMPLATE_PREFIX_SQL = r"""
WITH pfx AS (
  SELECT doc_id, source,
         md5(array_to_string(
               (string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                             ' '))[1:8], ' ')) AS prefix_hash
  FROM documents
)
SELECT prefix_hash,
       count(*) AS n_docs,
       min(doc_id) AS rep_doc_id,
       count(DISTINCT source) AS n_sources
FROM pfx
GROUP BY prefix_hash
HAVING count(*) >= 2
ORDER BY prefix_hash
"""


def tokenizer_fertility_stats(spark, sf_dir):
    """Tokenizer fertility (chars per BPE-ish token) by language and
    source — the first diagnostic when a tokenizer underserves a language
    (high fertility = more tokens per char = shorter effective context).
    Integer char/token totals; the ratio rounds from exact bigints.
    Zero-shuffle scan projection + one bounded-key aggregate."""
    d = _t(spark, sf_dir, "documents")
    toks = TXT.bpe_ish_token_count(F.col("text"))
    nchars = F.length(TXT.normalize_ws(F.col("text")))
    return (
        d.select("lang", "source", toks.alias("t"), nchars.alias("c"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("t").cast("decimal(38,0)")).cast("long").alias("total_tokens"),
            F.sum(F.col("c").cast("decimal(38,0)")).cast("long").alias("total_chars"),
            F.round(
                F.sum(F.col("c").cast("decimal(38,0)")).cast("double")
                / F.sum(F.col("t").cast("decimal(38,0)")).cast("double"),
                4,
            ).alias("chars_per_token"),
        )
        .orderBy("lang", "source")
    )


FERTILITY_SQL = r"""
WITH base AS (
  SELECT lang, source,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS t,
         len(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS c
  FROM documents
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(CAST(t AS HUGEINT)) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(c AS HUGEINT)) AS BIGINT) AS total_chars,
       round(CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE)
             / CAST(sum(CAST(t AS HUGEINT)) AS DOUBLE), 4) AS chars_per_token
FROM base
GROUP BY lang, source
ORDER BY lang, source
"""


def lang_rebalance_plan(spark, sf_dir):
    """Corpus-mix rebalancing plan: given a uniform target share across
    languages, compute each language's token mass, its share of the
    corpus, and the deterministic downsampling rate (micro-units) that
    equalizes token budgets — the planning query behind every "rebalance
    the training mix" decision. Rates are round(1e6·min(1, budget/actual))
    from exact integer token totals; the sampled expectation is integer
    arithmetic on those rates.

    Two tiny aggregates (per-lang, then global scalar broadcast) — the
    decision table is O(langs) however big the corpus."""
    d = _t(spark, sf_dir, "documents")
    toks = TXT.token_count(F.col("text"))
    per_lang = d.select("lang", toks.alias("t")).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("t").cast("decimal(38,0)")).cast("long").alias("lang_tokens"),
    )
    tot = per_lang.agg(
        F.sum(F.col("lang_tokens").cast("decimal(38,0)")).cast("long").alias("total_tokens"),
        F.count("*").alias("n_langs"),
    )
    j = per_lang.crossJoin(F.broadcast(tot))
    budget = (F.col("total_tokens") / F.col("n_langs")).cast("double")
    rate = F.round(
        F.least(
            F.lit(1000000.0),
            F.lit(1000000.0) * budget / F.col("lang_tokens").cast("double"),
        )
    ).cast("long")
    return (
        j.select(
            "lang",
            "n_docs",
            "lang_tokens",
            F.round(
                F.col("lang_tokens").cast("double")
                / F.col("total_tokens").cast("double"),
                6,
            ).alias("corpus_share"),
            rate.alias("keep_rate_micro"),
        )
        # exact integer floor division (`div`), NOT `/`: a double quotient
        # rounded to nearest can land one ULP above an integer and then
        # cast-truncate differently than the oracle's `//`
        .withColumn(
            "expected_tokens",
            F.expr("(keep_rate_micro * lang_tokens) div 1000000"),
        )
        .orderBy("lang")
    )


REBALANCE_SQL = r"""
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                       AS HUGEINT)) AS BIGINT) AS lang_tokens
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(CAST(lang_tokens AS HUGEINT)) AS BIGINT) AS total_tokens,
         count(*) AS n_langs
  FROM per_lang
)
SELECT lang, n_docs, lang_tokens,
       round(CAST(lang_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
         AS corpus_share,
       CAST(round(least(1000000.0,
                        1000000.0 * (CAST(total_tokens AS DOUBLE) / n_langs)
                          / CAST(lang_tokens AS DOUBLE))) AS BIGINT)
         AS keep_rate_micro,
       CAST(CAST(round(least(1000000.0,
                        1000000.0 * (CAST(total_tokens AS DOUBLE) / n_langs)
                          / CAST(lang_tokens AS DOUBLE))) AS BIGINT)
            * lang_tokens // 1000000 AS BIGINT) AS expected_tokens
FROM per_lang CROSS JOIN tot
ORDER BY lang
"""


def dedup_survivor_provenance(spark, sf_dir):
    """Dedup with PROVENANCE: the survivor of each exact-duplicate group
    carries merged metadata from every copy it replaced — distinct source
    count, the full source list (ordered), earliest/latest doc_id, and
    copy count. Dropping duplicates without recording where they lived
    loses exactly the signal (cross-source replication) that matters for
    weighting; this is the canonicalization query a real pipeline runs
    instead of a bare distinct.

    One shuffle on the 128-bit fingerprint; text itself reduces to the
    hash before moving.

    The synthetic corpus has no natural exact duplicates, so every 10th
    document is re-published under a mirror source with a shifted id —
    the identical injection in the oracle — making the provenance merge
    end-to-end checkable rather than vacuously empty."""
    d = _t(spark, sf_dir, "documents")
    from kinesis_app_spark.functions.text import fingerprint

    max_id = d.agg(F.max("doc_id")).collect()[0][0] or 0  # None on an empty corpus
    mirrored = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(max_id + 1)).alias("doc_id"),
        F.col("text"),
        F.concat(F.lit("mirror-of-"), F.col("source")).alias("source"),
        F.col("n_chars"),
    )
    aug = d.select("doc_id", "text", "source", "n_chars").unionByName(mirrored)
    return (
        aug.select(
            fingerprint(F.col("text")).alias("fp"),
            "doc_id",
            "source",
            "n_chars",
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.array_join(
                F.array_sort(F.collect_set("source")), ","
            ).alias("sources"),
            F.max("doc_id").alias("latest_copy_id"),
            F.max("n_chars").alias("n_chars"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy("canonical_id")
    )


SURVIVOR_PROVENANCE_SQL = r"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
aug AS (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL BY NAME
  SELECT d.doc_id + mx.m + 1 AS doc_id, d.text,
         'mirror-of-' || d.source AS source, d.n_chars
  FROM documents d CROSS JOIN mx WHERE d.doc_id % 10 = 0
), fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         doc_id, source, n_chars
  FROM aug
)
SELECT fp,
       min(doc_id) AS canonical_id,
       count(*) AS n_copies,
       count(DISTINCT source) AS n_sources,
       array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
       max(doc_id) AS latest_copy_id,
       max(n_chars) AS n_chars
FROM fp
GROUP BY fp
HAVING count(*) >= 2
ORDER BY canonical_id
"""


def corpus_snapshot_diff(spark, sf_dir):
    """Set reconciliation between two corpus snapshots — the "what changed
    since the last crawl" ops query. Snapshot B is derived
    deterministically from the documents table (every 7th doc removed,
    every 5th remaining doc re-texted, new docs appended past the max id),
    with the identical derivation in the oracle; the diff itself is a
    full outer join on doc_id comparing content fingerprints, classified
    into added / removed / changed / unchanged counts per source.

    Scale: both sides reduce to (doc_id, fp) before the join — one
    co-partitioned shuffle each, no text movement; per-source rollup is a
    bounded-key aggregate."""
    from kinesis_app_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    a = d.select("doc_id", "source", fingerprint(F.col("text")).alias("fp"))
    max_id = d.agg(F.max("doc_id")).collect()[0][0] or 0  # None on an empty corpus
    b_kept = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            fingerprint(F.concat(F.col("text"), F.lit(" revised"))),
        )
        .otherwise(fingerprint(F.col("text")))
        .alias("fp"),
    )
    b_new = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(max_id + 1)).alias("doc_id"),
        "source",
        fingerprint(F.concat(F.lit("new "), F.col("text"))).alias("fp"),
    )
    b = b_kept.unionByName(b_new)
    j = a.alias("a").join(b.alias("b"), "doc_id", "full_outer")
    status = (
        F.when(F.col("a.fp").isNull(), F.lit("added"))
        .when(F.col("b.fp").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "status")
    )


SNAPSHOT_DIFF_SQL = r"""
WITH a AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
), mx AS (SELECT max(doc_id) AS m FROM documents),
b AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN md5(trim(regexp_replace(lower(text || ' revised'), '\s+', ' ', 'g')))
              ELSE md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
         END AS fp
  FROM documents WHERE doc_id % 7 != 0
  UNION ALL BY NAME
  SELECT d.doc_id + mx.m + 1 AS doc_id, d.source,
         md5(trim(regexp_replace(lower('new ' || d.text), '\s+', ' ', 'g'))) AS fp
  FROM documents d CROSS JOIN mx WHERE d.doc_id % 11 = 0
), j AS (
  SELECT coalesce(a.source, b.source) AS source,
         CASE WHEN a.fp IS NULL THEN 'added'
              WHEN b.fp IS NULL THEN 'removed'
              WHEN a.fp != b.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b USING (doc_id)
)
SELECT source, status, count(*) AS n_docs
FROM j
GROUP BY source, status
ORDER BY source, status
"""


def ngram_novelty_docs(spark, sf_dir):
    """Per-document n-gram NOVELTY: the fraction of a document's distinct
    3-gram shingles that appear in no other document (corpus document
    frequency = 1) — high novelty separates original content from remix;
    near-zero novelty is boilerplate. The memorization-risk dual of the
    dedup family's similarity scores.

    Inverted-posting shape: distinct (shingle, doc) postings → df count
    keyed by shingle → per-doc novel/total rollup keyed by doc — three
    bounded-key shuffles of hashes and ids, text never moves."""
    d = _t(spark, sf_dir, "documents")
    post = d.select(
        "doc_id", F.explode(TXT.word_shingles(F.col("text"), 3)).alias("sh")
    )
    dfreq = post.groupBy("sh").agg(F.count("*").alias("df"))
    per_doc = (
        post.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count_if(F.col("df") == 1).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles"), 4
        ).alias("novelty"),
    ).orderBy("doc_id")


NGRAM_NOVELTY_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), post AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:(i+2)], ' ') AS sh
  FROM toks,
       UNNEST(CASE WHEN len(t) >= 3 THEN generate_series(1, len(t)-2) ELSE [] END) AS g(i)
), dfreq AS (
  SELECT sh, count(*) AS df FROM post GROUP BY 1
)
SELECT p.doc_id,
       count(*) AS n_shingles,
       count(*) FILTER (WHERE d.df = 1) AS n_novel,
       round(count(*) FILTER (WHERE d.df = 1) / CAST(count(*) AS DOUBLE), 4)
         AS novelty
FROM post p JOIN dfreq d USING (sh)
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


def langid_confusion_matrix(spark, sf_dir):
    """Language-ID EVALUATION: confusion matrix of the stopword-marker
    classifier against the ground-truth lang column, with per-cell share
    of the true language's documents — the harness that turns "we have a
    lang-id heuristic" into "we know its per-language failure modes"
    (the same eval-first discipline as the retrieval metrics entry).
    Two bounded-key aggregates; share is an exact integer ratio."""
    from kinesis_app_spark.operators import textanalysis as TA

    d = _t(spark, sf_dir, "documents")
    pred = TA.lang_id(d).select("doc_id", "pred_lang")
    truth = d.select("doc_id", "lang")
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    totals = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_lang"), 4
            ).alias("share"),
            (F.col("lang") == F.col("pred_lang")).alias("correct"),
        )
        .orderBy("lang", "pred_lang")
    )


LANGID_CONFUSION_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), counts AS (
  SELECT doc_id, lang,
         len(list_filter(t, x -> x IN ('the','a','of','and','is')))   AS c_en,
         len(list_filter(t, x -> x IN ('el','la','de','y','es')))     AS c_es,
         len(list_filter(t, x -> x IN ('le','la','de','et','est')))   AS c_fr,
         len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) AS c_de,
         len(list_filter(t, x -> x IN ('zh0','zh1','zh2','zh3','zh4'))) AS c_zh
  FROM toks
), pred AS (
  SELECT doc_id, lang,
         CASE
           WHEN c_zh > greatest(c_en, c_es, c_fr, c_de) THEN 'zh'
           WHEN c_de > greatest(c_en, c_es, c_fr)       THEN 'de'
           WHEN c_fr > greatest(c_en, c_es)             THEN 'fr'
           WHEN c_es > c_en                             THEN 'es'
           ELSE 'en'
         END AS pred_lang
  FROM counts
), cells AS (
  SELECT lang, pred_lang, count(*) AS n_docs
  FROM pred GROUP BY 1, 2
), totals AS (
  SELECT lang, sum(n_docs) AS n_lang FROM cells GROUP BY 1
)
SELECT c.lang, c.pred_lang, c.n_docs,
       round(CAST(c.n_docs AS DOUBLE) / t.n_lang, 4) AS share,
       c.lang = c.pred_lang AS correct
FROM cells c JOIN totals t USING (lang)
ORDER BY c.lang, c.pred_lang
"""


def pipeline_pretraining_mix(spark, sf_dir):
    """The rebalance plan APPLIED: compute each language's uniform-budget
    keep-rate (as in lang_rebalance_plan), then actually sample the
    corpus with the deterministic md5-micro draw (doc kept iff
    md5(doc_id) mod 1e6 < rate) and report achieved vs budgeted token
    mass per language — the full "plan the mix, build the mix, audit the
    drift" loop in one query. Everything integer-exact except the final
    achieved/budget ratio.

    Shape: two O(langs) aggregates + a broadcast of the rate table back
    onto one corpus scan; the sample predicate is a codegen projection,
    so at 100 TB this is scan + two tiny joins."""
    d = _t(spark, sf_dir, "documents")
    toks = TXT.token_count(F.col("text"))
    per_lang = d.select("lang", toks.alias("t")).groupBy("lang").agg(
        F.sum(F.col("t").cast("decimal(38,0)")).cast("long").alias("lang_tokens")
    )
    tot = per_lang.agg(
        F.sum(F.col("lang_tokens").cast("decimal(38,0)")).cast("long").alias("total_tokens"),
        F.count("*").alias("n_langs"),
    )
    rates = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "lang_tokens",
        F.expr("total_tokens div n_langs").alias("budget_tokens"),
        F.round(
            F.least(
                F.lit(1000000.0),
                F.lit(1000000.0)
                * (F.col("total_tokens") / F.col("n_langs")).cast("double")
                / F.col("lang_tokens").cast("double"),
            )
        )
        .cast("long")
        .alias("keep_rate_micro"),
    )
    u_micro = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 1000000
    )
    sampled = (
        d.select("lang", toks.alias("t"), u_micro.alias("u"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("u") < F.col("keep_rate_micro"))
    )
    kept = sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum(F.col("t").cast("decimal(38,0)")).cast("long").alias("kept_tokens"),
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "lang_tokens",
            "budget_tokens",
            "keep_rate_micro",
            F.coalesce("n_docs_kept", F.lit(0)).cast("long").alias("n_docs_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            F.round(
                F.coalesce("kept_tokens", F.lit(0)).cast("double")
                / F.col("budget_tokens").cast("double"),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy("lang")
    )


PRETRAINING_MIX_SQL = r"""
WITH per_lang AS (
  SELECT lang,
         CAST(sum(CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                       AS HUGEINT)) AS BIGINT) AS lang_tokens
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(CAST(lang_tokens AS HUGEINT)) AS BIGINT) AS total_tokens,
         count(*) AS n_langs
  FROM per_lang
), rates AS (
  SELECT lang, lang_tokens,
         total_tokens // n_langs AS budget_tokens,
         CAST(round(least(1000000.0,
                          1000000.0 * (CAST(total_tokens AS DOUBLE) / n_langs)
                            / CAST(lang_tokens AS DOUBLE))) AS BIGINT)
           AS keep_rate_micro
  FROM per_lang CROSS JOIN tot
), sampled AS (
  SELECT d.lang,
         len(string_split(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1000000 < r.keep_rate_micro
), kept AS (
  SELECT lang, count(*) AS n_docs_kept,
         CAST(sum(CAST(t AS HUGEINT)) AS BIGINT) AS kept_tokens
  FROM sampled GROUP BY lang
)
SELECT r.lang, r.lang_tokens, r.budget_tokens, r.keep_rate_micro,
       CAST(coalesce(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       round(CAST(coalesce(k.kept_tokens, 0) AS DOUBLE)
             / CAST(r.budget_tokens AS DOUBLE), 4) AS fill_ratio
FROM rates r LEFT JOIN kept k USING (lang)
ORDER BY r.lang
"""


def url_canonicalize_docs(spark, sf_dir):
    """URL canonicalization + registrable-domain rollup over synthesized
    messy URLs (scheme http/https, WWW./cdn. subdomains, MiXeD-case
    hosts, .com/.co.uk/.org/.io TLDs, trailing slashes, utm_* tracking
    params around a meaningful id param, fragments — all deterministic
    doc_id arithmetic). The Spark side must genuinely parse_url/strip/
    lowercase its way to the canonical forms; the oracle builds the SAME
    canonical values directly from the arithmetic, so any canonicalizer
    defect (kept tracking param, unstripped www, wrong registrable
    domain for co.uk) breaks the hash. Per-domain n_hosts > 1 proves
    subdomain folding; n_canonical < n_docs proves variant folding."""
    from kinesis_app_spark.operators.curation import canonicalize_urls

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.element_at(
            F.array(F.lit("WWW."), F.lit(""), F.lit("cdn.")),
            (i % 3 + 1).cast("int"),
        ),
        F.lit("SiTe"),
        i % 7,
        F.element_at(
            F.array(F.lit(".com"), F.lit(".co.uk"), F.lit(".org"), F.lit(".io")),
            (i % 4 + 1).cast("int"),
        ),
        F.lit("/p/"),
        i % 5,
        F.when(i % 6 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            i % 5 != 4,
            F.concat(
                F.lit("?utm_source=feed&id="), i % 11, F.lit("&utm_medium=x")
            ),
        ).otherwise(F.lit("")),
        F.lit("#sec"),
        i % 3,
    )
    canon = canonicalize_urls(docs.select("doc_id", url.alias("url")))
    return (
        canon.groupBy("reg_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canon_host").cast("long").alias("n_hosts"),
            F.countDistinct("canonical_url").cast("long").alias("n_canonical"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("reg_domain")
    )


URL_CANON_SQL = """
WITH u AS (
  SELECT doc_id AS i,
         (CASE WHEN doc_id % 3 = 2 THEN 'cdn.' ELSE '' END)
           || 'site' || (doc_id % 7)
           || (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
                               WHEN 2 THEN '.org' ELSE '.io' END) AS chost,
         'site' || (doc_id % 7)
           || (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
                               WHEN 2 THEN '.org' ELSE '.io' END) AS rdom,
         '/p/' || (doc_id % 5) AS cpath,
         CASE WHEN doc_id % 5 = 4 THEN ''
              ELSE '?id=' || (doc_id % 11) END AS cq
  FROM documents
)
SELECT rdom AS reg_domain,
       count(*) AS n_docs,
       CAST(count(DISTINCT chost) AS BIGINT) AS n_hosts,
       CAST(count(DISTINCT 'https://' || chost || cpath || cq) AS BIGINT)
         AS n_canonical,
       min(i) AS min_doc
FROM u
GROUP BY 1
ORDER BY reg_domain
"""


REGISTRY_CURATION2 = {
    "url_canonicalize_docs": QuerySpec(url_canonicalize_docs, URL_CANON_SQL),
    "pipeline_pretraining_mix": QuerySpec(
        pipeline_pretraining_mix, PRETRAINING_MIX_SQL
    ),
    "langid_confusion_matrix": QuerySpec(
        langid_confusion_matrix, LANGID_CONFUSION_SQL
    ),
    "dedup_survivor_provenance": QuerySpec(
        dedup_survivor_provenance, SURVIVOR_PROVENANCE_SQL
    ),
    "corpus_snapshot_diff": QuerySpec(corpus_snapshot_diff, SNAPSHOT_DIFF_SQL),
    "ngram_novelty_docs": QuerySpec(ngram_novelty_docs, NGRAM_NOVELTY_SQL),
    "tokenizer_fertility_stats": QuerySpec(
        tokenizer_fertility_stats, FERTILITY_SQL
    ),
    "lang_rebalance_plan": QuerySpec(lang_rebalance_plan, REBALANCE_SQL),
    "template_prefix_clusters": QuerySpec(
        template_prefix_clusters, TEMPLATE_PREFIX_SQL
    ),
    "gopher_repetition_docs": QuerySpec(
        gopher_repetition_docs, GOPHER_REPETITION_SQL
    ),
}
