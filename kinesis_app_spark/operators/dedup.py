"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB:
- Exact dedup is a hash-groupBy on a 128-bit fingerprint — one shuffle of
  (fingerprint, id), never of full text.
- MinHash signatures are computed per-row with JVM-side xxhash64 inside
  whole-stage codegen (no Python UDF), then LSH banding turns the O(n^2)
  pair problem into an equi-join on (band_idx, band_hash) — the only
  all-pairs work left is within buckets.
- The exact n-gram Jaccard join (inverted-index self-join) is the
  SQL-expressible oracle twin of the MinHash path.
- Embedding near-dup offers an exact quadratic mode (oracle-checkable) and
  a random-hyperplane-LSH-bucketed mode (the scale path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kinesis_app_spark.pinning import pin

from kinesis_app_spark.functions.text import fingerprint, word_shingles
from kinesis_app_spark.functions.vector import dot, l2_norm, to_double
from kinesis_app_spark.operators.util import spread


# ---------- exact ----------

def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: canonical (min) id + group size."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivor rows only (min id per fingerprint). Single window pass —
    one shuffle on the fingerprint, no join back."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------- exact n-gram Jaccard (inverted-index self-join) ----------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >= threshold.

    Exact algorithm via inverted index: explode distinct shingles, self-join
    postings on the shingle, count co-occurrences, then
    J = inter / (|A| + |B| - inter). Shuffles on the shingle — no cartesian
    product.

    max_shingle_df is the skew guard for the self-join: a stop-shingle
    appearing in D documents contributes D^2/2 join rows (a single
    boilerplate phrase across 1M docs is 5e11 rows), so postings for
    shingles with document frequency > max_shingle_df are dropped BEFORE
    the self-join. Set sizes keep counting the full shingle sets, so the
    reported Jaccard for pairs that shared a dropped shingle is an
    underestimate (conservative: borderline pairs held together only by
    boilerplate are missed — the standard stop-shingle trade). With
    max_shingle_df=None (the oracle twin) the result is exact.
    """
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    # Materialize the posting list ONCE, pre-partitioned by shingle: the
    # lambda-heavy shingling would otherwise re-execute for each self-join
    # side and each size lookup (no CSE across subplans), and the
    # pre-partitioning lets the self-join run exchange-free. Set size is
    # carried on every posting row and recovered with max() in the
    # intersection aggregate — no join back onto a sizes table. On a real
    # cluster swap localCheckpoint for persist(DISK_ONLY)/checkpoint.
    postings = (
        sh.select(
            "id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
        )
        .repartition("shingle")
        .transform(pin, eager=True)
    )
    if max_shingle_df is not None:
        # DF count reuses the existing shingle partitioning (no new
        # exchange); the hot-shingle list is tiny by construction (only
        # shingles above the cap) so it broadcasts into a left_anti.
        hot = (
            postings.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        postings = postings.join(F.broadcast(hot), "shingle", "left_anti")

    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.max(F.col("a.n_sh")).alias("n_a"),
            F.max(F.col("b.n_sh")).alias("n_b"),
        )
    )
    out = (
        inter.withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


def incremental_dedup(
    new: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Daily-ingest dedup: admit only new-batch docs that are neither exact
    nor near (n-gram Jaccard >= threshold) duplicates of the EXISTING
    corpus. Returns the surviving new rows.

    Plan shape at 100 TB:
    - exact gate: anti-join of 128-bit fingerprints — the existing corpus
      contributes one shuffle of (fp) and never moves its text;
    - near gate: cross-corpus inverted-index join keyed on the shingle
      (each side exploded once, only cross-side pairs aggregated), then a
      broadcast anti-join of the rejected new ids (small: duplicates of
      the corpus, not the corpus).

    Intra-batch duplicates are out of scope by design — compose with
    exact_dedup(new) first when the batch itself needs deduping.
    """
    fp_exist = (
        existing.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    )
    fresh = (
        new.withColumn("__fp", fingerprint(F.col(text_col)))
        .join(fp_exist, F.col("__fp") == fp_exist.fp, "left_anti")
        .drop("__fp")
    )

    def postings(df: DataFrame, out_id: str) -> DataFrame:
        sh = spread(df).select(
            F.col(id_col).alias(out_id),
            word_shingles(F.col(text_col), k).alias("shingles"),
        ).filter(F.size("shingles") > 0)
        return sh.select(
            out_id,
            F.size("shingles").alias(f"n_{out_id}"),
            F.explode("shingles").alias("shingle"),
        )

    new_p = postings(fresh, "new_id")
    old_p = postings(existing, "old_id")
    near_dup_ids = (
        new_p.join(old_p, "shingle")
        .groupBy("new_id", "old_id")
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.max("n_new_id").alias("n_a"),
            F.max("n_old_id").alias("n_b"),
        )
        .filter(
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= threshold
        )
        .select("new_id")
        .distinct()
    )
    return fresh.join(
        F.broadcast(near_dup_ids),
        fresh[id_col] == near_dup_ids.new_id,
        "left_anti",
    )


# ---------- MinHash + LSH ----------

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """array<bigint> MinHash signature, fully JVM-side:
    sig[i] = min over shingles of xxhash64(i, shingle)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s))
        ),
    )


def banded_minhash(
    sh: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band_idx, band_hash) LSH banding over a (id, shingles) frame
    — the shared signature kernel of minhash_lsh_pairs and the persisted
    dedup index (operators/dedupindex.py).

    One row per (doc, hash index) via explode, then a groupBy onto
    bands; the single-projection alternative (signature array sliced per
    band) triggers CollapseProject inlining that recomputes the whole
    signature 16x per row (measured 489s -> ~4s at sf0.1). Shuffles
    carry 8-byte minhashes, never text."""
    rows_per_band = num_hashes // bands
    mh = sh.select(
        "id",
        "shingles",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
    ).select(
        "id",
        "i",
        F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(F.col("i"), s))
        ).alias("mh"),
    )
    return mh.groupBy(
        "id", (F.col("i") / rows_per_band).cast("int").alias("band_idx")
    ).agg(
        F.xxhash64(
            F.col("band_idx"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "mh"))),
                    lambda x: x["mh"].cast("string"),
                ),
                ",",
            ),
        ).alias("band_hash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    bands=16 x rows=4 over 64 hashes targets ~J>=0.5 candidates
    (P(candidate) = 1-(1-J^4)^16). Candidate generation is an equi-join on
    (band_idx, band_hash); verification computes exact Jaccard from the
    (small) candidate set via array_intersect on the stored shingle sets.

    Plan shape: one row per (doc, hash index) via explode, then a groupBy
    onto bands. The single-projection alternative (a signature array column
    sliced per band) looks cheaper but is catastrophically slower: Catalyst's
    CollapseProject inlines the signature expression into each of the 16
    band expressions — and the shingle expression into each of those — so
    the whole signature gets recomputed 16x per row (measured 489s -> ~4s at
    sf0.1 for this shape). The explode materializes shingles once per doc;
    the band groupBy shuffles 8-byte minhashes, never text.
    """
    # sh feeds THREE consumers (the banding kernel + both verify sides)
    # and banded feeds BOTH sides of the candidate self-join: without
    # pins the shingling pass runs 3x and the 64-hash minhash fold 2x
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).filter(F.size("shingles") > 0).transform(pin, eager=False)
    banded = banded_minhash(
        sh, num_hashes=num_hashes, bands=bands
    ).transform(pin, eager=False)

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sh_a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


# ---------- SimHash ----------

def _bit_masks(num_bits: int) -> Column:
    """Literal array [1<<0, 1<<1, ..., 1<<(num_bits-1)] as signed longs
    (bit 63's mask is the sign bit, -(1<<63))."""
    return F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(num_bits)
        ]
    )


def simhash_long(hashes: Column, num_bits: int = 64) -> Column:
    """SimHash as a signed 64-bit LONG from a pre-materialized token-hash
    array column.

    One array-accumulator pass: each token-hash votes +/-1 into a
    num_bits-slot array via zip_with against a literal mask array, then
    positive slots OR their masks together (a sum of distinct masks IS the
    OR). The single aggregate keeps the codegen tree ~num_bits times
    smaller than the one-aggregate-per-bit alternative (measured 5x faster
    at sf0.1), and the long representation makes banding a shift+mask and
    the Hamming verify a single bit_count(xor) — no per-pair 64-element
    string zip. An exchange barrier between the hash projection and the
    aggregate is ~7x slower than letting the projections collapse, so no
    barrier here.
    """
    if num_bits > 64:
        raise ValueError("simhash_long packs into one long: num_bits <= 64")
    masks = _bit_masks(num_bits)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), num_bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda ai, m: ai + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc + m,
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    token_hasher: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band on num_bits/bands-bit fields of the
    packed long (pigeonhole: hamming <= bands-1 guarantees a shared band),
    verify exact Hamming distance with bit_count(xor).

    Because max_hamming <= bands-1, the banding NEVER misses a qualifying
    pair — the output is EXACTLY every pair with Hamming distance <=
    max_hamming, independent of the banding. That makes the result
    oracle-checkable whenever the token hash is reproducible outside
    Spark: ``token_hasher="md5"`` uses the low 60 bits of MD5 (
    conv(substr(md5(t),1,15),16,10) — both Spark and DuckDB compute this
    bit-for-bit; pass num_bits=60 with it), while the default
    ``"xxhash64"`` stays on the faster engine-native hash."""
    from kinesis_app_spark.functions.text import tokens as tok

    band_width = num_bits // bands
    if token_hasher == "md5":
        if num_bits > 60:
            raise ValueError("md5 token hasher provides 60 portable bits")
        hasher = lambda t: F.conv(  # noqa: E731
            F.substring(F.md5(t), 1, 15), 16, 10
        ).cast("long")
    elif token_hasher == "xxhash64":
        hasher = lambda t: F.xxhash64(t)  # noqa: E731
    else:
        raise ValueError(f"unknown token_hasher: {token_hasher!r}")
    hashed = spread(df).select(
        F.col(id_col).alias("id"),
        F.transform(tok(F.col(text_col)), hasher).alias("hashes"),
    )
    s = hashed.select(
        "id",
        simhash_long(F.col("hashes"), num_bits).alias("sh"),
    )
    band_mask = F.lit((1 << band_width) - 1).cast("long")
    banded = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.shiftrightunsigned(F.col("sh"), bi * band_width)
                        .bitwiseAND(band_mask)
                        .alias("band_val"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sh", F.col("band.band_idx").alias("band_idx"), F.col("band.band_val").alias("band_val"))
    # banded feeds both sides of the candidate self-join; pin it so the
    # token-hash + simhash vote fold runs once, not once per side
    banded = banded.transform(pin, eager=False)

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------- embedding cosine near-dup ----------

#: Above this row count the exact all-pairs / full-corpus-broadcast forms
#: refuse to run: O(n^2) pair work (or a driver-side collect) past this size
#: is a scale bug, not a slow query. The LSH-bucketed branch has no cap.
MAX_EXACT_EMBEDDING_ROWS = 50_000


def _guard_exact_rows(df: DataFrame, max_rows: int, what: str) -> None:
    """Refuse quadratic/driver-collect paths on oversized inputs.

    limit(n+1).count() early-terminates the scan at n+1 rows, so the guard
    costs one cheap job, never a full count of a 100 TB table.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: input exceeds {max_rows} rows; this form is the "
            "exact oracle twin for small/sampled inputs only. Use "
            "embedding_near_dup_pairs(lsh_bits>0) — the LSH-bucketed "
            "scale path — or sample/limit the input."
        )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.40,
    lsh_bits: int = 0,
    lsh_tables: int = 8,
    max_exact_rows: int | None = MAX_EXACT_EMBEDDING_ROWS,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold.

    lsh_bits=0: exact all-pairs (oracle-checkable; only for small/sampled
    inputs — guarded by max_exact_rows, raising instead of launching an
    O(n^2) BroadcastNestedLoop join on an oversized corpus).
    lsh_bits>0: multi-table random-hyperplane LSH — lsh_tables
    independent lsh_bits-bit sign signatures per vector; a pair is a
    candidate if ANY table's signatures collide (recall ~ 1-(1-p^bits)^tables
    with p = 1 - angle/pi), and every candidate's true cosine is verified,
    so the result is a high-recall SUBSET of the exact pairs. Candidate
    generation is an equi-join on (table, signature) — the quadratic work
    collapses to within-bucket pairs, the 100 TB path.
    """
    df = spread(df)
    if lsh_bits == 0 and max_exact_rows is not None:
        _guard_exact_rows(df, max_exact_rows, "embedding_near_dup_pairs(lsh_bits=0)")
    if lsh_bits > 0:
        # the signature table feeds BOTH sides of the candidate self-join;
        # pin it so the Arrow matmul kernel runs once, not once per side
        # (the before plan carried the MapInPandas subtree twice —
        # plans/r08/dedup_embedding_lsh_before.txt)
        sig = _hyperplane_tables(
            df, vec_col, id_col, lsh_bits, lsh_tables
        ).transform(pin, eager=False)
        a_sig = sig.select(
            F.col(id_col).alias("id_a"), F.col("t").alias("ta"), F.col("sig").alias("sa")
        )
        b_sig = sig.select(
            F.col(id_col).alias("id_b"), F.col("t").alias("tb"), F.col("sig").alias("sb")
        )
        candidates = (
            a_sig.join(
                b_sig,
                (F.col("ta") == F.col("tb"))
                & (F.col("sa") == F.col("sb"))
                & (F.col("id_a") < F.col("id_b")),
            )
            .select("id_a", "id_b")
            .distinct()
        )
        va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        joined = candidates.join(va, "id_a").join(vb, "id_b")
        return _verify_cosine_np(joined, threshold)
    # Precompute each vector's L2 norm ONCE per row (n sqrt-folds), not once
    # per pair (n^2/2): the per-pair work drops to a single dot-product fold.
    # Bit-for-bit identical to cosine_similarity(): dot() folds x*y in the
    # same order as the fused xy accumulator, l2_norm() folds x*x in the same
    # order as xx, and dot/(na*nb) is the same op sequence as the fused
    # finish lambda xy/(sqrt(xx)*sqrt(yy)) — so the DuckDB oracle still
    # hash-matches. The norm projections sit directly under the join, and
    # CollapseProject cannot merge across a join, so they are not inlined
    # into the per-pair expression (measured 8.3s -> ~3s at sf0.1).
    a = df.select(
        F.col(id_col).alias("id_a"),
        to_double(F.col(vec_col)).alias("va"),
        l2_norm(to_double(F.col(vec_col))).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        to_double(F.col(vec_col)).alias("vb"),
        l2_norm(to_double(F.col(vec_col))).alias("nb"),
    )
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn(
            "cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def _verify_cosine_np(
    joined: DataFrame, threshold: float
) -> DataFrame:
    """Vectorized cosine verification of (id_a, id_b, va, vb) candidate
    rows. The exact branch keeps the Column-algebra cosine (bit-for-bit
    oracle parity); this Arrow path exists for the LSH branch where the
    candidate set can be a large fraction of all pairs and interpreted
    per-element lambdas dominate. No broadcast state — vectors flow with
    the candidate rows, so it scales with the candidate count, not the
    corpus."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(list(pdf["va"]), dtype=np.float64)
            b = np.array(list(pdf["vb"]), dtype=np.float64)
            cos = (a * b).sum(axis=1) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            )
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cos": np.round(cos[keep], 4),
                }
            )

    return joined.mapInPandas(kernel, "id_a long, id_b long, cos double")


def _hyperplane_tables(
    df: DataFrame, vec_col: str, id_col: str, bits: int, tables: int
) -> DataFrame:
    """(id, t, sig) rows: for each of `tables` LSH tables, a `bits`-bit
    sign signature (packed into a long) against Gaussian hyperplanes from a
    fixed-seed RNG — deterministic across partitions and runs, no RNG state
    shipped. Arrow-batched numpy: one (B, dim) @ (dim, tables*bits) matmul
    per batch replaces tables*bits*dim interpreted lambda evaluations per
    row (measured 11s -> <1s on 2k x 64 vectors at sf0.1)."""
    import numpy as np
    import pandas as pd

    n_planes = bits * tables
    packer = np.left_shift(np.int64(1), np.arange(bits, dtype=np.int64))

    def kernel(batches):
        w = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if w is None:
                w = np.random.default_rng(7).standard_normal((x.shape[1], n_planes))
            signs = (x @ w) > 0.0  # (B, n_planes)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            frames = []
            for t in range(tables):
                block = signs[:, t * bits : (t + 1) * bits].astype(np.int64)
                frames.append(
                    pd.DataFrame(
                        {id_col: ids, "t": t, "sig": block @ packer}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return spread(df.select(id_col, vec_col)).mapInPandas(
        kernel, f"{id_col} long, t int, sig long"
    )


def embedding_near_dup_pairs_np(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.40,
    max_exact_rows: int | None = MAX_EXACT_EMBEDDING_ROWS,
) -> DataFrame:
    """Numpy/BLAS variant of the exact all-pairs cosine near-dup: the
    corpus (which must fit in memory — same precondition as any broadcast
    side) is normalized once and broadcast; each Arrow batch computes one
    (B, N) matmul and emits only the above-threshold upper-triangle pairs.

    The collect below is guarded by max_exact_rows so an oversized corpus
    raises a clear error instead of OOMing the driver mid-collect.

    Same result set as embedding_near_dup_pairs(lsh_bits=0) — asserted in
    tests — at matmul speed. For corpora beyond broadcast size, use the
    lsh_bits>0 bucketed variant instead.
    """
    import numpy as np
    import pandas as pd

    if max_exact_rows is not None:
        _guard_exact_rows(df, max_exact_rows, "embedding_near_dup_pairs_np")
    rows = df.select(id_col, vec_col).collect()
    if not rows:
        # empty corpus: nothing to pair (np.array([]) is 1-D — normalizing
        # it would crash, and the kernel would never run anyway)
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos double"
        )
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def kernel(batches):
        ids_all, m_all = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            scores = a_mat @ m_all.T  # (B, N)
            mask = (scores >= threshold) & (a_ids[:, None] < ids_all[None, :])
            bi, ni = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": a_ids[bi],
                    "id_b": ids_all[ni],
                    "cos": np.round(scores[bi, ni], 4),
                }
            )

    return spread(df.select(id_col, vec_col)).mapInPandas(
        kernel, "id_a long, id_b long, cos double"
    )




# ---------- semantic dedup (SemDeDup) ----------

def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    threshold: float = 0.80,
    max_cluster_rows: int = MAX_EXACT_EMBEDDING_ROWS,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal for web-scale training corpora — cluster the
    embedding space with k-means, then look for near-duplicate pairs ONLY
    within each cluster, so the quadratic pair search is bounded by
    cluster size instead of corpus size. Returns one row per vector:
    (id, cluster, kept boolean).

    Determinism (the whole pipeline is cross-engine value-gateable):
    - centroid seeds are the vectors with id < n_clusters (a fixed
      k-means++-style seed pick, as kmeans_assign_embeddings);
    - assignment distances are exact integers over 1e-6-scaled
      components, ties break to the lower centroid id;
    - the keep rule is greedy lowest-id-wins: a vector is DROPPED iff
      some lower-id vector in its cluster has cosine >= threshold with
      it (the paper keeps the example farthest from the centroid; any
      deterministic representative rule gives the same dedup mass, and
      id order is reproducible across engines/runs).

    Scale shape: centroids ride into the scan as a broadcast literal; the
    corpus shuffles ONCE on cluster id for the self-join; per-cluster
    pair work is the SemDeDup contract (pick n_clusters so clusters stay
    bounded — the max_cluster_rows guard raises instead of letting one
    fat cluster go quadratic). Norms are computed once per row under the
    join, not once per pair."""
    df = spread(df)
    scaled = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1e6).cast("long")
    )
    seeds = [
        (int(r[id_col]), [int(x) for x in r["v"]])
        for r in df.filter(F.col(id_col) < n_clusters)
        .select(id_col, scaled.alias("v"))
        .collect()
    ]
    if not seeds:
        raise ValueError(
            f"semantic_dedup: no centroid seeds ({id_col} < {n_clusters}) "
            "in the corpus — assignment would be NULL for every vector"
        )
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(x) for x in vec]).alias("cvec"),
            )
            for cid, vec in seeds
        ]
    )
    from kinesis_app_spark.functions.text import let_bound

    dists = let_bound(
        scaled,
        lambda v: F.transform(
            cent_lit,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(v, c["cvec"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("sqdist"),
                c["cid"].alias("cid"),
            ),
        ),
    )
    # pinned: assigned feeds FOUR consumers (the fat-cluster guard count,
    # both sides of the within-cluster self-join, and the final kept
    # join) — without the pin each re-runs the scan + the k-centroid
    # distance fold per row
    assigned = df.select(
        F.col(id_col),
        to_double(F.col(vec_col)).alias("vec"),
        l2_norm(to_double(F.col(vec_col))).alias("norm"),
        F.array_min(dists)["cid"].alias("cluster"),
    ).transform(pin, eager=False)
    fattest = (
        assigned.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
    )
    if fattest and fattest > max_cluster_rows:
        raise ValueError(
            f"semantic_dedup: largest cluster has {fattest} rows "
            f"(> {max_cluster_rows}); raise n_clusters so the "
            "within-cluster pair search stays bounded"
        )
    a = assigned.select(
        F.col("cluster").alias("ca"),
        F.col(id_col).alias("id_a"),
        F.col("vec").alias("va"),
        F.col("norm").alias("na"),
    )
    b = assigned.select(
        F.col("cluster").alias("cb"),
        F.col(id_col).alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
    )
    dup_ids = (
        a.join(
            b,
            (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn(
            "cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("kept"),
        )
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    order: str = "hash",
) -> DataFrame:
    """All pairs with Jaccard >= threshold via PREFIX FILTERING (the
    SSJoin/PPJoin family) — exact output, candidate set a fraction of the
    inverted-index self-join's.

    Canonical order — ANY global total order satisfies the prefix-filter
    lemma; two are offered:
    - ``order="hash"`` (default): shingles sorted by (xxhash64, shingle)
      IN-ROW — the prefix is a codegen array_sort+slice inside the doc
      row, so candidate generation adds ZERO shuffles over the plain
      posting join.
    - ``order="df"``: document-frequency ASCENDING — costs one extra
      count shuffle + one join, but the prefixes then hold the RAREST
      shingles, so the candidate join's key distribution is the cold
      tail: the skew-tuned choice for a boilerplate-ridden corpus.
    Both produce the IDENTICAL final pair set (verification is exact);
    tests pin the equality.

    Each doc indexes only its first p = |x| - ceil(t*|x|) + 1 shingles.
    Completeness: J(A,B) >= t implies |A^B| >= ceil(t*max(|A|,|B|))
    (since min >= t*max), and an intersection that avoided either prefix
    entirely would fit in the ceil(t*|x|)-1 tail — contradiction; so
    every qualifying pair shares a prefix shingle and the filter loses
    nothing (unlike the max_shingle_df stop-shingle cap, which trades
    recall for the same safety).

    Scale notes (100 TB): the self-join's posting list shrinks from
    sum(|x|) to ~ (1-t)*sum(|x|) rows. Verification joins the two full
    shingle arrays back by doc id and intersects in-row
    (array_intersect, codegen); at petabyte scale carry
    xxhash64(shingle) arrays so verify rows stay fixed-width.
    """
    sh = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), k).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .transform(pin, eager=True)
    )
    plen = (
        F.size("shingles")
        - F.ceil(F.lit(threshold) * F.size("shingles"))
        + 1
    ).cast("int")
    if order == "hash":
        ordered_arr = F.array_sort(
            F.transform(
                F.col("shingles"),
                lambda s: F.struct(
                    F.xxhash64(s).alias("h"), s.alias("shingle")
                ),
            )
        )
        prefix = (
            sh.select(
                "id",
                F.size("shingles").alias("n"),
                F.explode(F.slice(ordered_arr, F.lit(1), plen)).alias("p"),
            )
            .select("id", "n", F.col("p.shingle").alias("shingle"))
            .transform(pin, eager=True)
        )
    elif order == "df":
        postings = sh.select(
            "id",
            F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("shingle"),
        )
        dfreq = postings.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("sdf")
        )
        ordered = (
            postings.join(dfreq, "shingle")
            .groupBy("id")
            .agg(
                F.max("n_sh").alias("n_sh"),
                F.sort_array(
                    F.collect_list(F.struct(F.col("sdf"), F.col("shingle")))
                ).alias("ord"),
            )
        )
        dlen = (
            F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        ).cast("int")
        prefix = (
            ordered.select(
                "id",
                F.col("n_sh").alias("n"),
                F.explode(F.slice(F.col("ord"), F.lit(1), dlen)).alias("p"),
            )
            .select("id", "n", F.col("p.shingle").alias("shingle"))
            .repartition("shingle")
            .transform(pin, eager=True)
        )
    else:
        raise ValueError(f"unknown canonical order {order!r}")
    a, b = prefix.alias("a"), prefix.alias("b")
    # the SIZE FILTER rides the candidate join: J >= t forces
    # t*max(|A|,|B|) <= min(|A|,|B|), so length-mismatched pairs die in
    # the join predicate, before the distinct and the array verify
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.greatest(F.col("a.n"), F.col("b.n"))
                * F.lit(threshold)
                <= F.least(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # the verify is per-row CPU (hash-set intersection of two ~|x| string
    # arrays), and AQE coalesces the candidate shuffle by BYTES — id-pair
    # rows are so narrow that a multi-hundred-thousand-pair candidate set
    # coalesces to a couple of tasks, serializing the verify (observed:
    # 3 tasks, 5.6 s -> the whole entry's cost). stats-gated spread()
    # cannot see this (join-cardinality estimates overshoot its byte
    # threshold), so re-widen unconditionally: one narrow exchange of
    # 16-byte pairs, which at real scale doubles as the balancing step
    # you want in front of a per-pair verify anyway
    cand = cand.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
