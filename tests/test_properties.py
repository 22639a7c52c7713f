"""Property-based tests (hypothesis) for the dedup/asof operator family —
the reference's own test style (its only tested code is property-style
assignment invariants, test/main.hs) applied to this engine's operators.

Small bounded inputs + few examples keep each Spark roundtrip cheap; the
properties target semantics no single fixture pins down.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kinesis_app_spark.operators.asof import asof_join
from kinesis_app_spark.operators.dedup import (
    incremental_dedup,
    ngram_jaccard_pairs,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: tiny vocabulary => collisions and near-dups actually happen
_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsi", "zeta"])
_doc = st.lists(_words, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@SETTINGS
@given(_corpus)
def test_ngram_jaccard_matches_bruteforce(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(enumerate(docs), 2):
        sa, sb = _shingles(ta), _shingles(tb)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            want[(ia, ib)] = round(j, 4)
    assert got == want


@SETTINGS
@given(_corpus, _corpus)
def test_incremental_dedup_invariants(spark, new_docs, old_docs):
    """Admitted new docs are never exact duplicates of the corpus, and
    docs with no shingle overlap at all are always admitted."""
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_docs)], "doc_id long, text string"
    )
    old = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(old_docs)],
        "doc_id long, text string",
    )
    admitted = {
        r["doc_id"]: r["text"]
        for r in incremental_dedup(new, old, threshold=0.5).collect()
    }
    old_norm = {" ".join(t.lower().split()) for t in old_docs}
    for t in admitted.values():
        assert " ".join(t.lower().split()) not in old_norm
    # completeness: a new doc sharing no shingle with any old doc survives
    old_sh = set().union(*(_shingles(t) for t in old_docs)) if old_docs else set()
    for i, t in enumerate(new_docs):
        if " ".join(t.lower().split()) in old_norm:
            continue
        if _shingles(t) & old_sh:
            continue
        assert i in admitted, f"disjoint doc {t!r} was wrongly rejected"


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1, max_size=10, unique=True,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=0, max_size=10, unique=True,
    ),
)
def test_asof_directions_agree_with_bruteforce(spark, lefts, rights):
    """Backward/forward as-of equals the brute-force definition on random
    (key, ts) sets (unique (k, ts) pairs on the right avoid tie ambiguity)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(lefts)],
        "k long, lts timestamp, lid long",
    )
    right_rows = {}
    for k, m in rights:
        right_rows[(k, m)] = float(k * 1000 + m)
    right = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), v) for (k, m), v in right_rows.items()],
        "k long, rts timestamp, rv double",
    ) if right_rows else spark.createDataFrame([], "k long, rts timestamp, rv double")

    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rv"]
            for r in asof_join(
                left, right, on="k", left_ts="lts", right_ts="rts",
                direction=direction,
            ).collect()
        }
        want = {}
        for i, (k, m) in enumerate(lefts):
            cands = [
                (rm, v) for (rk, rm), v in right_rows.items()
                if rk == k and (rm <= m if direction == "backward" else rm >= m)
            ]
            if not cands:
                want[i] = None
            elif direction == "backward":
                want[i] = max(cands)[1]
            else:
                want[i] = min(cands)[1]
        assert got == want, f"{direction}: {got} != {want}"
