"""duplicate_span_stats — exact substring-duplication profile
(operators/dedup.py; Lee et al. 2021 semantics)."""

import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from eland_spark.operators.dedup import duplicate_span_stats


def _py_ref(texts: dict, k: int, min_docs: int) -> dict:
    toks = {
        i: [x for x in re.sub(r"[^a-z0-9\s]", " ", (t or "").lower()).split() if x]
        for i, t in texts.items()
    }
    windocs = defaultdict(set)
    for i, tt in toks.items():
        for s in range(len(tt) - k + 1):
            windocs[" ".join(tt[s : s + k])].add(i)
    out = {}
    for i, tt in toks.items():
        dups = [
            s
            for s in range(len(tt) - k + 1)
            if len(windocs[" ".join(tt[s : s + k])]) >= min_docs
        ]
        cov = set()
        for s in dups:
            cov.update(range(s, s + k))
        frac = round(len(cov) / len(tt), 6) if tt else 0.0
        out[i] = (len(tt), len(dups), len(cov), frac)
    return out


FIXTURE = {
    1: "the quick brown fox jumps over the lazy dog again and again",
    2: "the quick brown fox jumps over the lazy dog but differently here",
    3: "completely unrelated text with no overlap at all in this row",
    4: "short doc",  # fewer than k tokens: zero windows
    5: None,  # null text: empty doc
    6: "the quick brown fox jumps over the lazy dog again and again",  # dup of 1
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in FIXTURE.items()], "id long, text string"
    )


def _collect(df):
    return {
        r["id"]: (
            r["n_tokens"],
            r["dup_windows"],
            r["covered_tokens"],
            r["dup_fraction"],
        )
        for r in df.collect()
    }


def test_matches_python_reference(spark, docs):
    got = _collect(
        duplicate_span_stats(docs, F.col("text"), F.col("id"), k=5, min_docs=2)
    )
    exp = _py_ref(FIXTURE, k=5, min_docs=2)
    assert got == exp
    # the two identical docs are fully covered; the unrelated one isn't
    assert got[1][3] == 1.0 and got[6][3] == 1.0
    assert got[3][3] < 1.0
    # short + null docs: zeros, not errors
    assert got[4] == (2, 0, 0, 0.0)
    assert got[5] == (0, 0, 0, 0.0)


def test_portable_mode_matches_hashed(spark, docs):
    fast = _collect(
        duplicate_span_stats(docs, F.col("text"), F.col("id"), k=5, min_docs=2)
    )
    portable = _collect(
        duplicate_span_stats(
            docs, F.col("text"), F.col("id"), k=5, min_docs=2, portable=True
        )
    )
    assert fast == portable


def test_min_docs_threshold(spark, docs):
    # only windows shared by >= 3 docs count; the pairwise overlap of
    # docs 1/2/6 ('the quick brown fox jumps' prefix) appears in 3 docs
    got = _collect(
        duplicate_span_stats(docs, F.col("text"), F.col("id"), k=5, min_docs=3)
    )
    exp = _py_ref(FIXTURE, k=5, min_docs=3)
    assert got == exp
    assert got[2][1] > 0  # shares the 3-doc prefix windows
    assert got[3] == (11, 0, 0, 0.0)


def test_plan_has_single_window_aggregation(spark, docs):
    # scale contract: no crossJoin, no Window; the dup set join is
    # broadcast-eligible (AQE) and coverage is plain hash aggregation
    plan = duplicate_span_stats(
        docs, F.col("text"), F.col("id"), k=5, min_docs=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Window" not in plan


# --- snapshot_diff (same incremental-corpus family) -----------------------


def test_snapshot_diff_statuses(spark):
    from eland_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "now-set"), (5, "new")],
        "id long, text string",
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, "id", compare=["text"]).collect()
    }
    # id 2 unchanged -> excluded by default; null->value counts as change
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}

    full = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            old, new, "id", compare=["text"], include_unchanged=True
        ).collect()
    }
    assert full[2] == "unchanged" and len(full) == 5


def test_snapshot_diff_validate_rejects_duplicate_keys(spark):
    """ADVICE r2: snapshot_diff assumes a unique key per snapshot;
    validate=True must surface a duplicate-key snapshot as ValueError
    instead of silently fanning out conflicting status rows."""
    import pytest as _pytest

    from eland_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "id long, text string"
    )
    new = spark.createDataFrame([(1, "a"), (2, "b")], "id long, text string")
    with _pytest.raises(ValueError, match="not unique in the old"):
        snapshot_diff(old, new, "id", compare=["text"], validate=True)
    with _pytest.raises(ValueError, match="not unique in the new"):
        snapshot_diff(new, old, "id", compare=["text"], validate=True)
    # unique keys: validate passes and the diff is unaffected
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            new, new, "id", compare=["text"], validate=True,
            include_unchanged=True,
        ).collect()
    }
    assert got == {1: "unchanged", 2: "unchanged"}


def test_snapshot_diff_default_compare_and_plan(spark):
    from eland_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame([(1, "a", 10)], "id long, t string, n long")
    new = spark.createDataFrame([(1, "a", 11)], "id long, t string, n long")
    # default compare = all shared non-key columns -> n differs
    assert snapshot_diff(old, new, "id").collect()[0]["status"] == "changed"
    plan = (
        snapshot_diff(old, new, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "Window" not in plan


# --- wordpiece_tokenize (vocab-faithful tokenization) ---------------------


def test_wordpiece_bert_semantics(spark):
    from eland_spark.operators.text import wordpiece_tokenize

    df = spark.createDataFrame(
        [(1, "unaffable things"), (2, "xyzzy"), (3, None), (4, ""), (5, "un")],
        "id long, text string",
    )
    vocab = ["un", "##aff", "##able", "thing", "##s", "[UNK]"]
    got = {
        r["id"]: (list(r["tokens"]), r["n_tokens"])
        for r in wordpiece_tokenize(df, F.col("text"), F.col("id"), vocab).collect()
    }
    # the canonical HF WordpieceTokenizer example
    assert got[1] == (["un", "##aff", "##able", "thing", "##s"], 5)
    assert got[2] == (["[UNK]"], 1)  # whole-word failure
    assert got[3] == ([], 0) and got[4] == ([], 0)
    assert got[5] == (["un"], 1)


def test_wordpiece_longest_match_and_guards(spark):
    from eland_spark.operators.text import wordpiece_tokenize

    df = spark.createDataFrame([(1, "abc " + "a" * 100)], "id long, text string")
    # both 'a' and 'ab' are heads: greedy takes 'ab', then ##c
    vocab = ["a", "ab", "##b", "##c", "[UNK]"]
    got = wordpiece_tokenize(
        df, F.col("text"), F.col("id"), vocab, max_word_chars=50
    ).collect()[0]
    toks = list(got["tokens"])
    assert toks[:2] == ["ab", "##c"]
    assert toks[2] == "[UNK]"  # 100-char word over the guard

    plan = (
        wordpiece_tokenize(df, F.col("text"), F.col("id"), vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure zero-shuffle map
