"""Jaro-Winkler record linkage: the python kernel is pinned
bit-compatible with DuckDB's jaro_winkler_similarity (the oracle
function), and the blocked fuzzy join matches a pure-python
block+verify reference."""

import random
import re
from collections import Counter

import duckdb
import pandas as pd
import pytest

from eland_spark.operators.linkage import fuzzy_match_join, jaro_winkler_py


def test_jw_kernel_matches_duckdb_exactly():
    con = duckdb.connect()
    rng = random.Random(123)
    cases = [("", ""), ("a", ""), ("", "a"), ("abc", "abc"),
             ("martha", "marhta"), ("dixon", "dicksonx"),
             ("jellyfish", "smellyfish"), ("ab", "ba")]
    for _ in range(4000):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        cases.append((
            "".join(rng.choice("abcde ") for _ in range(n1)),
            "".join(rng.choice("abcde ") for _ in range(n2)),
        ))
    for s1, s2 in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        got = jaro_winkler_py(s1, s2)
        assert got == pytest.approx(want, abs=1e-12), (s1, s2, got, want)
    con.close()


def _bigrams(s):
    if len(s) >= 2:
        return {s[i:i + 2] for i in range(len(s) - 1)}
    return {s} if s else set()


def _hand_fuzzy(lefts, rights, threshold=0.85, max_df=50):
    df = Counter()
    for _, s in lefts + rights:
        df.update(_bigrams(s))
    rare = {g for g, n in df.items() if 2 <= n <= max_df}
    jaro_min = (threshold - 0.4) / 0.6
    ratio_min = 3.0 * jaro_min - 2.0
    out = {}
    for li, ls in lefts:
        for ri, rs in rights:
            if not ls or not rs:
                continue
            if not (_bigrams(ls) & _bigrams(rs) & rare):
                continue
            if ratio_min > 0.0:
                if min(len(ls), len(rs)) / max(len(ls), len(rs)) < ratio_min:
                    continue
            jw = round(jaro_winkler_py(ls, rs), 6)
            if jw >= threshold:
                out[(li, ri)] = jw
    return out


def test_fuzzy_match_join_hand_case(spark):
    lefts = [(0, "acme corporation"), (2, "globex inc"), (4, "initech")]
    rights = [(1, "acme corpration"),    # typo -> match
              (3, "globex incorporated"),
              (5, "umbrella corp"),
              (7, "acme corporation")]   # exact -> 1.0
    l = spark.createDataFrame(pd.DataFrame(lefts, columns=["id", "name"]))
    r = spark.createDataFrame(pd.DataFrame(rights, columns=["id", "name"]))
    out = fuzzy_match_join(
        l, r, "name", "name", "id", "id", threshold=0.85
    ).toPandas()
    got = {(row["lid"], row["rid"]): row["jw"] for _, row in out.iterrows()}
    assert got == _hand_fuzzy(lefts, rights)
    assert got[(0, 7)] == 1.0
    assert got[(0, 1)] >= 0.9


def test_fuzzy_match_join_differential(spark):
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]

    def name():
        base = " ".join(rng.sample(words, rng.randint(1, 3)))
        if rng.random() < 0.5:   # perturb
            i = rng.randrange(len(base))
            base = base[:i] + rng.choice("abcdefgh") + base[i + 1:]
        return base

    lefts = [(i * 2, name()) for i in range(40)]
    rights = [(i * 2 + 1, name()) for i in range(40)]
    l = spark.createDataFrame(pd.DataFrame(lefts, columns=["id", "name"]))
    r = spark.createDataFrame(pd.DataFrame(rights, columns=["id", "name"]))
    out = fuzzy_match_join(
        l, r, "name", "name", "id", "id", threshold=0.8
    ).toPandas()
    got = {(row["lid"], row["rid"]): row["jw"] for _, row in out.iterrows()}
    want = _hand_fuzzy(lefts, rights, threshold=0.8)
    assert got == want
    assert len(want) > 0  # fixture must exercise matches


def test_fuzzy_match_join_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "name": ["x"]}))
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_match_join(df, df, "name", "name", "id", "id", threshold=0.0)
