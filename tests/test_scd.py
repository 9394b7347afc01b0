"""SCD type-2 interval history (operators/scd.py) vs a pure-python
run-collapse reference, including null attrs, reverts, multi-attr keys
and timestamp ordering ties."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eland_spark.operators.scd import scd2_history


def _sorted(seq):
    return sorted(seq, key=lambda t: tuple((x is None, str(x)) for x in t))


def _hand_scd2(rows, keyf, attrf, tsf):
    """rows already (key, attrs, ts, tiebreak)-sortable tuples."""
    out = []
    by_key = {}
    for r in sorted(rows, key=lambda r: (keyf(r), tsf(r))):
        by_key.setdefault(keyf(r), []).append(r)
    for k, rs in by_key.items():
        runs = []
        for r in rs:
            if not runs or runs[-1][0] != attrf(r):
                runs.append((attrf(r), tsf(r)))
        for i, (a, frm) in enumerate(runs):
            to = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((k, a, frm, to))
    return out


def test_scd2_basic_runs_reverts_and_nulls(spark):
    ev = pd.DataFrame(
        {
            "uid": [1, 1, 1, 1, 1, 2, 2, 2],
            "ts": [1, 2, 3, 4, 5, 1, 2, 3],
            "eid": [10, 11, 12, 13, 14, 20, 21, 22],
            "state": ["a", "a", "b", "b", "a", None, None, "x"],
        }
    )
    sdf = spark.createDataFrame(ev)
    got = _sorted(
        (r["uid"], r["state"], r["valid_from"], r["valid_to"])
        for r in scd2_history(sdf, "uid", "state", "ts", ["eid"]).collect()
    )
    assert got == _sorted([
        (1, "a", 1, 3), (1, "a", 5, None), (1, "b", 3, 5),
        (2, None, 1, 3), (2, "x", 3, None),
    ])


def test_scd2_multi_attr_and_multi_key(spark):
    ev = pd.DataFrame(
        {
            "k1": ["x", "x", "x", "y"],
            "k2": [1, 1, 1, 1],
            "ts": [1, 2, 3, 1],
            "a": ["p", "p", "q", "p"],
            "b": [10, 11, 11, 10],
        }
    )
    sdf = spark.createDataFrame(ev)
    got = _sorted(
        (r["k1"], r["k2"], r["a"], r["b"], r["valid_from"], r["valid_to"])
        for r in scd2_history(
            sdf, ["k1", "k2"], ["a", "b"], "ts"
        ).collect()
    )
    # b changes 10->11 at ts2 (new interval even though a unchanged)
    assert got == _sorted([
        ("x", 1, "p", 10, 1, 2), ("x", 1, "p", 11, 2, 3),
        ("x", 1, "q", 11, 3, None), ("y", 1, "p", 10, 1, None),
    ])


def test_scd2_validation(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"k": [1], "a": [1], "ts": [1]}))
    with pytest.raises(ValueError, match="non-empty"):
        scd2_history(sdf, [], "a", "ts")
    with pytest.raises(ValueError, match="non-empty"):
        scd2_history(sdf, "k", [], "ts")


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),            # key
            st.integers(0, 20),           # ts
            st.sampled_from(["a", "b", None]),  # attr
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None)
def test_scd2_matches_python_fuzz(spark, rows):
    # unique (key, ts): keep last occurrence per (key, ts) slot to make
    # ordering unambiguous without a tiebreak column
    uniq = {}
    for k, ts, a in rows:
        uniq[(k, ts)] = a
    pdf = pd.DataFrame(
        [(k, ts, a) for (k, ts), a in uniq.items()],
        columns=["k", "ts", "a"],
    )
    sdf = spark.createDataFrame(pdf.astype({"k": "int64", "ts": "int64"}))
    got = [
        (r["k"], r["a"], r["valid_from"], r["valid_to"])
        for r in scd2_history(sdf, "k", "a", "ts").collect()
    ]
    want = _hand_scd2(
        list(pdf.itertuples(index=False)),
        keyf=lambda r: r.k,
        attrf=lambda r: r.a,
        tsf=lambda r: r.ts,
    )
    # python None-vs-nan: normalize attrs
    norm = lambda v: None if pd.isna(v) else v  # noqa: E731
    want = _sorted((k, norm(a), f, t) for k, a, f, t in want)
    got = _sorted((k, norm(a), f, t) for k, a, f, t in got)
    assert got == want
