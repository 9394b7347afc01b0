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


# ---------------------------------------------------------------------------
# point-in-time join (r7)
# ---------------------------------------------------------------------------

def test_pit_join_state_at_time(spark):
    from eland_spark.operators.scd import pit_join

    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "uid": [1, 1, 2],
                "state": ["a", "b", "x"],
                "valid_from": [1, 5, 3],
                "valid_to": [5, None, None],
            }
        )
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"uid": [1, 1, 1, 1, 2, 2, 3],
             "ts": [0, 1, 4, 7, 2, 9, 5],
             "ev": list("pqrstuv")}
        )
    )
    got = {
        (r["uid"], r["ts"]): r["state"]
        for r in pit_join(pts, iv, "uid", "ts").collect()
    }
    assert got == {
        (1, 0): None,   # before the first interval
        (1, 1): "a",    # exact valid_from match
        (1, 4): "a",
        (1, 7): "b",    # open interval
        (2, 2): None,   # before uid2's first interval
        (2, 9): "x",
        (3, 5): None,   # unknown key keeps left-join semantics
    }
    # row count preserved (left join, never drops points)
    assert pit_join(pts, iv, "uid", "ts").count() == 7


def test_pit_join_expired_interval_nulls_state(spark):
    from eland_spark.operators.scd import pit_join

    # a FILTERED interval table with a gap: matched-but-expired rows
    # must null the state, not keep the stale value or drop the row
    iv = spark.createDataFrame(
        pd.DataFrame(
            {"uid": [1], "state": ["a"], "valid_from": [1],
             "valid_to": [3]}
        )
    )
    pts = spark.createDataFrame(
        pd.DataFrame({"uid": [1, 1], "ts": [2, 10]})
    )
    got = {
        r["ts"]: (r["state"], r["valid_to"])
        for r in pit_join(pts, iv, "uid", "ts").collect()
    }
    assert got[2] == ("a", 3)
    assert got[10] == (None, None)


def test_pit_join_rejects_colliding_point_column(spark):
    from eland_spark.operators.scd import pit_join

    iv = spark.createDataFrame(
        pd.DataFrame({"uid": [1], "ts": [0], "state": ["a"],
                      "valid_from": [1], "valid_to": [3]})
    )
    pts = spark.createDataFrame(pd.DataFrame({"uid": [1], "ts": [2]}))
    with pytest.raises(ValueError, match="rename"):
        pit_join(pts, iv, "uid", "ts")


def test_pit_join_composes_with_scd2(spark):
    from eland_spark.operators.scd import pit_join, scd2_history

    ev = pd.DataFrame(
        {"uid": [1, 1, 1], "ts": [1, 3, 6], "eid": [1, 2, 3],
         "st": ["a", "b", "b"]}
    )
    hist = scd2_history(
        spark.createDataFrame(ev), "uid", "st", "ts", ["eid"]
    )
    pts = spark.createDataFrame(
        pd.DataFrame({"uid": [1, 1, 1], "t": [2, 3, 99]})
    )
    got = {
        r["t"]: r["st"] for r in pit_join(pts, hist, "uid", "t").collect()
    }
    assert got == {2: "a", 3: "b", 99: "b"}


def test_pit_join_duplicate_valid_from_picks_open_interval(spark):
    """Duplicate (key, valid_from) intervals — scd2's equal-ts run
    starts — must resolve deterministically to the LATER run (the open
    / latest-ending interval): a point at the shared timestamp lands
    in the later run's state, never the zero-length [t, t) one, and
    repeated plans agree."""
    from eland_spark.operators.scd import pit_join, scd2_history

    ev = pd.DataFrame(
        {"uid": [1, 1, 1], "ts": [5, 5, 9], "eid": [1, 2, 3],
         "st": ["a", "b", "c"]}
    )
    hist = scd2_history(
        spark.createDataFrame(ev), "uid", "st", "ts", ["eid"]
    )
    # intervals: (a, 5, 5) zero-length, (b, 5, 9), (c, 9, None)
    pts = spark.createDataFrame(
        pd.DataFrame({"uid": [1, 1, 1, 1], "t": [4, 5, 8, 9]})
    )
    for _ in range(3):
        got = {
            r["t"]: r["st"]
            for r in pit_join(pts, hist, "uid", "t").collect()
        }
        assert got == {4: None, 5: "b", 8: "b", 9: "c"}
    # three same-ts runs: both earlier ones are zero-length, the last
    # (by tiebreak order) wins
    ev3 = pd.DataFrame(
        {"uid": [2, 2, 2], "ts": [5, 5, 5], "eid": [1, 2, 3],
         "st": ["a", "b", "c"]}
    )
    hist3 = scd2_history(
        spark.createDataFrame(ev3), "uid", "st", "ts", ["eid"]
    )
    pts3 = spark.createDataFrame(pd.DataFrame({"uid": [2], "t": [7]}))
    got3 = pit_join(pts3, hist3, "uid", "t").collect()[0]["st"]
    assert got3 == "c"


def test_scd2_equal_timestamp_run_starts_deterministic(spark):
    """Two runs of one key starting at the SAME timestamp (equal-ts
    events with different attrs under a tiebreak) must close
    deterministically: the earlier run (by event order) gets
    valid_to = the shared timestamp, the later one stays open."""
    ev = pd.DataFrame(
        {"uid": [1, 1], "ts": [5, 5], "eid": [1, 2],
         "state": ["a", "b"]}
    )
    for _ in range(3):  # stable across repeated plans
        got = _sorted(
            (r["uid"], r["state"], r["valid_from"], r["valid_to"])
            for r in scd2_history(
                spark.createDataFrame(ev), "uid", "state", "ts", ["eid"]
            ).collect()
        )
        assert got == _sorted([(1, "a", 5, 5), (1, "b", 5, None)])
