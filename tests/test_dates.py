"""ES named date-format codec: differential tests against pandas, which
is the reference's own parser (`eland/common.py:106-304` parses every
format with pd.to_datetime)."""

import pandas as pd
import pytest

from eland_spark.functions.dates import ES_DATE_FORMATS, es_date_parse

# (es format name, sample string, pandas strptime format of the sample)
CASES = [
    ("basic_date", "20140515", "%Y%m%d"),
    ("basic_date_time", "20140515T120130.456", "%Y%m%dT%H%M%S.%f"),
    ("basic_date_time_no_millis", "20140515T120130+0000", "%Y%m%dT%H%M%S%z"),
    ("basic_ordinal_date", "2014135", "%Y%j"),
    ("basic_time", "120130.456", "%H%M%S.%f"),
    ("basic_time_no_millis", "120130", "%H%M%S"),
    ("basic_t_time", "T120130.456", "T%H%M%S.%f"),
    ("basic_t_time_no_millis", "T120130", "T%H%M%S"),
    ("strict_date", "2014-05-15", "%Y-%m-%d"),
    ("date", "2014-05-15", "%Y-%m-%d"),
    ("strict_date_hour", "2014-05-15T12", "%Y-%m-%dT%H"),
    ("strict_date_hour_minute", "2014-05-15T12:01", "%Y-%m-%dT%H:%M"),
    ("date_hour_minute_second", "2014-05-15T12:01:30", "%Y-%m-%dT%H:%M:%S"),
    (
        "date_hour_minute_second_fraction",
        "2014-05-15T12:01:30.123",
        "%Y-%m-%dT%H:%M:%S.%f",
    ),
    ("strict_date_time", "2014-05-15T12:01:30.123+0000", "%Y-%m-%dT%H:%M:%S.%f%z"),
    ("date_time_no_millis", "2014-05-15T12:01:30+0000", "%Y-%m-%dT%H:%M:%S%z"),
    ("strict_hour", "12", "%H"),
    ("hour_minute", "12:01", "%H:%M"),
    ("hour_minute_second", "12:01:30", "%H:%M:%S"),
    ("hour_minute_second_millis", "12:01:30.123", "%H:%M:%S.%f"),
    ("ordinal_date", "2014-135", "%Y-%j"),
    ("strict_time", "12:01:30.123+0000", "%H:%M:%S.%f%z"),
    ("t_time_no_millis", "T12:01:30+0000", "T%H:%M:%S%z"),
    ("week_date", "2014-W20-4", "%G-W%V-%u"),
    ("strict_week_date", "2009-W01-1", "%G-W%V-%u"),
    ("weekyear_week_day", "2014-W20-4", "%G-W%V-%u"),
    ("basic_week_date", "2014W204", "%GW%V%u"),
    ("strict_year", "2014", "%Y"),
    ("year_month", "2014-05", "%Y-%m"),
    ("year_month_day", "2014-05-15", "%Y-%m-%d"),
]


def _spark_parse(spark, value, fmt):
    df = spark.createDataFrame([(value,)], ["v"])
    return df.select(es_date_parse("v", fmt).alias("t")).collect()[0]["t"]


@pytest.mark.parametrize("fmt,value,pd_fmt", CASES, ids=[c[0] + ":" + c[1] for c in CASES])
def test_pattern_formats_match_pandas(spark, fmt, value, pd_fmt):
    expected = pd.to_datetime(value, format=pd_fmt)
    got = _spark_parse(spark, value, fmt)
    if expected.tzinfo is not None:
        expected = expected.tz_convert("UTC").tz_localize(None)
    assert got == expected.to_pydatetime()


def test_epoch_formats(spark):
    assert _spark_parse(spark, "1400155290123", "epoch_millis") == pd.to_datetime(
        1400155290123, unit="ms"
    )
    assert _spark_parse(spark, "1400155290", "epoch_second") == pd.to_datetime(
        1400155290, unit="s"
    )


def test_default_chain_iso_then_epoch(spark):
    # strict_date_optional_time||epoch_millis, like an unformatted ES date
    assert _spark_parse(spark, "2014-05-15T12:01:30.123", None) == pd.Timestamp(
        "2014-05-15 12:01:30.123"
    )
    assert _spark_parse(spark, "1400155290123", None) == pd.to_datetime(
        1400155290123, unit="ms"
    )
    assert _spark_parse(spark, "2014-05-15", None) == pd.Timestamp("2014-05-15")


def test_explicit_chain_first_match_wins(spark):
    got = _spark_parse(spark, "20140515", "basic_date||epoch_millis")
    assert got == pd.Timestamp("2014-05-15")
    # same value through the chain reversed parses as epoch millis
    got = _spark_parse(spark, "20140515", "epoch_millis||basic_date")
    assert got == pd.to_datetime(20140515, unit="ms")


def test_unparseable_yields_null(spark):
    assert _spark_parse(spark, "not-a-date", "basic_date") is None
    assert _spark_parse(spark, "2014-99-99", "strict_date") is None


def test_week_dates_whole_year_sweep(spark):
    """ISO week arithmetic vs pandas %G-W%V-%u over year boundaries
    (weeks 1, 52, 53 of leap/non-leap ISO years)."""
    samples = []
    for wy in (2004, 2009, 2014, 2015, 2020, 2021):
        for wk in (1, 2, 26, 52):
            for day in (1, 4, 7):
                samples.append(f"{wy}-W{wk:02d}-{day}")
    df = spark.createDataFrame([(s,) for s in samples], ["v"])
    got = [
        r["t"] for r in df.select(es_date_parse("v", "week_date").alias("t")).collect()
    ]
    expected = [pd.to_datetime(s, format="%G-W%V-%u").to_pydatetime() for s in samples]
    assert got == expected


def test_weekyear_variants_beyond_reference(spark):
    # the reference raises NotImplementedError for weekyear/weekyear_week
    # (common.py:269-283); we resolve them to the week's ISO Monday.
    assert _spark_parse(spark, "2014-W20", "weekyear_week") == pd.to_datetime(
        "2014-W20-1", format="%G-W%V-%u"
    )
    assert _spark_parse(spark, "2014", "weekyear") == pd.to_datetime(
        "2014-W01-1", format="%G-W%V-%u"
    )


def test_strict_names_cover_lenient_names(spark):
    assert "strict_date_hour_minute_second" in ES_DATE_FORMATS
    assert "date_hour_minute_second" in ES_DATE_FORMATS
    assert len(ES_DATE_FORMATS) >= 80


def test_week_date_time_carries_time_and_fraction(spark):
    got = _spark_parse(spark, "2014-W20-4T12:01:30.500", "week_date_time")
    assert got == pd.Timestamp("2014-05-15 12:01:30.500")


def test_dt_accessor_batch2_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    import eland_spark as es

    ev = es.read_parquet(
        spark, "/root/testdata/sf0.001/events.parquet", index_col="event_id"
    )
    pev = (
        pd.read_parquet("/root/testdata/sf0.001/events.parquet")
        .set_index("event_id")
        .sort_index()
    )
    s, p = ev["ts"], pev["ts"]

    def col(series):
        return ev.assign(x=series)[["x"]].to_pandas().sort_index()["x"]

    pairs = [
        (col(s.dt.second), p.dt.second),
        (col(s.dt.quarter), p.dt.quarter),
        (col(s.dt.dayofyear), p.dt.dayofyear),
        (col(s.dt.week), p.dt.isocalendar().week),
        (col(s.dt.days_in_month), p.dt.days_in_month),
        (col(s.dt.is_month_start), p.dt.is_month_start),
        (col(s.dt.is_month_end), p.dt.is_month_end),
        (col(s.dt.is_quarter_start), p.dt.is_quarter_start),
        (col(s.dt.is_year_start), p.dt.is_year_start),
        (col(s.dt.strftime("%Y-%m-%d %H:%M")), p.dt.strftime("%Y-%m-%d %H:%M")),
        (col(s.dt.floor("D")), p.dt.floor("D")),
        (col(s.dt.floor("min")), p.dt.floor("min")),
    ]
    for i, (got, want) in enumerate(pairs):
        assert (got.to_numpy() == want.to_numpy()).all(), i
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported strftime"):
        s.dt.strftime("%B")
    with _pt.raises(ValueError, match="unsupported floor"):
        s.dt.floor("W")
