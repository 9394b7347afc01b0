"""Elasticsearch named date-format codec, Spark-native.

The reference parses ~60 built-in ES date formats on read with pandas
(`eland/common.py:106-304`, `elasticsearch_date_to_pandas_date`). This
module computes the same timestamps with JVM-side Column expressions so
parsing stays inside whole-stage codegen — at 100 TB the codec runs on
every row of every date column and must never drop to Python.

Three format families, three strategies:

* pattern formats (``basic_date``, ``strict_date_time``, ...) —
  ``try_to_timestamp`` with a Java DateTimeFormatter pattern
  (fractional seconds as optional ``[.SSS]`` sections, zone offsets as
  ``[XXX]``; ``try_`` because ES format chains fall through on
  mismatch and ANSI-mode ``to_timestamp`` would throw instead).
* epoch formats (``epoch_millis``, ``epoch_second``) —
  ``timestamp_millis`` / ``timestamp_seconds`` on the casted long.
* ISO week dates (``week_date``, ``weekyear_week_day``, ...) — Spark's
  formatter rejects week-based pattern letters (Y/w/u), so the date is
  computed arithmetically: extract (weekyear, week, day) with one
  regexp, then ``first ISO Monday of weekyear + 7*(week-1) + (day-1)``
  where the first ISO Monday is derived from Jan 4 (always in ISO week
  1). This also covers ``weekyear``/``weekyear_week``, which the
  reference leaves NotImplementedError (`common.py:269-283`).

Format chains ``a||b||c`` (ES mapping syntax) coalesce left-to-right,
matching ES's first-format-that-parses rule; the default when no format
is given is ``strict_date_optional_time||epoch_millis``
(`common.py:124-138`).

Time-only formats resolve on 1900-01-01, reproducing the reference's
pandas ``to_datetime(format="%H:%M")`` behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["es_date_parse", "es_date_pattern", "ES_DATE_FORMATS"]

# fractional seconds: ES emits 1-9 digits; a bracketed pattern per width
# makes the whole group optional and width-insensitive.
_FRAC = "[.SSSSSSSSS][.SSSSSS][.SSS][.S]"
_TZ = "[XXX][X]"

# name -> Java DateTimeFormatter pattern. Both the strict_ and lenient
# names share one pattern (Spark patterns are width-tolerant enough for
# the fixtures' purposes; ES "strict_" only pins zero-padding).
_PATTERNS = {
    "basic_date": "yyyyMMdd",
    "basic_date_time": f"yyyyMMdd'T'HHmmss{_FRAC}{_TZ}",
    "basic_date_time_no_millis": f"yyyyMMdd'T'HHmmss{_TZ}",
    "basic_ordinal_date": "yyyyDDD",
    "basic_ordinal_date_time": f"yyyyDDD'T'HHmmss{_FRAC}{_TZ}",
    "basic_ordinal_date_time_no_millis": f"yyyyDDD'T'HHmmss{_TZ}",
    "basic_time": f"HHmmss{_FRAC}{_TZ}",
    "basic_time_no_millis": f"HHmmss{_TZ}",
    "basic_t_time": f"'T'HHmmss{_FRAC}{_TZ}",
    "basic_t_time_no_millis": f"'T'HHmmss{_TZ}",
    "date": "yyyy-MM-dd",
    "date_hour": "yyyy-MM-dd'T'HH",
    "date_hour_minute": "yyyy-MM-dd'T'HH:mm",
    "date_hour_minute_second": "yyyy-MM-dd'T'HH:mm:ss",
    "date_hour_minute_second_fraction": f"yyyy-MM-dd'T'HH:mm:ss{_FRAC}",
    "date_hour_minute_second_millis": f"yyyy-MM-dd'T'HH:mm:ss{_FRAC}",
    "date_time": f"yyyy-MM-dd'T'HH:mm:ss{_FRAC}{_TZ}",
    "date_time_no_millis": f"yyyy-MM-dd'T'HH:mm:ss{_TZ}",
    "hour": "HH",
    "hour_minute": "HH:mm",
    "hour_minute_second": "HH:mm:ss",
    "hour_minute_second_fraction": f"HH:mm:ss{_FRAC}",
    "hour_minute_second_millis": f"HH:mm:ss{_FRAC}",
    "ordinal_date": "yyyy-DDD",
    "ordinal_date_time": f"yyyy-DDD'T'HH:mm:ss{_FRAC}{_TZ}",
    "ordinal_date_time_no_millis": f"yyyy-DDD'T'HH:mm:ss{_TZ}",
    "time": f"HH:mm:ss{_FRAC}{_TZ}",
    "time_no_millis": f"HH:mm:ss{_TZ}",
    "t_time": f"'T'HH:mm:ss{_FRAC}{_TZ}",
    "t_time_no_millis": f"'T'HH:mm:ss{_TZ}",
    "year": "yyyy",
    "year_month": "yyyy-MM",
    "year_month_day": "yyyy-MM-dd",
    # ISO-8601 with every trailing component optional; also the first
    # leg of the ES default format chain.
    "strict_date_optional_time": f"yyyy-MM-dd['T'HH:mm[:ss]{_FRAC}{_TZ}]",
}
# every pattern name also exists with a strict_ prefix
_PATTERNS.update(
    {f"strict_{k}": v for k, v in _PATTERNS.items() if not k.startswith("strict_")}
)

# (separator-regex, has_day) per week-date family; parsed arithmetically.
_WEEK_FORMATS = {
    "basic_week_date": (r"^(\d{4})W(\d{2})(\d)", True),
    "basic_week_date_time": (r"^(\d{4})W(\d{2})(\d)", True),
    "basic_week_date_time_no_millis": (r"^(\d{4})W(\d{2})(\d)", True),
    "week_date": (r"^(\d{4})-W(\d{2})-(\d)", True),
    "week_date_time": (r"^(\d{4})-W(\d{2})-(\d)", True),
    "week_date_time_no_millis": (r"^(\d{4})-W(\d{2})-(\d)", True),
    "weekyear": (r"^(\d{4})", False),
    "weekyear_week": (r"^(\d{4})-W(\d{2})", False),
    "weekyear_week_day": (r"^(\d{4})-W(\d{2})-(\d)", True),
}
_WEEK_FORMATS.update({f"strict_{k}": v for k, v in _WEEK_FORMATS.items()})

# week-date time-of-day suffix patterns (after the date part)
_WEEK_TIME = {
    "basic_week_date_time": f"'T'HHmmss{_FRAC}{_TZ}",
    "basic_week_date_time_no_millis": f"'T'HHmmss{_TZ}",
    "week_date_time": f"'T'HH:mm:ss{_FRAC}{_TZ}",
    "week_date_time_no_millis": f"'T'HH:mm:ss{_TZ}",
}
_WEEK_TIME.update({f"strict_{k}": v for k, v in _WEEK_TIME.items()})

ES_DATE_FORMATS = sorted(
    set(_PATTERNS) | set(_WEEK_FORMATS) | {"epoch_millis", "epoch_second"}
)


def es_date_pattern(name: str) -> str | None:
    """Java DateTimeFormatter pattern for an ES format name, or None for
    the non-pattern families (epoch_*, week dates)."""
    return _PATTERNS.get(name)


def _iso_week_start(weekyear: Column) -> Column:
    """Monday of ISO week 1 of ``weekyear``: Jan 4 is always in week 1;
    back up to its Monday (dayofweek is 1=Sun..7=Sat -> ISO 1=Mon..7=Sun
    via (d+5)%7+1)."""
    jan4 = F.make_date(weekyear, F.lit(1), F.lit(4))
    iso_dow = (F.dayofweek(jan4) + F.lit(5)) % F.lit(7) + F.lit(1)
    return F.date_sub(jan4, iso_dow - F.lit(1))


def _parse_week(col: Column, name: str) -> Column:
    regex, has_day = _WEEK_FORMATS[name]
    s = col.cast("string")
    year = F.try_to_number(F.regexp_extract(s, regex, 1), F.lit("9999")).cast("int")
    ngroups = regex.count("(")
    week = (
        F.try_to_number(F.regexp_extract(s, regex, 2), F.lit("99")).cast("int")
        if ngroups >= 2
        else F.lit(1)
    )
    day = (
        F.try_to_number(F.regexp_extract(s, regex, 3), F.lit("9")).cast("int")
        if has_day
        else F.lit(1)
    )
    date = F.date_add(
        _iso_week_start(year), (week - F.lit(1)) * F.lit(7) + (day - F.lit(1))
    )
    time_pat = _WEEK_TIME.get(name)
    if time_pat is None:
        return F.when(year.isNotNull(), date.cast("timestamp"))
    # re-attach the time-of-day suffix by parsing the remainder string
    rest = F.regexp_replace(s, regex, "")
    t = F.coalesce(
        F.try_to_timestamp(F.concat(F.lit("1900-01-01"), rest),
                           F.lit(f"yyyy-MM-dd{time_pat}")),
        F.lit("1900-01-01").cast("timestamp"),
    )
    return F.when(
        year.isNotNull(),
        F.timestamp_seconds(
            F.unix_timestamp(date.cast("timestamp"))
            + (t.cast("double") - F.lit("1900-01-01").cast("timestamp").cast("double"))
        ),
    )


def _parse_one(col: Column, name: str) -> Column:
    name = name.strip()
    if name == "epoch_millis":
        return F.timestamp_millis(col.cast("long"))
    if name == "epoch_second":
        return F.timestamp_seconds(col.cast("long"))
    if name in _WEEK_FORMATS:
        return _parse_week(col, name)
    pat = _PATTERNS.get(name)
    if pat is None:
        # reference falls back to bare pd.to_datetime with a warning
        # (common.py:295-304); the Spark analog is the default parser.
        return F.try_to_timestamp(col.cast("string"))
    if pat.startswith("'T'"):
        # the value carries its own 'T'; just prepend the anchor date
        return F.try_to_timestamp(
            F.concat(F.lit("1900-01-01"), col.cast("string")),
            F.lit(f"yyyy-MM-dd{pat}"),
        )
    if pat.startswith("HH"):
        # time-only: resolve on 1900-01-01 like pandas strptime defaults
        return F.try_to_timestamp(
            F.concat(F.lit("1900-01-01T"), col.cast("string")),
            F.lit(f"yyyy-MM-dd'T'{pat}"),
        )
    return F.try_to_timestamp(col.cast("string"), F.lit(pat))


def es_date_parse(col: Column | str, date_format: str | None = None) -> Column:
    """Parse an ES-formatted date column to TimestampType.

    ``date_format`` is an ES format name or a ``||``-separated chain
    (first format that parses wins, like ES). None means the ES mapping
    default ``strict_date_optional_time||epoch_millis``. Unparseable
    values yield null (ES would reject the document at index time; a
    null is the relational rendering of that row-level failure).
    """
    c = F.col(col) if isinstance(col, str) else col
    chain = (date_format or "strict_date_optional_time||epoch_millis").split("||")
    parsed = [_parse_one(c, name) for name in chain]
    return parsed[0] if len(parsed) == 1 else F.coalesce(*parsed)
