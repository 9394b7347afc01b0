"""Bucketized range (interval) join.

``point BETWEEN start AND end`` is a theta-join: Spark's planner can
only run it as a BroadcastNestedLoopJoin (small side) or a cartesian
product — both quadratic cliffs at scale. The standard fix is
bucketization: quantize the value axis into fixed-width buckets,
replicate each interval into every bucket it overlaps, and equi-join on
the bucket id with the BETWEEN as a cheap post-filter. The equi-join
hash-shuffles both sides once and AQE handles skewed buckets; the
replication factor is ``span/width + 1`` and defaults to <= 2 by
choosing ``width = max interval span``.

No reference analog (ES has no join at all, SURVEY §2.4); this is the
net-new "range join" member of the custom-operator family alongside
operators/asof.py. Same technique Databricks exposes as the RANGE_JOIN
bin hint.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from ..frame import DataFrame

__all__ = ["range_join", "interval_overlap_join"]


def range_join(
    points: "DataFrame",
    intervals: "DataFrame",
    point_on: str,
    start_on: str,
    end_on: str,
    bucket_width: float | None = None,
    suffixes: tuple[str, str] = ("", "_right"),
) -> "DataFrame":
    """Inner-join each point row to every interval row with
    ``start <= point <= end`` (bounds inclusive), without a
    nested-loop join.

    ``bucket_width`` quantizes the value axis; defaults to the MAX
    interval span (one extra aggregate over the intervals side — cheap,
    intervals are usually the small side), which bounds replication at
    2 buckets per interval. Pass an explicit width when one outlier
    interval would stretch the default (replication is
    ``span/width + 1`` rows per interval; a handful of wide intervals
    with a tighter width is usually the better trade).

    Timestamps work unchanged: bucket arithmetic runs on epoch seconds.
    """
    from ..frame import DataFrame as EDF
    from ..schema import Field, Schema

    pschema, ischema = points._schema, intervals._schema
    p = F.col(pschema.resolve(point_on))
    s, e = F.col(ischema.resolve(start_on)), F.col(ischema.resolve(end_on))

    def _num(c: Column, field) -> Column:
        if field.is_timestamp:
            return F.unix_seconds(c.cast("timestamp")).cast("double")
        return c.cast("double")

    pnum = _num(p, pschema.field(point_on))
    snum = _num(s, ischema.field(start_on))
    enum_ = _num(e, ischema.field(end_on))

    if bucket_width is None:
        row = intervals._sdf.agg(F.max(enum_ - snum).alias("w")).collect()[0]
        bucket_width = float(row["w"] or 0.0)
    if bucket_width <= 0:
        # all intervals degenerate (start == end): any positive width
        bucket_width = 1.0
    w = float(bucket_width)

    # resolve output-name collisions like merge: right side suffixed.
    # physical index columns ride along even when a projection hid them
    # (select is metadata-only) so the result keeps row identity.
    lnames = list(
        dict.fromkeys(list(pschema.index_cols) + pschema.display_names)
    )
    taken = set(lnames)
    rnames = {}
    for c in ischema.display_names:
        rnames[c] = f"{c}{suffixes[1]}" if c in taken else c

    lsel = [
        F.col(pschema.resolve_any(c)).alias(c) for c in lnames
    ] + [F.floor(pnum / w).cast("long").alias("__b__")]
    left = points._sdf.select(*lsel)

    rcols = [F.col(ischema.resolve(c)).alias(rnames[c]) for c in ischema.display_names]
    b0 = F.floor(snum / w).cast("long")
    b1 = F.floor(enum_ / w).cast("long")
    right = intervals._sdf.select(
        *rcols, F.explode(F.sequence(b0, b1)).alias("__b__")
    )

    sj = F.col(rnames[start_on])
    ej = F.col(rnames[end_on])
    out = (
        left.join(right, on="__b__")
        .filter((F.col(point_on) >= sj) & (F.col(point_on) <= ej))
        .drop("__b__")
    )
    lflds = tuple(
        pschema.field(c)
        if c in pschema
        else Field(c, c, points._sdf.schema[c].dataType)
        for c in lnames
    )
    flds = lflds + tuple(
        Field(rnames[f.display_name], rnames[f.display_name], f.spark_type, True)
        for f in ischema.fields
    )
    return EDF(out, Schema(flds, pschema.index_cols))


def interval_overlap_join(
    left: "DataFrame",
    right: "DataFrame",
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float | None = None,
    suffixes: tuple[str, str] = ("", "_right"),
) -> "DataFrame":
    """Inner-join interval rows that OVERLAP: ``l.start <= r.end AND
    r.start <= l.end`` (bounds inclusive) — the interval-interval twin
    of :func:`range_join`, again without a nested-loop join.

    Both sides replicate into the buckets they span; the equi-join on
    the bucket id finds every overlapping pair at least once, and each
    pair is KEPT exactly once via the responsibility rule "the bucket
    that contains ``max(l.start, r.start)`` owns the pair" (for an
    overlapping pair that point lies inside both intervals, so both
    replicas exist in that bucket) — no distinct pass needed.

    ``bucket_width`` defaults to the max span across BOTH sides
    (replication <= 2 buckets per row); tighten it when a few wide
    outlier intervals would stretch the default. Timestamp bounds work
    via epoch seconds like range_join.
    """
    from ..frame import DataFrame as EDF
    from ..schema import Field, Schema

    lschema, rschema = left._schema, right._schema

    def _num(schema, name) -> Column:
        c = F.col(schema.resolve(name))
        if schema.field(name).is_timestamp:
            return F.unix_seconds(c.cast("timestamp")).cast("double")
        return c.cast("double")

    ls, le = _num(lschema, left_start), _num(lschema, left_end)
    rs, re_ = _num(rschema, right_start), _num(rschema, right_end)

    if bucket_width is None:
        wl = left._sdf.agg(F.max(le - ls).alias("w")).collect()[0]["w"]
        wr = right._sdf.agg(F.max(re_ - rs).alias("w")).collect()[0]["w"]
        bucket_width = max(float(wl or 0.0), float(wr or 0.0))
    if bucket_width <= 0:
        bucket_width = 1.0
    w = float(bucket_width)

    lnames = list(
        dict.fromkeys(list(lschema.index_cols) + lschema.display_names)
    )
    taken = set(lnames)
    rnames = {
        c: (f"{c}{suffixes[1]}" if c in taken else c)
        for c in rschema.display_names
    }

    lsel = [F.col(lschema.resolve_any(c)).alias(c) for c in lnames] + [
        F.explode(
            F.sequence(F.floor(ls / w).cast("long"), F.floor(le / w).cast("long"))
        ).alias("__b__"),
        F.floor(ls / w).cast("long").alias("__lsb__"),
    ]
    lrep = left._sdf.select(*lsel)
    rsel = [F.col(rschema.resolve(c)).alias(rnames[c]) for c in rschema.display_names] + [
        F.explode(
            F.sequence(F.floor(rs / w).cast("long"), F.floor(re_ / w).cast("long"))
        ).alias("__b__"),
        F.floor(rs / w).cast("long").alias("__rsb__"),
    ]
    rrep = right._sdf.select(*rsel)

    lsc, lec = F.col(left_start), F.col(left_end)
    rsc, rec = F.col(rnames[right_start]), F.col(rnames[right_end])
    overlap = (lsc <= rec) & (rsc <= lec)
    # responsibility: the pair's owning bucket holds max(l.start, r.start)
    owner = F.greatest(F.col("__lsb__"), F.col("__rsb__")) == F.col("__b__")
    out = (
        lrep.join(rrep, on="__b__")
        .filter(overlap & owner)
        .drop("__b__", "__lsb__", "__rsb__")
    )
    lflds = tuple(
        lschema.field(c)
        if c in lschema
        else Field(c, c, left._sdf.schema[c].dataType)
        for c in lnames
    )
    flds = lflds + tuple(
        Field(rnames[f.display_name], rnames[f.display_name], f.spark_type, True)
        for f in rschema.fields
    )
    return EDF(out, Schema(flds, lschema.index_cols))
