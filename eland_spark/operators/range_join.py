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

__all__ = ["range_join"]


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
