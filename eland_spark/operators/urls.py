"""URL canonicalization / domain curation ops.

Standard web-corpus curation primitives (CommonCrawl-style pipelines):
canonicalize URLs so trivially-distinct spellings of the same resource
collapse (tracking params, default ports, trailing slashes, case), and
extract host / registrable-domain keys for per-domain caps and stats
(see operators/sampling.cap_per_key).

Everything is a chain of built-in string expressions — codegen'd,
zero-shuffle, no UDFs — and deliberately regex-based (not
``parse_url``) so the identical transform replays in any SQL engine
(the differential-oracle contract). No reference analog (eland has no
URL surface); net-new curation extension.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from ..frame import DataFrame

__all__ = [
    "url_host",
    "url_domain",
    "url_path",
    "canonical_url",
    "with_url_columns",
    "dedup_by_url",
    "TRACKING_PARAMS",
]

# query parameters that identify a click, not a resource
TRACKING_PARAMS = (
    "utm_[a-z]+", "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref",
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# second-level labels under which the registrable domain takes THREE
# labels (example.co.uk); the common multi-part public suffixes
_SECOND_LEVEL = ("co", "com", "ac", "gov", "net", "org", "edu")


def url_host(url: Column) -> Column:
    """Lowercased hostname (userinfo and port stripped)."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_domain(url: Column) -> Column:
    """Registrable-domain heuristic: the last two host labels, or the
    last three when the second-to-last is a common multi-part public
    suffix (``co.uk``, ``com.au``, ...). A full public-suffix list can
    be broadcast-joined on top for exact semantics; this heuristic is
    the zero-dependency default."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    second = F.element_at(parts, -2)
    tld = F.element_at(parts, -1)
    needs3 = (
        (n >= 3)
        & second.isin(*_SECOND_LEVEL)
        & (F.length(tld) <= 3)
        & (F.length(second) <= 3)
    )
    return F.when(n <= 2, host).when(needs3, last3).otherwise(last2)


def url_path(url: Column) -> Column:
    """Path component with the trailing slash trimmed ('' for the root)."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    return F.regexp_replace(p, r"/$", "")


def canonical_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports (:80/:443)
    stripped, fragment dropped, tracking query params removed, the
    surviving params SORTED (param order never identifies a resource),
    trailing slash trimmed. Same-resource spellings collapse to one
    key for exact URL dedup."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))
    host = url_host(url)
    port = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*?:(\d+)", 1)
    keep_port = (port != "") & (port != "80") & (port != "443")
    path = url_path(url)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    track = "^(" + "|".join(TRACKING_PARAMS) + ")="
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(track),
    )
    clean_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q)).otherwise(F.lit("")),
    )


def with_url_columns(
    df: "DataFrame",
    url_col: str,
    host_col: str = "url_host",
    domain_col: str = "url_domain",
    canon_col: str = "url_canonical",
) -> "DataFrame":
    """Add host / registrable-domain / canonical-URL columns — pure
    projection, zero shuffle; the domain column is the intended
    grouping key for per-domain caps and stats."""
    from ..frame import DataFrame as EDF
    from ..schema import Field
    from pyspark.sql import types as T

    schema = df._schema
    u = F.col(schema.resolve(url_col))
    out = (
        df._sdf.withColumn(host_col, url_host(u))
        .withColumn(domain_col, url_domain(u))
        .withColumn(canon_col, canonical_url(u))
    )
    sch = schema
    for c in (host_col, domain_col, canon_col):
        sch = sch.with_field(Field(c, c, T.StringType(), True))
    return EDF(out, sch)


def dedup_by_url(
    df: "DataFrame", url_col: str, id_col: str | None = None
) -> "DataFrame":
    """Exact dedup on the canonical URL: deterministic keep-first (the
    lowest ``id_col`` — default: the frame's first index column — wins
    within each canonical key). One hash shuffle on the canonical key
    via min_by + semi-join back, the same shape as
    operators/dedup.drop_duplicates."""
    from ..frame import DataFrame as EDF

    schema = df._schema
    idc = id_col or (df.index_cols[0] if df.index_cols else None)
    if idc is None:
        raise ValueError("dedup_by_url needs an id column or an indexed frame")
    u = canonical_url(F.col(schema.resolve(url_col)))
    idx = F.col(schema.resolve_any(idc))
    keep = (
        df._sdf.select(u.alias("__k__"), idx.alias("__i__"))
        .groupBy("__k__")
        .agg(F.min("__i__").alias("__keep__"))
        .select("__keep__")
    )
    out = df._sdf.join(keep, on=idx == F.col("__keep__"), how="left_semi")
    return EDF(out, schema)
