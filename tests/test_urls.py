"""URL canonicalization / domain ops (operators/urls)."""

import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.urls import (
    canonical_url, dedup_by_url, url_domain, url_host, url_path,
    with_url_columns,
)


@pytest.fixture(scope="module")
def url_frame(spark):
    urls = [
        "https://WWW.Example.COM:443/a/b/?utm_source=x&id=3&gclid=zz#frag",
        "http://example.com:80/a",
        "https://news.bbc.co.uk/story/1?ref=tw&b=2&a=1",
        "https://sub.deep.example.co.jp/p/",
        "ftp://Files.Example.net:2121/x/",
        "https://example.com",
        "https://www.example.com/a/b?id=3",  # canonical twin of row 0
    ]
    sdf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    return es.DataFrame(sdf, index_cols=("i",))


def test_url_parts(spark, url_frame):
    rows = (
        url_frame.to_spark()
        .select(
            "i",
            url_host(F.col("url")).alias("h"),
            url_domain(F.col("url")).alias("d"),
            url_path(F.col("url")).alias("p"),
            canonical_url(F.col("url")).alias("c"),
        )
        .orderBy("i")
        .collect()
    )
    assert [r["h"] for r in rows[:5]] == [
        "www.example.com", "example.com", "news.bbc.co.uk",
        "sub.deep.example.co.jp", "files.example.net",
    ]
    assert [r["d"] for r in rows[:5]] == [
        "example.com", "example.com", "bbc.co.uk",
        "example.co.jp", "example.net",
    ]
    # canonicalization: case/port/fragment/tracking/trailing-slash
    assert rows[0]["c"] == "https://www.example.com/a/b?id=3"
    assert rows[1]["c"] == "http://example.com/a"
    # param sort, ref dropped
    assert rows[2]["c"] == "https://news.bbc.co.uk/story/1?a=1&b=2"
    # non-default port survives
    assert rows[4]["c"] == "ftp://files.example.net:2121/x"
    # root path: no trailing slash added
    assert rows[5]["c"] == "https://example.com"


def test_dedup_by_url_keeps_lowest_id(url_frame):
    kept = dedup_by_url(url_frame, "url")
    ids = sorted(r["i"] for r in kept.to_spark().collect())
    # row 6 is the canonical twin of row 0 -> dropped
    assert ids == [0, 1, 2, 3, 4, 5]


def test_with_url_columns_projection_only(url_frame):
    out = with_url_columns(url_frame, "url")
    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert set(out.columns) >= {"url_host", "url_domain", "url_canonical"}
