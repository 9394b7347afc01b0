"""Misra-Gries frequent-items sketch tests: exact regime, heavy-hitter
guarantees in the lossy regime, lossless-when-possible rollups."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import eland_spark as es
from eland_spark.operators.sketches import (
    mg_items,
    mg_rollup,
    mg_sketches,
)

SF = "/root/testdata/sf0.001"


def test_exact_regime_matches_groupby(spark):
    docs = es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()
    toks = docs.select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    sk = mg_sketches(toks, "tok", ["lang"], k=64)
    got = {
        (r.lang, r.item): r.cnt
        for r in mg_items(sk, ["lang"]).collect()
    }
    exp = {
        (r.lang, r.tok): r.cnt
        for r in toks.groupBy("lang", "tok").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exp


def test_lossy_regime_heavy_hitter_guarantee(spark):
    # 1 heavy item (40%), many light items; k=8 counters
    rng = np.random.RandomState(7)
    items = ["heavy"] * 4000 + [f"light{i}" for i in rng.randint(0, 500, 6000)]
    rng.shuffle(items)
    sdf = spark.createDataFrame(pd.DataFrame({"item_v": items, "g": "a"}))
    sk = mg_sketches(sdf, "item_v", ["g"], k=8)
    got = {r.item: r.cnt for r in mg_items(sk, ["g"]).collect()}
    n = len(items)
    # any item with true frequency > n/(k+1) must be present
    assert "heavy" in got
    # stored counts are lower bounds, undercounting by <= n/(k+1) per
    # merge level (partials + merge + compress = 2 levels here)
    assert got["heavy"] <= 4000
    assert 4000 - got["heavy"] <= 2 * n / 9
    assert len(got) <= 8


def test_rollup_exact_when_union_fits(spark):
    docs = es.read_parquet(spark, f"{SF}/documents.parquet").to_spark()
    toks = docs.select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    sk = mg_sketches(toks, "tok", ["lang"], k=64)
    glob = mg_rollup(sk, [], k=64)
    got = {r.item: r.cnt for r in mg_items(glob, []).collect()}
    exp = {
        r.tok: r.cnt
        for r in toks.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exp


def test_sketch_size_bounded(spark):
    rng = np.random.RandomState(1)
    pdf = pd.DataFrame(
        {
            "item_v": [f"i{v}" for v in rng.randint(0, 10000, 20000)],
            "g": rng.choice(["a", "b"], 20000),
        }
    )
    sk = mg_sketches(spark.createDataFrame(pdf), "item_v", ["g"], k=16)
    sizes = [r.n for r in sk.select(F.size("mg").alias("n")).collect()]
    assert all(s <= 16 for s in sizes)
