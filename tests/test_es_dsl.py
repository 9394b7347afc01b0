"""ES query-DSL escape hatch: compile_es_dsl vs pandas-computed truth
on real tables (the reference ANDs these dicts into the search body,
eland/query_compiler.py:490-491; leaf shapes from eland/filter.py)."""

import pytest


@pytest.fixture(scope="module")
def cust(spark, sf_dir):
    import eland_spark as es

    return es.read_parquet(spark, f"{sf_dir}/customer.parquet", index_col="c_custkey")


@pytest.fixture(scope="module")
def cust_pd(cust):
    return cust.to_pandas()


def _ids(frame, dsl):
    return sorted(
        r["c_custkey"] for r in frame.es_query(dsl)[["c_custkey"]].to_spark().collect()
    )


def test_term_and_terms(cust, cust_pd):
    got = _ids(cust, {"term": {"c_mktsegment": {"value": "BUILDING"}}})
    exp = sorted(cust_pd[cust_pd.c_mktsegment == "BUILDING"].c_custkey)
    assert got == exp
    got = _ids(cust, {"terms": {"c_mktsegment": ["BUILDING", "MACHINERY"]}})
    exp = sorted(cust_pd[cust_pd.c_mktsegment.isin(["BUILDING", "MACHINERY"])].c_custkey)
    assert got == exp


def test_range_and_exists(cust, cust_pd):
    got = _ids(cust, {"range": {"c_acctbal": {"gte": 0, "lt": 1000}}})
    exp = sorted(cust_pd[(cust_pd.c_acctbal >= 0) & (cust_pd.c_acctbal < 1000)].c_custkey)
    assert got == exp
    assert _ids(cust, {"exists": {"field": "c_name"}}) == sorted(
        cust_pd[cust_pd.c_name.notna()].c_custkey
    )


def test_bool_nesting_and_must_not(cust, cust_pd):
    dsl = {
        "bool": {
            "must": [{"range": {"c_acctbal": {"gt": 5000}}}],
            "must_not": [{"term": {"c_mktsegment": "BUILDING"}}],
            "should": [
                {"term": {"c_mktsegment": "MACHINERY"}},
                {"term": {"c_mktsegment": "AUTOMOBILE"}},
            ],
            "minimum_should_match": 1,
        }
    }
    got = _ids(cust, dsl)
    p = cust_pd
    exp = sorted(
        p[
            (p.c_acctbal > 5000)
            & (p.c_mktsegment != "BUILDING")
            & p.c_mktsegment.isin(["MACHINERY", "AUTOMOBILE"])
        ].c_custkey
    )
    assert got == exp


def test_should_optional_when_must_present(cust, cust_pd):
    # ES: should contributes only scoring when must exists (msm=0)
    dsl = {
        "bool": {
            "must": [{"range": {"c_acctbal": {"gt": 9000}}}],
            "should": [{"term": {"c_mktsegment": "NEVER_MATCHES"}}],
        }
    }
    assert _ids(cust, dsl) == sorted(cust_pd[cust_pd.c_acctbal > 9000].c_custkey)


def test_wildcard_prefix_regexp_anchoring(cust, cust_pd):
    got = _ids(cust, {"wildcard": {"c_name": "Customer#0000001*"}})
    exp = sorted(cust_pd[cust_pd.c_name.str.startswith("Customer#0000001")].c_custkey)
    assert got == exp
    assert _ids(cust, {"prefix": {"c_name": "Customer#000000"}}) == sorted(
        cust_pd[cust_pd.c_name.str.startswith("Customer#000000")].c_custkey
    )
    # regexp is fully anchored (ES semantics): a bare substring matches nothing
    assert _ids(cust, {"regexp": {"c_name": "ustomer"}}) == []
    got = _ids(cust, {"regexp": {"c_name": "Customer#[0-9]+"}})
    assert got == sorted(cust_pd.c_custkey)


def test_ids_query_uses_index(cust):
    assert _ids(cust, {"ids": {"values": [1, 2, 3]}}) == [1, 2, 3]


def test_match_all_and_sql_string_path(cust, cust_pd):
    assert len(_ids(cust, {"match_all": {}})) == len(cust_pd)
    got = sorted(
        r["c_custkey"]
        for r in cust.es_query("c_acctbal > 9000")[["c_custkey"]].to_spark().collect()
    )
    assert got == sorted(cust_pd[cust_pd.c_acctbal > 9000].c_custkey)


def test_match_on_documents(spark, sf_dir):
    import eland_spark as es

    docs = es.read_parquet(spark, f"{sf_dir}/documents.parquet", index_col="doc_id")
    pdf = docs.to_pandas()
    got = docs.es_query({"match": {"text": "spark"}}).shape[0]
    exp = int(pdf.text.str.contains(r"\bspark\b").sum())
    assert got == exp
    fuzzy = docs.es_query({"match": {"text": {"query": "spak", "fuzziness": 1}}}).shape[0]
    assert fuzzy >= got > 0
    phrase = docs.es_query({"match_phrase": {"text": "batch batch"}}).shape[0]
    exp_ph = int(pdf.text.str.contains(r"\bbatch\s+batch\b").sum())
    assert phrase == exp_ph


def test_unsupported_kind_raises(cust):
    with pytest.raises(ValueError, match="unsupported ES query kind"):
        cust.es_query({"span_near": {"clauses": []}})
    # more_like_this is supported but validates its inputs
    with pytest.raises(ValueError, match="like text"):
        cust.es_query({"more_like_this": {"fields": ["c_name"]}})


def test_dsl_filter_pushes_down(cust):
    from eland_spark.plans import pushed_filters

    out = cust.es_query({"range": {"c_acctbal": {"gt": 5000.0}}}).to_spark()
    pf = pushed_filters(out)
    assert any("c_acctbal" in f for f in pf), pf


def test_match_none_and_fuzzy(cust, cust_pd):
    assert _ids(cust, {"match_none": {}}) == []
    # fuzzy is term-level: whole value within edit distance
    status_vals = cust_pd.c_mktsegment.unique()
    target = str(status_vals[0])
    typo = target[:-1] + ("X" if target[-1] != "X" else "Y")
    got = cust.es_query({"fuzzy": {"c_mktsegment": {"value": typo, "fuzziness": 1}}}).shape[0]
    exp = int((cust_pd.c_mktsegment == target).sum())
    assert got == exp


def test_match_bool_prefix_and_multi_match(spark, sf_dir):
    import eland_spark as es

    docs = es.read_parquet(spark, f"{sf_dir}/documents.parquet", index_col="doc_id")
    pdf = docs.to_pandas()
    # last token is a prefix; earlier tokens are OR'd term matches
    got = docs.es_query({"match_bool_prefix": {"text": "distributed spar"}}).shape[0]
    exp = int(
        (
            pdf.text.str.lower().str.contains(r"\bdistributed\b")
            | pdf.text.str.lower().str.contains(r"\bspar[0-9a-z]*")
        ).sum()
    )
    assert got == exp > 0
    # multi_match ORs the match across fields
    m = docs.es_query(
        {"multi_match": {"query": "spark", "fields": ["text", "source"]}}
    ).shape[0]
    only_text = docs.es_query({"match": {"text": "spark"}}).shape[0]
    assert m >= only_text > 0


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import eland_spark as es

    return es.read_parquet(spark, f"{sf_dir}/documents.parquet", index_col="doc_id")


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.to_pandas()


def _doc_ids(docs, dsl):
    return sorted(
        r["doc_id"] for r in docs.es_query(dsl)[["doc_id"]].to_spark().collect()
    )


def test_constant_score_dis_max_boosting(cust, cust_pd):
    base = {"range": {"c_acctbal": {"gte": 9000}}}
    exp = sorted(cust_pd[cust_pd.c_acctbal >= 9000].c_custkey)
    assert _ids(cust, {"constant_score": {"filter": base}}) == exp
    got = _ids(
        cust,
        {"dis_max": {"queries": [base, {"term": {"c_mktsegment": "BUILDING"}}]}},
    )
    exp_dm = sorted(
        cust_pd[(cust_pd.c_acctbal >= 9000) | (cust_pd.c_mktsegment == "BUILDING")].c_custkey
    )
    assert got == exp_dm
    assert (
        _ids(
            cust,
            {"boosting": {"positive": base, "negative": {"term": {"c_mktsegment": "AUTOMOBILE"}}, "negative_boost": 0.2}},
        )
        == exp
    )


def test_match_phrase_prefix(docs, docs_pd):
    got = _doc_ids(docs, {"match_phrase_prefix": {"text": "batch bat"}})
    exp = sorted(
        docs_pd[docs_pd.text.str.lower().str.contains(r"\bbatch\s+bat[0-9a-z]*")].doc_id
    )
    assert got == exp and len(got) > 0


def test_simple_query_string(docs, docs_pd):
    t = docs_pd.text.str.lower()
    # default OR
    got = _doc_ids(docs, {"simple_query_string": {"query": "spark flink", "fields": ["text"]}})
    exp = sorted(docs_pd[t.str.contains(r"\bspark\b") | t.str.contains(r"\bflink\b")].doc_id)
    assert got == exp
    # + = AND, | = OR, -negation, phrase, wildcard, parens
    got = _doc_ids(
        docs,
        {"simple_query_string": {"query": '(spark + batch) | "stream processing"', "fields": ["text"]}},
    )
    exp = sorted(
        docs_pd[
            (t.str.contains(r"\bspark\b") & t.str.contains(r"\bbatch\b"))
            | t.str.contains(r"\bstream\s+processing\b")
        ].doc_id
    )
    assert got == exp
    got = _doc_ids(
        docs,
        {"simple_query_string": {"query": "spark -batch", "fields": ["text"], "default_operator": "and"}},
    )
    exp = sorted(docs_pd[t.str.contains(r"\bspark\b") & ~t.str.contains(r"\bbatch\b")].doc_id)
    assert got == exp
    got = _doc_ids(docs, {"simple_query_string": {"query": "str*", "fields": ["text"]}})
    exp = sorted(docs_pd[t.str.contains(r"\bstr[0-9a-z]*\b")].doc_id)
    assert got == exp


def test_query_string(docs, docs_pd, cust, cust_pd):
    t = docs_pd.text.str.lower()
    got = _doc_ids(docs, {"query_string": {"query": "spark AND NOT batch", "default_field": "text"}})
    exp = sorted(docs_pd[t.str.contains(r"\bspark\b") & ~t.str.contains(r"\bbatch\b")].doc_id)
    assert got == exp
    got = _doc_ids(
        docs,
        {"query_string": {"query": '(spark OR flink) AND "stream processing"', "default_field": "text"}},
    )
    exp = sorted(
        docs_pd[
            (t.str.contains(r"\bspark\b") | t.str.contains(r"\bflink\b"))
            & t.str.contains(r"\bstream\s+processing\b")
        ].doc_id
    )
    assert got == exp
    # field:value syntax overrides default_field; && / || / ! forms
    got = _ids(
        cust,
        {"query_string": {"query": "c_mktsegment:BUILDING || c_mktsegment:MACHINERY", "default_field": "c_name"}},
    )
    exp_c = sorted(
        cust_pd[cust_pd.c_mktsegment.str.lower().isin(["building", "machinery"])].c_custkey
    )
    assert got == exp_c
    with pytest.raises(ValueError, match="unsupported query_string construct"):
        docs.es_query({"query_string": {"query": "spark~2", "default_field": "text"}})


def test_query_string_requires_fields(docs):
    with pytest.raises(ValueError, match="requires fields"):
        docs.es_query({"query_string": {"query": "spark"}})
    with pytest.raises(ValueError, match="requires fields"):
        docs.es_query({"simple_query_string": {"query": "spark"}})


def test_query_string_strict_syntax(docs):
    with pytest.raises(ValueError, match="unexpected token"):
        docs.es_query({"query_string": {"query": "spark ) batch", "default_field": "text"}})
    with pytest.raises(ValueError, match="expected"):
        docs.es_query({"query_string": {"query": "(spark OR batch", "default_field": "text"}})


def test_terms_set(cust, cust_pd, docs, docs_pd):
    got = _ids(
        cust,
        {"terms_set": {"c_mktsegment": {"terms": ["BUILDING", "MACHINERY"], "minimum_should_match": 1}}},
    )
    exp = sorted(cust_pd[cust_pd.c_mktsegment.isin(["BUILDING", "MACHINERY"])].c_custkey)
    assert got == exp
    t = docs_pd.text.str.lower()
    got2 = _doc_ids(
        docs,
        {"terms_set": {"text": {"terms": ["spark", "flink", "batch"], "minimum_should_match": 2}}},
    )
    hits = (
        t.str.contains(r"\bspark\b").astype(int)
        + t.str.contains(r"\bflink\b").astype(int)
        + t.str.contains(r"\bbatch\b").astype(int)
    )
    assert got2 == sorted(docs_pd[hits >= 2].doc_id)
    with pytest.raises(ValueError, match="minimum_should_match"):
        docs.es_query({"terms_set": {"text": {"terms": ["a"]}}})


def test_to_view_sql_bridge(cust, cust_pd):
    import eland_spark as es

    cust.to_view("cust_dsl_v")
    spark = cust.to_spark().sparkSession
    f = es.sql(spark, "SELECT c_mktsegment, count(*) AS n FROM cust_dsl_v GROUP BY 1")
    assert f.to_pandas().n.sum() == len(cust_pd)
    g = es.sql(spark, "SELECT * FROM cust_dsl_v WHERE c_acctbal > 9000", index_col="c_custkey")
    assert g.index_cols == ("c_custkey",)
    assert g.shape[0] == int((cust_pd.c_acctbal > 9000).sum())


def test_geo_distance_and_bbox(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from eland_spark.frame import DataFrame as EDF
    from eland_spark.functions.es_dsl import _parse_distance

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "lat": [0.0, 0.5, 40.0],
            "lon": [0.0, 0.5, 100.0],
        }
    )
    sdf = spark.createDataFrame(pdf).withColumn(
        "point", F.struct(F.col("lat"), F.col("lon"))
    )
    f = EDF(sdf, index_cols=("id",))
    near = f.es_query(
        {"geo_distance": {"distance": "100km", "point": {"lat": 0.0, "lon": 0.0}}}
    )
    assert sorted(r.id for r in near.to_spark().collect()) == [1, 2]
    box = f.es_query(
        {
            "geo_bounding_box": {
                "point": {
                    "top_left": {"lat": 1.0, "lon": -1.0},
                    "bottom_right": {"lat": -1.0, "lon": 1.0},
                }
            }
        }
    )
    assert sorted(r.id for r in box.to_spark().collect()) == [1, 2]
    # distance unit parsing
    assert _parse_distance("1km") == 1000.0
    assert _parse_distance("2.5mi") == 2.5 * 1609.344
    assert _parse_distance(500) == 500.0
    with pytest.raises(ValueError, match="unit"):
        _parse_distance("3parsecs")


def test_more_like_this(spark):
    import pandas as pd

    from eland_spark.frame import DataFrame as EDF

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "text": [
                "spark shuffle join window",
                "spark only here",
                "nothing relevant at all",
            ],
        }
    )
    f = EDF(spark.createDataFrame(pdf), index_cols=("id",))
    # like-text has 4 distinct terms; 50% -> need 2 hits
    got = f.es_query(
        {
            "more_like_this": {
                "fields": ["text"],
                "like": "spark shuffle broadcast aggregate",
                "minimum_should_match": "50%",
            }
        }
    )
    assert sorted(r.id for r in got.to_spark().collect()) == [1]
    # integer msm and max_query_terms cap
    got2 = f.es_query(
        {
            "more_like_this": {
                "fields": ["text"],
                "like": "spark shuffle",
                "minimum_should_match": 1,
            }
        }
    )
    assert sorted(r.id for r in got2.to_spark().collect()) == [1, 2]
    with pytest.raises(ValueError, match="fields"):
        f.es_query({"more_like_this": {"like": "x"}})


def test_es_knn_retrieval(spark):
    """ES 8 knn sections through es_query: exact cosine top-k with the
    DSL filter applied first. Plan pins: TakeOrderedAndProject (no full
    sort/shuffle) and the range filter pushed to the parquet scan."""
    import eland_spark as es
    from pyspark.sql import functions as F

    emb = es.read_parquet(
        spark, "/root/testdata/sf0.001/embeddings.parquet", index_col="vec_id"
    )
    qvec = [
        float(x)
        for x in emb.to_spark().filter(F.col("vec_id") == 0).collect()[0][
            "embedding"
        ]
    ]
    out = emb.es_query(
        {"knn": {"field": "embedding", "query_vector": qvec, "k": 5,
                 "filter": {"range": {"vec_id": {"gte": 1}}}}}
    )
    rows = out.to_pandas()
    assert len(rows) == 5
    assert (rows["vec_id"] >= 1).all()

    # brute-force reference: the same top-5 by cosine
    import numpy as np

    all_rows = emb.to_spark().filter("vec_id >= 1").select("vec_id", "embedding").collect()
    q = np.array(qvec)
    sims = sorted(
        (
            (
                -float(
                    np.dot(r["embedding"], q)
                    / (np.linalg.norm(r["embedding"]) * np.linalg.norm(q))
                ),
                r["vec_id"],
            )
            for r in all_rows
        )
    )[:5]
    assert sorted(rows["vec_id"].tolist()) == sorted(v for _, v in sims)

    plan = out.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    from eland_spark.plans import pushed_filters

    pf = " ".join(pushed_filters(out.to_spark()))
    assert "vec_id" in pf, pf

    # knn without filter; k default
    out2 = emb.es_query({"knn": {"field": "embedding", "query_vector": qvec}})
    assert len(out2.to_pandas()) == 10
