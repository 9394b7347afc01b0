"""Edge-case tests for corpus-level segment dedup and the Gopher
quality-rules pass — paths the synthetic fixtures can't reach
(null text, all-duplicate docs, bullet/ellipsis lines, '#' symbols).
"""

import pyspark.sql.functions as F

from eland_spark.operators.dedup import segment_dedup
from eland_spark.operators.text import gopher_quality_frame


def _rows(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_segment_dedup_keep_first_and_reassembly(spark):
    sdf = spark.createDataFrame(
        [
            (1, "alpha\n\nbeta\n\ngamma"),
            (2, "beta\n\ndelta"),
            (3, "alpha\n\nbeta"),
        ],
        "id long, text string",
    )
    out = _rows(segment_dedup(sdf, "text", "id"))
    assert out[1] == {
        "id": 1, "dedup_text": "alpha\n\nbeta\n\ngamma",
        "n_segments": 3, "n_kept": 3,
    }
    # doc 2 loses 'beta' (first seen in doc 1), keeps order
    assert out[2]["dedup_text"] == "delta"
    assert (out[2]["n_segments"], out[2]["n_kept"]) == (2, 1)
    # doc 3 loses everything but still appears
    assert out[3] == {"id": 3, "dedup_text": "", "n_segments": 2, "n_kept": 0}


def test_segment_dedup_null_and_empty_text(spark):
    sdf = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "x")], "id long, text string"
    )
    out = _rows(segment_dedup(sdf, "text", "id"))
    assert len(out) == 3
    assert out[1] == {"id": 1, "dedup_text": "", "n_segments": 0, "n_kept": 0}
    assert out[2] == {"id": 2, "dedup_text": "", "n_segments": 0, "n_kept": 0}
    assert out[3]["n_kept"] == 1


def test_segment_dedup_normalization_and_position_tiebreak(spark):
    # same segment differing only by case/trailing space dedups;
    # within one doc the EARLIER position wins
    sdf = spark.createDataFrame(
        [(1, "Foo\n\nfoo \n\nbar"), (0, "zzz\n\nFOO")],
        "id long, text string",
    )
    out = _rows(segment_dedup(sdf, "text", "id"))
    # doc 0 has the lower id -> owns 'foo'
    assert out[0]["dedup_text"] == "zzz\n\nFOO"
    assert out[1]["dedup_text"] == "bar"
    # raw (non-normalized) mode keeps case-distinct segments apart
    raw = _rows(segment_dedup(sdf, "text", "id", normalize=False))
    assert raw[1]["n_kept"] == 3


def test_segment_dedup_deterministic_across_runs(spark):
    sdf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = segment_dedup(sdf, "text", "doc_id", sep=" the ", joiner=" the ")
    b = segment_dedup(sdf.repartition(7), "text", "doc_id", sep=" the ", joiner=" the ")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_gopher_rules_line_signals(spark):
    prose_words = " ".join(["the quick brown fox jumps over lazy dogs"] * 8)
    bullets = "\n".join(["- item one", "- item two", "* item three"])
    ells = "to be continued...\nand more...\nthe end"
    sdf = spark.createDataFrame(
        [
            (1, prose_words),            # passes everything
            (2, bullets),                # 100% bullet lines
            (3, ells),                   # 2/3 ellipsis lines + symbol ratio
            (4, "# " * 60),              # symbol-heavy
            (5, "12 34 " * 40),          # numeric-only words
        ],
        "id long, text string",
    )
    out = _rows(gopher_quality_frame(sdf, "text", "id", min_stopword_hits=1))
    assert out[1]["gopher_pass"] is True
    assert out[2]["bullet_line_frac"] == 1.0 and out[2]["rule_bullet_lines"] is False
    assert abs(out[3]["ellipsis_line_frac"] - 0.666667) < 1e-6
    assert out[3]["rule_ellipsis_lines"] is False
    assert out[4]["symbol_word_ratio"] == 1.0 and out[4]["rule_symbol_ratio"] is False
    assert out[5]["alpha_word_frac"] == 0.0 and out[5]["rule_alpha_words"] is False


def test_gopher_null_and_empty(spark):
    sdf = spark.createDataFrame([(1, None), (2, "")], "id long, text string")
    out = gopher_quality_frame(sdf, "text", "id")
    got = _rows(out.where(F.col("id") == 2))
    assert got[2]["n_words"] == 0 and got[2]["gopher_pass"] is False
    # null text row survives with null signals rather than erroring
    assert out.count() == 2


def test_c4_rules_published_defaults(spark):
    from eland_spark.operators.text import c4_clean_frame

    sdf = spark.createDataFrame(
        [
            # keeps 3 long terminal-punct lines, drops the short and
            # the javascript line -> passes
            (1, "This is a good long sentence here.\nshort one\n"
                "Another fine long sentence with words!\n"
                "And a third good sentence right here.\n"
                "javascript must be enabled to proceed now."),
            # lorem ipsum page -> blocked
            (2, "lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
                "Second proper sentence with many words here.\n"
                "Third proper sentence with many words here.\n"
                "Fourth proper sentence with many words here."),
            # curly brace page -> blocked
            (3, "A first proper sentence with many words {here}.\n"
                "Second proper sentence with many words here.\n"
                "Third proper sentence with many words here."),
            # only 2 surviving lines -> too few
            (4, "One good long sentence right over here.\n"
                "Two good long sentences right over here."),
            (5, None),
        ],
        "id long, text string",
    )
    out = {r["id"]: r.asDict() for r in c4_clean_frame(sdf, "text", "id").collect()}
    assert out[1]["c4_keep"] is True and out[1]["n_kept_lines"] == 3
    assert "javascript" not in out[1]["clean_text"]
    assert "short one" not in out[1]["clean_text"]
    assert out[2]["page_blocked"] is True and out[2]["c4_keep"] is False
    assert out[3]["page_blocked"] is True
    assert out[4]["n_kept_lines"] == 2 and out[4]["c4_keep"] is False
    assert out[5] == {
        "id": 5, "clean_text": "", "n_lines": 0, "n_kept_lines": 0,
        "page_blocked": False, "has_bad_word": False, "c4_keep": False,
    }


def test_c4_bad_words_and_zero_shuffle(spark):
    from eland_spark.operators.text import c4_clean_frame
    from eland_spark.plans import shuffle_count

    sdf = spark.createDataFrame(
        [(1, "A perfectly wholesome long sentence right here.\n"
             "Another wholesome long sentence right there.\n"
             "A third wholesome long sentence appears now."),
         (2, "A perfectly naughty long sentence right here.\n"
             "Another wholesome long sentence right there.\n"
             "A third wholesome long sentence appears now.")],
        "id long, text string",
    )
    out = c4_clean_frame(sdf, "text", "id", bad_words=["naughty"])
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got[1]["c4_keep"] is True and got[2]["has_bad_word"] is True
    assert got[2]["c4_keep"] is False
    assert shuffle_count(out) == 0
