"""Span-level (line) dedup: boilerplate detection, order-preserving
reassembly, and the never-delete-a-document contract."""

from pyspark.sql import functions as F

from binlogsub_spark.functions.lines import span_doc_freq, strip_duplicated_spans

DOCS = [
    ("d1", "unique alpha\nSUBSCRIBE NOW\nunique beta"),
    ("d2", "SUBSCRIBE NOW\nother text\ncookie notice"),
    ("d3", "cookie notice\nSUBSCRIBE NOW"),
    ("d4", "totally original\nnothing shared"),
    # d5 is nothing BUT boilerplate — must survive with empty text
    ("d5", "SUBSCRIBE NOW"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_span_doc_freq_counts_distinct_docs(spark):
    freq = {
        r["span"]: r["n_docs"]
        for r in span_doc_freq(_df(spark), "text", "doc_id").collect()
    }
    assert freq["SUBSCRIBE NOW"] == 4
    assert freq["cookie notice"] == 2
    assert freq["unique alpha"] == 1


def test_strip_repeated_spans_preserves_order(spark):
    out = {
        r["doc_id"]: (r["text"], r["n_spans_removed"])
        for r in strip_duplicated_spans(
            _df(spark), "text", "doc_id", min_docs=2
        ).collect()
    }
    assert out["d1"] == ("unique alpha\nunique beta", 1)
    assert out["d2"] == ("other text", 2)
    assert out["d3"] == ("", 2)
    assert out["d4"] == ("totally original\nnothing shared", 0)
    # all five document ids survive, even the all-boilerplate one
    assert set(out) == {"d1", "d2", "d3", "d4", "d5"}
    assert out["d5"] == ("", 1)


def test_within_doc_repeats_count_once_for_frequency(spark):
    """A span repeated INSIDE one doc is one doc of evidence (countDistinct),
    but every occurrence is stripped once flagged."""
    df = spark.createDataFrame(
        [("a", "x\nx\nx"), ("b", "x\ny")], "doc_id string, text string"
    )
    freq = {r["span"]: r["n_docs"] for r in span_doc_freq(df, "text", "doc_id").collect()}
    assert freq["x"] == 2
    out = {
        r["doc_id"]: (r["text"], r["n_spans_removed"])
        for r in strip_duplicated_spans(df, "text", "doc_id", min_docs=2).collect()
    }
    assert out["a"] == ("", 3)
    assert out["b"] == ("y", 1)


def test_no_cartesian_join_in_plan(spark):
    plan = strip_duplicated_spans(
        _df(spark), "text", "doc_id", min_docs=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
