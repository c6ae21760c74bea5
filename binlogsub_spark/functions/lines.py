"""Span-level (line / turn / paragraph) deduplication across a corpus.

Whole-document dedup (``functions/dedup.py``) can't touch the dominant
contamination in web/chat corpora: BOILERPLATE — the same navigation line,
cookie banner, or canned support reply embedded inside millions of
otherwise-distinct documents. The standard fix (RefinedWeb/Dolma-style
line dedup, C4's span removal) is implemented here Spark-first:

1. explode each document into positioned spans (``posexplode`` over a
   delimiter split — lines for web text, turns for transcripts);
2. count, per distinct span value, how many distinct documents contain it
   (one hash ``groupBy`` — map-side partial aggregation does the heavy
   lifting; the span value itself is the grouping key so frequency
   counting never shuffles document payloads, only (span-hash, doc) pairs);
3. broadcast-or-shuffle join the (small) boilerplate span set back and
   drop matching spans, then reassemble documents in original span order
   (``array_sort`` over collected (pos, span) structs — per-document,
   bounded by document size, no global sort).

Scale: the only wide operations are the span-frequency ``groupBy`` and the
reassembly ``groupBy(id)``; both partial-aggregate map-side. The
boilerplate set (spans in >= ``min_docs`` docs) is tiny by construction —
AQE broadcasts it. A 100 TB corpus pays two shuffles of (id, pos, hash)-
sized rows, never a cross join.

All JVM built-ins (split/posexplode/xxhash64/concat_ws); exact ANSI twins
live in ``__spark_entry__.oracle_sql`` (DuckDB: unnest +
generate_subscripts + string_agg ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def span_doc_freq(
    df: DataFrame, text_col: str, id_col: str, delimiter: str = "\n"
) -> DataFrame:
    """Distinct-document frequency of every span value: (span, n_docs).
    The profiling half of line dedup — run it alone to pick ``min_docs``.

    ``delimiter`` is a Java regex (Spark ``split`` semantics) — escape
    literal metacharacters.
    """
    spans = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), F.lit(delimiter), -1)).alias("span"),
    )
    return spans.groupBy("span").agg(
        F.countDistinct("_doc").alias("n_docs")
    )


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int,
    delimiter: str = "\n",
) -> DataFrame:
    """Remove every span that occurs in >= ``min_docs`` distinct documents
    and reassemble each document from its surviving spans in original
    order. Adds ``n_spans_removed``; documents reduced to nothing survive
    with an empty ``text_col`` (callers drop them with their own length
    filter — this operator never silently deletes a document id).

    Output columns: ``id_col``, ``text_col`` (rebuilt), ``n_spans_removed``.
    """
    spans = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(delimiter), -1)).alias(
            "pos", "span"
        ),
    )
    boiler = (
        span_doc_freq(df, text_col, id_col, delimiter)
        .where(F.col("n_docs") >= min_docs)
        .select("span")
    )
    flagged = spans.join(
        boiler.withColumn("_boiler", F.lit(True)), "span", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                delimiter,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_boiler").isNull(),
                                F.struct(F.col("pos"), F.col("span")),
                            )
                        )
                    ),
                    lambda x: x["span"],
                ),
            ).alias(text_col),
            F.sum(
                F.when(F.col("_boiler").isNotNull(), 1).otherwise(0)
            ).cast("int").alias("n_spans_removed"),
        )
    )
