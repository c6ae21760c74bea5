"""Transcript-payload operators: conversation reassembly and windowing.

The engine's lake tables hold multi-turn conversation transcripts keyed
(conv_id, turn_idx) — the merge path keeps PER-TURN rows (that's what
CDC updates touch). Training and evaluation consume CONVERSATIONS:
the full rendered dialog in stable turn order, or bounded context
windows of it. Both shapes are per-conversation bounded state, so they
aggregate with one map-side-combinable groupBy over conv_id —
``sort_array(collect_list(struct(...)))`` — never a global sort and
never a window function over the skewed conv key. A conversation is
bounded (thousands of turns at most); the ARRAY per group is fine at
100 TB because the heavy dimension is the number of conversations,
which partitions evenly.

Reference context: binlogsub republishes per-row changes to Redis
(/root/reference/business.cc) and leaves assembly to consumers; here
assembly is a first-class relational operator over the ingested table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _turns_agg(df: DataFrame, text_col: str) -> tuple[Column, list[str]]:
    extra = [c for c in ("role",) if c in df.columns]
    fields = [F.col("turn_idx").cast("long").alias("turn_idx")]
    if "role" in df.columns:
        fields.append(F.col("role").alias("role"))
    fields.append(F.col(text_col).alias("text"))
    return F.sort_array(F.collect_list(F.struct(*fields))).alias("turns"), extra


def assemble_transcripts(
    df: DataFrame, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """(conv_id, turn_idx, [role,] text) rows -> one row per conversation
    with the full transcript rendered in stable turn order
    (``role: text`` lines when a role column exists) plus shape stats.

    One aggregation, no window: sort_array over the collected turn
    structs restores ordering inside each bounded group, map-side
    combine keeps hot conversations from concentrating pre-shuffle."""
    turns, extra = _turns_agg(df, text_col)
    agg = df.groupBy("conv_id").agg(turns)
    line = (
        (lambda t: F.concat_ws(": ", t["role"], t["text"]))
        if extra
        else (lambda t: t["text"])
    )
    return agg.select(
        "conv_id",
        F.size("turns").cast("long").alias("n_turns"),
        F.element_at("turns", -1)["turn_idx"].alias("last_turn_idx"),
        F.aggregate(
            "turns",
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t["text"]),
        ).alias("n_chars"),
        F.array_join(F.transform("turns", line), sep).alias("transcript"),
    )


def loss_spans(df: DataFrame, text_col: str = "text", sep: str = "\n") -> DataFrame:
    """Per-turn character spans inside the rendered transcript (the
    exact string :func:`assemble_transcripts` produces), plus the SFT
    loss mask: training computes loss only on assistant turns, so the
    loader needs, for every turn, WHERE its text lives in the packed
    transcript and whether it is masked.

    One window cumulative sum per conversation — bounded partitions (a
    conversation's turns), integer arithmetic end to end, so the spans
    are engine-portable and bit-exact. ``span_start``/``span_end`` cover
    the turn's text (not the ``role: `` prefix); ``masked`` is true for
    non-assistant turns."""
    from pyspark.sql import Window

    role_len = F.length("role") + F.lit(2)  # "role: "
    line_len = role_len + F.length(text_col) + F.lit(len(sep))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = F.sum(line_len).over(w) - line_len  # rendered chars before me
    return df.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "role",
        (prefix + role_len).cast("long").alias("span_start"),
        (prefix + role_len + F.length(text_col)).cast("long").alias("span_end"),
        (F.col("role") != "assistant").alias("masked"),
    )


def conversation_windows(
    df: DataFrame,
    window_turns: int,
    overlap: int = 0,
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Split each conversation into training context windows of at most
    ``window_turns`` turns, consecutive windows sharing ``overlap``
    turns — the transcript analog of overlapping token-chunking.

    Same single-aggregation shape as :func:`assemble_transcripts`: the
    turn array is built once per conversation, then windows are an
    in-row ``sequence`` + ``slice`` explode — no self-join, no second
    shuffle. Window w (0-based) covers positions
    [1 + w*(window_turns-overlap), ...], the last window is short rather
    than duplicated, and a conversation shorter than one window emits
    exactly one window."""
    if not 0 <= overlap < window_turns:
        raise ValueError("need 0 <= overlap < window_turns")
    stride = window_turns - overlap
    turns, extra = _turns_agg(df, text_col)
    agg = df.groupBy("conv_id").agg(turns)
    starts = F.sequence(F.lit(1), F.size("turns"), F.lit(stride))
    exploded = agg.select(
        "conv_id", "turns", F.posexplode(starts).alias("window_idx", "start")
    ).where(
        # a final stride landing past the end would duplicate the tail
        # of the previous window with no new turns — emit it only when
        # it is the conversation's ONLY window
        (F.col("start") + F.lit(overlap) <= F.size("turns"))
        | (F.col("window_idx") == 0)
    )
    win = F.slice("turns", F.col("start"), F.lit(window_turns))
    line = (
        (lambda t: F.concat_ws(": ", t["role"], t["text"]))
        if extra
        else (lambda t: t["text"])
    )
    return exploded.select(
        "conv_id",
        F.col("window_idx").cast("long").alias("window_idx"),
        win[0]["turn_idx"].alias("start_turn_idx"),
        F.element_at(win, -1)["turn_idx"].alias("end_turn_idx"),
        F.size(win).cast("long").alias("n_turns"),
        F.array_join(F.transform(win, line), sep).alias("text"),
    )
