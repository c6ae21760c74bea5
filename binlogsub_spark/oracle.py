"""Plain-pandas oracle: independently computes the expected final table.

The reference's semantics are "apply every matching change in binlog order;
the keyed store ends up holding the last write per key" (row-at-a-time
dispatch at /root/reference/event.cc:361-364, Redis overwrite = LWW). This
oracle replays the synthetic event log the same way — sequentially, no
Spark — so the distributed pipeline has something independent to match
(SURVEY.md §5 test #2).
"""

from __future__ import annotations

import re

import pandas as pd

from binlogsub_spark.config import SchemaScope


def expected_final_state(
    events: pd.DataFrame, scope: SchemaScope | None = None
) -> pd.DataFrame:
    """events: the generator output collected to pandas (structured variant,
    columns incl. op, db_name, table_name, before/after dicts, file_seq,
    log_pos). Returns the expected transcripts table:
    (conv_id, turn_idx, role, text, tool, ts) sorted by key."""
    scope = scope or SchemaScope()
    db_re, tbl_re = re.compile(scope.db_regex), re.compile(scope.table_regex)

    best: dict[tuple, tuple] = {}  # key -> (version, op, image)
    for r in events.itertuples(index=False):
        if not (db_re.search(str(r.db_name)) and tbl_re.search(str(r.table_name))):
            continue
        image = r.after if r.op != "D" else r.before
        if image is None:
            continue
        image = dict(image if isinstance(image, dict) else image.asDict())
        key = (image["conv_id"], image["turn_idx"])
        ts = pd.Timestamp(image["ts"])
        version = (ts, int(r.file_seq), int(r.log_pos))
        cur = best.get(key)
        if cur is None or version > cur[0]:
            best[key] = (version, r.op, image)

    rows = [
        {
            "conv_id": img["conv_id"],
            "turn_idx": img["turn_idx"],
            "role": img["role"],
            "text": img["text"],
            "tool": img.get("tool"),
            "ts": pd.Timestamp(img["ts"]),
        }
        for (_, op, img) in best.values()
        if op != "D"
    ]
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
