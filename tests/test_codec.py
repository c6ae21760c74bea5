"""Golden decode fixtures + MySQL-format kernel parity (SURVEY.md §2.6).

decode(encode(x)) == x over the full generator output exercises every
branch the reference's ParseColumnValue analog needs here: NULL handling
(tool=0xff -> real null, vs /root/reference/event.cc:386-390 degrading to
""), op codes (/root/reference/row.h:13-18), varlen text, fixed-width
little-endian header fields (/root/reference/myconvert.h:19-117).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from binlogsub_spark.codec import (
    decode_raw_events,
    encode_decoded_events,
    read_lenenc_int,
    uint_korr,
    write_lenenc_int,
)
from binlogsub_spark.config import EngineConfig
from binlogsub_spark.pipeline import scope_filter
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog


def _flat_events(spark, n=3000):
    ev = generate_binlog(spark, GeneratorParams(n_events=n, dup_tail=100))
    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    return ev.select(
        "file_seq",
        "log_pos",
        "server_ts",
        "op",
        "db_name",
        "table_name",
        "schema_version",
        img["conv_id"].alias("conv_id"),
        img["turn_idx"].alias("turn_idx"),
        img["role"].alias("role"),
        img["text"].alias("text"),
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .otherwise(img["tool"])
        .alias("tool"),
        img["ts"].alias("ts"),
    )


def test_roundtrip_golden(spark):
    flat = _flat_events(spark)
    raw = encode_decoded_events(flat)
    back = decode_raw_events(raw)
    # before-image text of deletes is 'prev|...' — encoded faithfully
    assert flat.exceptAll(back).count() == 0
    assert back.exceptAll(flat).count() == 0


def test_decode_preserves_nulls(spark):
    back = decode_raw_events(encode_decoded_events(_flat_events(spark, 2000)))
    v1 = back.where("schema_version = 1")
    assert v1.where(F.col("tool").isNotNull()).count() == 0
    assert back.where("schema_version = 2 and tool is not null").count() > 0


def test_scope_filter_runs_before_decode_plan(spark):
    """The structured path filters before any wide transform; assert the
    scan-adjacent filter exists in the optimized plan (manual pushdown,
    mirroring /root/reference/packet.cc:201-205)."""
    ev = generate_binlog(spark, GeneratorParams(n_events=2000))
    filtered = scope_filter(ev, EngineConfig())
    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    # Catalyst folds the rlike on the generated constant-domain columns and
    # pushes the residual predicate through the Project down to the source —
    # each Union branch ends Filter -> Range, i.e. filtering happens before
    # any downstream work (the reference's manual early-out, automated).
    import re

    assert re.search(r"Filter .*\n\s*\+- Range", plan), plan


def test_lenenc_int_parity():
    values = [0, 1, 0xFA, 0xFB, 0xFF, 300, 65535, 65536, 1 << 23, (1 << 24) - 1, 1 << 24, 1 << 40]
    buf = b"".join(write_lenenc_int(v) for v in values)
    arr = np.frombuffer(buf, dtype=np.uint8)
    pos = np.int64(0)
    positions, got = [], []
    p = np.array([0], dtype=np.int64)
    for _ in values:
        v, p = read_lenenc_int(arr, p)
        got.append(int(v[0]))
    assert got == values


def test_uint_korr_widths():
    raw = bytes(range(1, 17))
    arr = np.frombuffer(raw, dtype=np.uint8)
    pos = np.array([0], dtype=np.int64)
    for w in range(1, 9):
        expect = int.from_bytes(raw[:w], "little")
        assert int(uint_korr(arr, pos, w)[0]) == expect


def test_epoch_versioned_frames(spark):
    """schema_version 1 frames physically lack the tool byte (in-band
    epoch layout change); a mixed-epoch batch decodes correctly."""
    from binlogsub_spark.codec import HEADER_LENS, encode_record

    v1 = encode_record(0, 4, 1_700_000_000_000_000, "I", 1, 0, "user", None, 3, "c1", "hello")
    v2 = encode_record(0, 132, 1_700_000_001_000_000, "I", 2, 0, "tool", "tool_3", 4, "c1", "world")
    assert len(v1) == HEADER_LENS[1] + 5
    assert len(v2) == HEADER_LENS[2] + 5

    import pandas as pd

    from binlogsub_spark.codec import decode_payload_batch, validate_payload_batch

    batch = pd.Series([v1, v2])
    assert validate_payload_batch(batch).all()
    out = decode_payload_batch(batch).sort_values("log_pos").reset_index(drop=True)
    assert out.loc[0, "schema_version"] == 1 and out.loc[0, "tool"] is None
    assert out.loc[0, "text"] == "hello" and out.loc[0, "turn_idx"] == 3
    assert out.loc[1, "schema_version"] == 2 and out.loc[1, "tool"] == "tool_3"
    # a v2-length frame mislabeled v1 fails validation (text_len mismatch)
    bad = v2[:21] + b"\x01" + v2[22:]
    assert not validate_payload_batch(pd.Series([bad])).any()


def test_tool_code_range_rejected():
    """Tool codes collide with the 0xff NULL sentinel at 255 — encode must
    reject them loudly instead of silently decoding tool_255 as NULL."""
    import pytest

    from binlogsub_spark.codec import encode_record

    kw = dict(file_seq=1, log_pos=4, ts_micros=0, op="I", schema_version=2,
              scope=0, role="user", turn_idx=0, conv_id="c", text="t")
    assert encode_record(tool="tool_254", **kw)  # max legal code
    with pytest.raises(ValueError, match="0..254"):
        encode_record(tool="tool_255", **kw)
    with pytest.raises(ValueError, match="0..254"):
        encode_record(tool="tool_300", **kw)


def test_lake_read_without_snapshot_raises_clearly(spark, tmp_path):
    import pytest

    from binlogsub_spark.lake.table import LakeTable

    t = LakeTable(spark, str(tmp_path / "empty_tbl"), buckets=4)
    with pytest.raises(ValueError, match="no committed snapshot"):
        t.read()
    with pytest.raises(ValueError, match="no committed snapshot"):
        t.read_internal()


def test_decode_column_pruning_matches_full_decode(spark):
    """decode_raw_events(columns=...) must return exactly the full decode
    projected to those columns — pruning changes cost, never values."""
    from binlogsub_spark.codec import decode_raw_events
    from binlogsub_spark.codec import encode_decoded_events
    from binlogsub_spark.sources.generator import (
        GeneratorParams,
        flatten_for_wire,
        generate_binlog,
    )

    raw = encode_decoded_events(
        flatten_for_wire(generate_binlog(spark, GeneratorParams(n_events=2000, dup_tail=50)))
    ).localCheckpoint(eager=True)
    full = decode_raw_events(raw)
    cols = ["file_seq", "log_pos", "op", "conv_id", "turn_idx", "text", "ts"]
    pruned = decode_raw_events(raw, columns=cols)
    assert pruned.columns == [c for c in full.columns if c in cols]
    a = full.select(*pruned.columns).orderBy("file_seq", "log_pos", "op").collect()
    b = pruned.orderBy("file_seq", "log_pos", "op").collect()
    assert a == b


def test_in_kernel_scope_filter_matches_rlike(spark):
    """scope_codes= drops out-of-scope frames on the scope byte inside the
    kernel — identical result to decoding everything then rlike-filtering."""
    from pyspark.sql import functions as F

    from binlogsub_spark.codec import (
        decode_raw_events,
        encode_decoded_events,
        scope_codes_for,
    )
    from binlogsub_spark.sources.generator import (
        GeneratorParams,
        flatten_for_wire,
        generate_binlog,
    )

    raw = encode_decoded_events(
        flatten_for_wire(generate_binlog(spark, GeneratorParams(n_events=3000, dup_tail=0)))
    ).localCheckpoint(eager=True)
    codes = scope_codes_for("^test$", "^transcripts$")
    in_kernel = decode_raw_events(raw, scope_codes=codes)
    post_hoc = decode_raw_events(raw).where(
        F.col("db_name").rlike("^test$") & F.col("table_name").rlike("^transcripts$")
    )
    assert in_kernel.count() == post_hoc.count() > 0
    a = in_kernel.orderBy("file_seq", "log_pos", "op").collect()
    b = post_hoc.orderBy("file_seq", "log_pos", "op").collect()
    assert a == b


def test_raw_frame_stats_alignment(spark):
    """raw_frame_stats_df: one row per input frame (valid or not), conv_id
    null exactly for invalid/out-of-scope frames, header columns passed
    through untouched."""
    from pyspark.sql import functions as F

    from binlogsub_spark.codec import (
        encode_decoded_events,
        raw_frame_stats_df,
        scope_codes_for,
    )
    from binlogsub_spark.sources.generator import (
        GeneratorParams,
        flatten_for_wire,
        generate_binlog,
    )

    raw = encode_decoded_events(
        flatten_for_wire(generate_binlog(spark, GeneratorParams(n_events=2000, dup_tail=0)))
    ).localCheckpoint(eager=True)
    # corrupt a deterministic subset
    # log_pos = 4 + k*128, so corrupt on the step index
    bad = (F.col("log_pos") - 4) / 128 % 37 == 5
    corrupted = raw.withColumn(
        "payload",
        F.when(bad, F.expr("substring(payload, 1, 5)"))
        .otherwise(F.col("payload")),
    )
    stats = raw_frame_stats_df(
        corrupted, scope_codes=scope_codes_for("^test$", "^transcripts$")
    )
    assert stats.count() == corrupted.count()  # every frame accounted for
    n_bad = corrupted.where(bad).count()
    n_null = stats.where(F.col("conv_id").isNull()).count()
    assert n_null >= n_bad > 0  # invalid + out-of-scope frames are null
    # header columns intact
    assert (
        stats.select(F.sum("log_pos")).first()[0]
        == corrupted.select(F.sum("log_pos")).first()[0]
    )


def test_fixed_to_string_preserves_embedded_nuls():
    """rstrip parity: only TRAILING NUL padding strips; an embedded NUL is
    part of the key (round-4 review finding — first-NUL truncation would
    collapse distinct merge keys)."""
    import numpy as np
    import pyarrow as pa

    from binlogsub_spark.codec import _fixed_to_string_arrow

    vals = [b"ab\x00cd", b"ab\x00ce", b"plain", b"", b"\x00\x00"]
    fixed = np.array([v.ljust(8, b"\x00") for v in vals], dtype="S8")
    out = _fixed_to_string_arrow(fixed).to_pylist()
    assert out == ["ab\x00cd", "ab\x00ce", "plain", "", ""]
    legacy = [
        s.decode() for s in np.char.rstrip(fixed, b"\x00").tolist()
    ]
    assert out == legacy


def test_crc32_of_fixed_matches_zlib_and_spark(spark):
    """The in-kernel bucket hash must agree BIT-FOR-BIT with zlib.crc32
    and with the JVM expression bucket_expr compiles to — the raw path's
    touched-bucket superset is only sound if every key lands in the same
    bucket on both sides."""
    import zlib

    import numpy as np
    from pyspark.sql import functions as F

    from binlogsub_spark.codec import crc32_of_fixed
    from binlogsub_spark.lake.table import bucket_expr

    keys = [
        "", "a", "conv_00000001", "conv_99999999", "x" * 24,
        "Ünïcode-kéy", "k\t key", "0123456789abcdefghijklmn",
    ] + [f"conv_{i:08d}" for i in range(50)]
    raw = [k.encode("utf-8") for k in keys]
    assert all(len(b) <= 24 for b in raw)
    mat = np.zeros((len(raw), 24), dtype=np.uint8)
    lengths = np.zeros(len(raw), dtype=np.int64)
    for i, b in enumerate(raw):
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lengths[i] = len(b)
    got = crc32_of_fixed(mat, lengths)
    exp = np.array([zlib.crc32(b) & 0xFFFFFFFF for b in raw], dtype=np.uint32)
    np.testing.assert_array_equal(got, exp)

    # and against the Spark-side bucket expression, for several moduli
    df = spark.createDataFrame([(k,) for k in keys], "conv_id string")
    for buckets in (8, 32, 61):
        jvm = {
            r["conv_id"]: r["b"]
            for r in df.select(
                "conv_id", bucket_expr("conv_id", buckets).alias("b")
            ).collect()
        }
        for k, crc in zip(keys, got):
            assert jvm[k] == int(crc % buckets), (k, buckets)


def test_raw_touched_buckets_superset(spark):
    """raw_touched_buckets_df must cover every bucket the decoded frames'
    keys hash to (superset invariant of the one-pass merge)."""
    from pyspark.sql import functions as F

    from binlogsub_spark.codec import (
        decode_raw_events,
        raw_touched_buckets_df,
        scope_codes_for,
    )
    from binlogsub_spark.lake.table import bucket_expr
    from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog
    from tests.test_raw_pipeline import _raw

    ev = generate_binlog(spark, GeneratorParams(n_events=3000, dup_tail=0))
    raw = _raw(spark, ev)
    codes = scope_codes_for("^test$", "^transcripts$")
    touched = {
        r["bucket"]
        for r in raw_touched_buckets_df(raw, 16, scope_codes=codes)
        .distinct()
        .collect()
    }
    needed = {
        r["b"]
        for r in decode_raw_events(raw, columns=["conv_id"], scope_codes=codes)
        .select(bucket_expr("conv_id", 16).alias("b"))
        .distinct()
        .collect()
    }
    assert needed <= touched, (sorted(needed), sorted(touched))
