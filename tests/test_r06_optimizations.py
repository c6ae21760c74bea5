"""Round-6 optimization guards: the plan shapes and edge cases the
optimized operators now rely on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable, bucket_expr
from binlogsub_spark.operators.dedup import lww_reduce, partial_lww_reduce
from binlogsub_spark.pipeline import apply_batch, prepare_upserts
from binlogsub_spark.plans.envelope import MERGE_KEY
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_final_reduce_adds_no_exchange(spark):
    """The merge tail must be exactly TWO exchanges: the salted partial
    reduce and the bucket colocation; the final LWW reduce grouped by
    (_bucket, key) must ride the repartition's partitioning (a third
    Exchange here is the round-5 shape regressing)."""
    ev = generate_binlog(spark, GeneratorParams(n_events=5000, dup_tail=100))
    up = partial_lww_reduce(prepare_upserts(ev, EngineConfig()))
    w = up.withColumn("_bucket", bucket_expr(MERGE_KEY[0], 16)).withColumn(
        "_origin", F.lit(-1)
    )
    merged = lww_reduce(
        w.repartition(64, "_bucket"), key=MERGE_KEY + ["_bucket"], salt=1
    )
    plan = _plan(merged)
    assert plan.count("Exchange") == 2, plan
    # the final aggregate sits ABOVE the bucket exchange with no exchange
    # of its own between them
    above_bucket_exchange = plan.split("REPARTITION_BY_NUM")[0]
    assert "partial_max" in above_bucket_exchange


def test_observe_mode_fresh_merge_matches_precomputed(spark, tmp_path):
    """observe_buckets=True (fresh table) must commit the identical state
    and bucket_locations as a merge given the precomputed touched set."""
    ev = generate_binlog(
        spark, GeneratorParams(n_events=4000, n_convs=60, dup_tail=200)
    )
    cfg = EngineConfig()
    up = partial_lww_reduce(prepare_upserts(ev, cfg), salt=cfg.skew_salt)

    t_obs = LakeTable(spark, str(tmp_path / "obs"), buckets=16)
    r_obs = t_obs.merge(up, batch_id=1, pre_reduced=True, observe_buckets=True)

    touched = sorted(
        r["b"]
        for r in up.select(bucket_expr(MERGE_KEY[0], 16).alias("b"))
        .distinct()
        .collect()
    )
    t_pre = LakeTable(spark, str(tmp_path / "pre"), buckets=16)
    r_pre = t_pre.merge(
        up, batch_id=1, pre_reduced=True, touched_buckets=touched
    )

    assert r_obs["applied"] == r_pre["applied"]
    assert (
        t_obs.snapshot()["bucket_locations"] == t_pre.snapshot()["bucket_locations"]
    )
    a = sorted(t_obs.read().collect())
    b = sorted(t_pre.read().collect())
    assert a == b


def test_observe_mode_rejected_on_non_fresh_table(spark, tmp_path):
    ev = generate_binlog(spark, GeneratorParams(n_events=500, dup_tail=0))
    t = LakeTable(spark, str(tmp_path / "t"), buckets=8)
    apply_batch(t, ev, batch_id=1, cfg=EngineConfig(), persist_source=True)
    up = partial_lww_reduce(prepare_upserts(ev, EngineConfig()))
    import pytest

    with pytest.raises(ValueError, match="observe_buckets"):
        t.merge(up, batch_id=2, pre_reduced=True, observe_buckets=True)


def test_gtid_intervals_stitch_across_blocks(spark):
    """Runs crossing the 4096-gno block boundary must merge into one
    interval (the round-6 block aggregation stitches adjacent local runs
    with a per-uuid window)."""
    from binlogsub_spark.operators.gtid import gtid_executed_intervals

    u = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    rows = (
        [(u, g) for g in range(4090, 4110)]        # spans blocks 0 and 1
        + [(u, g) for g in range(8191, 8194)]      # spans blocks 1 and 2
        + [(u, 12288)]                             # exactly on a boundary
        + [(u, 5), (u, 6), (u, 8)]                 # plain gaps
    )
    df = spark.createDataFrame(rows, "server_uuid string, gno long")
    got = sorted(
        (r["ivl_start"], r["ivl_end"])
        for r in gtid_executed_intervals(df).collect()
    )
    assert got == [(5, 6), (8, 8), (4090, 4109), (8191, 8193), (12288, 12288)]


def test_shingles_deduped_within_doc(spark):
    """array_distinct inside the row must match the old global distinct:
    a doc repeating the same n-gram contributes it once."""
    from binlogsub_spark.functions.dedup import shingle_df

    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "x y")], "doc_id long, text string"
    )
    rows = shingle_df(df, n=3).collect()
    got = sorted((r["doc_id"], r["shingle"]) for r in rows)
    # doc 1: 7 positions but only 3 distinct 3-grams; doc 2: too short
    assert got == [(1, "a b c"), (1, "b c a"), (1, "c a b")]


def test_utf8_invalid_mask_bisection():
    """The Arrow UTF-8 validity kernel must flag exactly the invalid rows
    via bisection — including adjacent bad rows, bad rows at both ends,
    and all-valid / all-invalid batches (no per-row loop on clean data)."""
    import numpy as np
    import pyarrow as pa

    from binlogsub_spark.codec import _utf8_invalid_mask

    good = "héllo ✓".encode()
    bad = b"\xbf\x01"  # lone continuation byte
    cases = [
        [good, b"ok", bad, bad, good, bad],
        [bad, good, good],
        [good, good, bad],
        [good] * 5,
        [bad] * 3,
        [],
        [b""],
    ]
    for frames in cases:
        got = _utf8_invalid_mask(pa.array(frames, type=pa.binary()))
        exp = np.array(
            [not _is_utf8(f) for f in frames], dtype=bool
        )
        assert np.array_equal(got, exp), frames


def _is_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def test_headers_from_arrow_matches_numpy_gather():
    """The C++ header-slice gather must produce the byte-identical
    structured header view the numpy fancy gather produced (every field,
    both epoch layouts), and report ragged input as None."""
    import numpy as np
    import pyarrow as pa

    from binlogsub_spark.codec import (
        _HEADER_DTYPES,
        _binary_buffers,
        _gather_headers,
        _headers_from_arrow,
        encode_record,
    )

    for v, dt in _HEADER_DTYPES.items():
        frames = [
            encode_record(
                1, 100 + i, 1_700_000_000_000_000 + i, "IUD"[i % 3], v, 1,
                ["user", "assistant", "tool"][i % 3],
                ("tool_3" if v >= 2 and i % 3 == 2 else None),
                i, f"conv_{i:04d}", f"text payload {i} ü"
            )
            for i in range(257)
        ]
        arr = pa.array(frames, type=pa.binary())
        starts, ends, data = _binary_buffers(arr)
        a = _headers_from_arrow(arr, dt)
        b = _gather_headers(data, starts, dt)
        assert a is not None
        for name in dt.names:
            assert np.array_equal(a[name], b[name]), (v, name)
    # ragged (a frame shorter than the header) -> defensive None
    dt = list(_HEADER_DTYPES.values())[0]
    short = pa.array([frames[0], b"tiny"], type=pa.binary())
    assert _headers_from_arrow(short, dt) is None
