"""LakeTable — a from-scratch snapshot/manifest table format with MERGE.

No Iceberg/Delta jars ship in this environment, so the engine implements the
required Iceberg-style semantics itself, on plain parquet + JSON manifests:

* **Snapshots**: every commit writes an immutable ``snap-N.json`` manifest
  and atomically swaps a ``CURRENT`` pointer (os.replace). Readers only see
  committed snapshots; a crash mid-write leaves orphan data files that no
  manifest references (same recovery model as Iceberg).
* **Copy-on-write MERGE**: rows are clustered into ``buckets`` hash buckets
  of ``conv_id``. A merge rewrites ONLY the buckets containing changed keys
  — the analog of Iceberg COW touching only affected data files. At 100 TB
  the bucket count is the knob bounding per-commit rewrite volume; bucket
  dirs are Spark partition dirs, so reads get partition pruning for free.
* **Schema-union evolution**: each commit records its schema; the table
  schema is the union. Readers null-backfill old files (Iceberg
  add-column semantics). This is how the in-band ``tool`` column appearing
  mid-stream lands without rewriting history
  (reference epoch flush: /root/reference/packet.cc:141-148).
* **Idempotent commits**: a manifest carries the high-water ``batch_id``;
  replaying an already-committed micro-batch is a no-op. Together with
  LWW dedup this upgrades the reference's at-least-once replay
  (/root/reference/process.cc:163-191) to exactly-once-effective.
* **LWW across batches**: rows persist hidden version columns
  (_op,_ts,_file_seq,_log_pos); tombstones (_op='D') are kept so a
  later-arriving *older* change cannot resurrect a deleted key, and are
  dropped from the read view.

Checkpoint/position state (the reference's Redis hash
/root/reference/business.cc:35-73) becomes the manifest watermark plus an
append-only ``_lineage`` parquet log of per-batch, per-file_seq offsets and
applied/skipped metrics.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.sql import types as T

from binlogsub_spark.operators.dedup import (
    bucket_local_lww,
    lww_reduce,
    partial_lww_reduce,
)
from binlogsub_spark.plans.envelope import MERGE_KEY, VERSION_COLUMNS


def bucket_expr(col, buckets: int):
    """Deterministic key->bucket clustering (CRC32 of the UTF-8 bytes,
    stable across runs). ``col``: column name or Column. This is THE one
    definition of the bucket hash — callers that precompute
    ``touched_buckets`` supersets (apply_batch/apply_raw_batch) MUST use
    it too, or their superset invariant silently breaks and merge strands
    rows in unregistered bucket partitions.

    CRC32 (not xxhash64) because the hash must be computable BOTH as a
    whole-stage-codegen Spark expression AND as a vectorized numpy kernel
    (codec.crc32_of_fixed) — the raw wire path derives the touched-bucket
    set INSIDE its Arrow kernel and ships only distinct bucket ids to the
    JVM, so the two sides must agree bit-for-bit on every key.

    A NULL key hashes like the empty string instead of propagating NULL:
    a NULL _bucket would otherwise write a ``_bucket=None`` partition
    that corrupts the table layout (and a null merge key must stay
    MERGEABLE so a write-audit-publish guard can inspect and reject the
    staged batch, rather than the write crashing half-done). The numpy
    side never sees NULL (wire frames always carry key bytes), so dual
    computability is preserved."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        F.crc32(F.encode(F.coalesce(c, F.lit("")), "UTF-8")), F.lit(buckets)
    ).cast("int")


class LakeTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        buckets: int = 32,
        merge_strategy: str = "jvm",
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.buckets = buckets
        self.merge_strategy = merge_strategy
        self.manifest_dir = os.path.join(self.path, "_manifests")
        self.data_dir = os.path.join(self.path, "data")
        self.lineage_dir = os.path.join(self.path, "_lineage")
        # The committed manifest is authoritative for the bucket count: a
        # handle opened with a stale ctor arg (e.g. after rebucket()) would
        # otherwise compute _bucket with the wrong modulus and strand rows
        # in unregistered partitions.
        snap = self.snapshot()
        if snap is not None and snap.get("buckets"):
            self.buckets = int(snap["buckets"])

    # ----------------------------------------------------------- snapshots
    def _current_pointer(self) -> str:
        return os.path.join(self.manifest_dir, "CURRENT")

    def snapshot(self, snapshot_id: int | None = None) -> dict | None:
        """Current snapshot, or a historical one by id (time travel — every
        manifest is immutable, so any committed state stays readable)."""
        if snapshot_id is not None:
            p = os.path.join(self.manifest_dir, f"snap-{snapshot_id:08d}.json")
            if not os.path.exists(p):
                return None
            with open(p) as f:
                return json.load(f)
        ptr = self._current_pointer()
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        if not os.path.isdir(self.manifest_dir):
            return []
        snaps = sorted(
            n for n in os.listdir(self.manifest_dir) if n.startswith("snap-")
        )
        out = []
        for n in snaps:
            with open(os.path.join(self.manifest_dir, n)) as f:
                out.append(json.load(f))
        return out

    def _commit(self, manifest: dict, publish: bool = True) -> None:
        """Atomic snapshot publish with optimistic concurrency: the manifest
        file create is exclusive ('x' mode), so two writers racing to
        publish the same snapshot_id fail loudly instead of silently
        clobbering each other (single-writer-per-table is the deployment
        contract, as with Iceberg's metastore swap; this guard turns a
        violated contract into an error, not corruption).

        ``publish=False`` stages the snapshot (write-audit-publish): the
        manifest lands on disk marked ``staged`` but CURRENT does not
        move — readers keep seeing the prior state until
        :meth:`publish_staged` swaps the pointer (or
        :meth:`abort_staged` discards the data)."""
        import time

        os.makedirs(self.manifest_dir, exist_ok=True)
        name = f"snap-{manifest['snapshot_id']:08d}.json"
        cur = self.snapshot()
        if cur is not None and cur["snapshot_id"] >= manifest["snapshot_id"]:
            raise RuntimeError(
                f"concurrent commit detected: snapshot {manifest['snapshot_id']}"
                f" already superseded by {cur['snapshot_id']}"
            )
        manifest["committed_at"] = time.time()  # wall clock of the publish
        if not publish:
            manifest["staged"] = True
        with open(os.path.join(self.manifest_dir, name), "x") as f:
            json.dump(manifest, f, indent=1, default=str)
        if publish:
            self._swap_current(name)

    def _swap_current(self, name: str) -> None:
        tmp = self._current_pointer() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, self._current_pointer())  # atomic swap

    # ------------------------------------------------ write-audit-publish
    def publish_staged(self, snapshot_id: int) -> dict:
        """Make a staged snapshot CURRENT (the audit passed). Validates the
        staged snapshot still extends the current state — if another
        writer published in between, this raises instead of silently
        dropping their commit. The manifest is rewritten without the
        ``staged`` marker, then the pointer swaps atomically."""
        m = self.snapshot(snapshot_id)
        if m is None or not m.get("staged"):
            raise ValueError(f"snapshot {snapshot_id} is not a staged snapshot")
        cur = self.snapshot()
        cur_id = cur["snapshot_id"] if cur else None
        if m.get("parent") != cur_id:
            raise RuntimeError(
                f"staged snapshot {snapshot_id} has parent {m.get('parent')} "
                f"but CURRENT is {cur_id}: another commit landed during audit"
            )
        m.pop("staged")
        name = f"snap-{snapshot_id:08d}.json"
        tmp = os.path.join(self.manifest_dir, f".{name}.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, default=str)
        os.replace(tmp, os.path.join(self.manifest_dir, name))
        self._swap_current(name)
        return m

    def abort_staged(self, snapshot_id: int) -> None:
        """Discard a staged snapshot (the audit failed): delete its
        manifest and its commit directory. CURRENT never pointed at it,
        so readers are untouched."""
        import shutil

        m = self.snapshot(snapshot_id)
        if m is None or not m.get("staged"):
            raise ValueError(f"snapshot {snapshot_id} is not a staged snapshot")
        commit_rel = f"commit-{snapshot_id:08d}"
        shutil.rmtree(os.path.join(self.data_dir, commit_rel), ignore_errors=True)
        os.remove(os.path.join(self.manifest_dir, f"snap-{snapshot_id:08d}.json"))

    # -------------------------------------------------------------- schema
    def _schema(self, snap: dict) -> T.StructType:
        return T.StructType.fromJson(json.loads(snap["schema_json"]))

    # Lossless widening chains: a batch delivering the NARROW side of one of
    # these into a table column typed on the WIDE side is safe to cast; the
    # reverse direction widens the TABLE column (normal schema evolution).
    # Anything off-chain (int data for a string column, string for a date, …)
    # is a genuine type conflict and must fail loudly — a silent cast would
    # commit NULLs/garbage and flip the manifest type underneath readers.
    _WIDEN_RANK = {
        T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3,
        T.FloatType(): 10, T.DoubleType(): 11,
    }

    @classmethod
    def _widens_to(cls, narrow: T.DataType, wide: T.DataType) -> bool:
        """True if ``narrow`` data can be cast to ``wide`` without loss."""
        if narrow == wide:
            return True
        if isinstance(narrow, T.NullType):
            return True
        a, b = cls._WIDEN_RANK.get(narrow), cls._WIDEN_RANK.get(wide)
        if a is not None and b is not None:
            return a < b and (a >= 10) == (b >= 10)  # within one chain only
        if isinstance(narrow, T.DecimalType) and isinstance(wide, T.DecimalType):
            return (
                wide.scale >= narrow.scale
                and wide.precision - wide.scale >= narrow.precision - narrow.scale
            )
        return False

    @classmethod
    def _union_schema(cls, old: T.StructType, new: T.StructType) -> T.StructType:
        fields = list(old.fields)
        names = {f.name: i for i, f in enumerate(fields)}
        # New columns append before the hidden version columns.
        version_at = next(
            (i for i, f in enumerate(fields) if f.name in VERSION_COLUMNS),
            len(fields),
        )
        for f in new.fields:
            if f.name not in names:
                fields.insert(version_at, f)
                names = {g.name: i for i, g in enumerate(fields)}
                version_at += 1
                continue
            cur = fields[names[f.name]]
            if cur.dataType == f.dataType:
                continue
            if f.metadata.get("null_backfill"):
                # an all-NULL epoch backfill (pipeline marks it): its type
                # is a placeholder, not a claim — keep the table's type,
                # _align casts the NULLs up
                continue
            if cls._widens_to(f.dataType, cur.dataType):
                continue  # batch narrower than table: _align casts up, lossless
            if cls._widens_to(cur.dataType, f.dataType):
                # batch wider than table: widen the TABLE column (evolution)
                fields[names[f.name]] = T.StructField(
                    f.name, f.dataType, nullable=True
                )
                continue
            raise TypeError(
                f"schema conflict on column {f.name!r}: table has "
                f"{cur.dataType.simpleString()}, batch delivers "
                f"{f.dataType.simpleString()} — not a lossless widening; "
                "rename the batch column or migrate the table explicitly"
            )
        return T.StructType(fields)

    # --------------------------------------------------------------- reads
    def _read_commit(
        self, commit_rel: str, buckets: list[int], target: T.StructType
    ) -> DataFrame:
        commit_dir = os.path.join(self.data_dir, commit_rel)
        df = (
            self.spark.read.option("basePath", commit_dir)
            .parquet(commit_dir)
            .where(F.col("_bucket").isin(buckets))  # partition-pruned scan
        )
        cols = []
        have = set(df.columns)
        for f in target.fields:
            cols.append(
                F.col(f.name) if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)  # null-backfill
            )
        return df.select(*cols, F.col("_bucket"))

    def read_internal(
        self, buckets: list[int] | None = None, snapshot_id: int | None = None
    ) -> DataFrame:
        """All rows incl. tombstones + version cols + _bucket, optionally
        restricted to a bucket subset (merge-time pruning) and/or pinned to
        a historical snapshot (time travel)."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            if snapshot_id is not None:
                raise ValueError(
                    f"snapshot {snapshot_id} does not exist (never committed, "
                    f"or expired by vacuum()) for table {self.path}"
                )
            raise ValueError(f"table {self.path} has no committed snapshot")
        schema = self._schema(snap)
        locs: dict[str, str | None] = snap["bucket_locations"]
        # "all buckets" means the SNAPSHOT's bucket space, not the current
        # handle's — time travel across a rebucket() reads the old layout.
        want = set(int(b) for b in locs) if buckets is None else set(buckets)
        by_commit: dict[str, list[int]] = {}
        for b_str, commit in locs.items():
            b = int(b_str)
            if commit is not None and b in want:
                by_commit.setdefault(commit, []).append(b)
        if not by_commit:
            return self.spark.createDataFrame(
                [], T.StructType(list(schema.fields) + [T.StructField("_bucket", T.IntegerType())])
            )
        parts = [
            self._read_commit(commit, bs, schema) for commit, bs in by_commit.items()
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """User-facing view: live rows only, no internal columns.
        ``snapshot_id`` pins a historical state (time travel)."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            if snapshot_id is not None:
                raise ValueError(
                    f"snapshot {snapshot_id} does not exist (never committed, "
                    f"or expired by vacuum()) for table {self.path}"
                )
            raise ValueError(f"table {self.path} has no committed snapshot")
        schema = self._schema(snap)
        user_cols = [f.name for f in schema.fields if f.name not in VERSION_COLUMNS]
        return (
            self.read_internal(snapshot_id=snapshot_id)
            .where(F.col("_op") != "D")
            .select(*user_cols)
        )

    def changes(
        self,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
        include_before: bool = False,
    ) -> DataFrame:
        """Net change feed between two committed snapshots — the
        CONSUMPTION side of CDC (Iceberg's changelog scan re-realized over
        the COW format): one row per merge key whose live state differs,
        with ``change_op`` I (appeared), U (version advanced), D
        (disappeared/tombstoned); I/U carry the to-state's columns, D the
        from-state's.

        ``include_before=True`` appends ``_before_<payload>`` columns with
        the FROM-state image (NULL for I rows; for D rows they repeat the
        emitted payload, which already IS the before image) — what an
        outbound Debezium/audit consumer needs to reconstruct full
        before/after envelopes (:func:`...sources.debezium.changes_to_debezium`).
        The old side is already in the diff's full-outer join, so the
        option costs no extra scan or shuffle.

        Scale: copy-on-write relocates ONLY touched buckets, so the
        bucket-location diff between the two manifests prunes the scan to
        changed buckets before reading a byte — a 1-conversation commit on
        a 100 TB table diffs 1/buckets of it. ``from_snapshot_id=None``
        means "from the empty table" (everything live is an I)."""
        to_snap = self.snapshot(to_snapshot_id)
        if to_snap is None:
            if to_snapshot_id is not None:
                raise ValueError(
                    f"snapshot {to_snapshot_id} does not exist (never "
                    f"committed, or expired by vacuum()) for table {self.path}"
                )
            raise ValueError(f"table {self.path} has no committed snapshot")
        to_id = to_snap["snapshot_id"]
        from_snap = (
            self.snapshot(from_snapshot_id) if from_snapshot_id is not None else None
        )
        if from_snapshot_id is not None and from_snap is None:
            raise ValueError(
                f"snapshot {from_snapshot_id} does not exist (never committed, "
                f"or expired by vacuum()) for table {self.path}"
            )
        locs_to: dict = to_snap["bucket_locations"]
        locs_from: dict = from_snap["bucket_locations"] if from_snap else {}
        same_space = from_snap is None or from_snap.get("buckets") == to_snap.get(
            "buckets"
        )
        if same_space:
            changed = sorted(
                int(b)
                for b in set(locs_to) | set(locs_from)
                if locs_to.get(b) != locs_from.get(b)
            )
            from_changed = to_changed = changed
        else:
            # a rebucket() sits between the snapshots: bucket ids are not
            # comparable across the two layouts, so location-diff pruning is
            # impossible — diff the full live state of each side (correct,
            # just unpruned; rebucket rewrote everything anyway)
            from_changed = sorted(
                int(b) for b, l in locs_from.items() if l is not None
            )
            to_changed = sorted(int(b) for b, l in locs_to.items() if l is not None)
            changed = sorted(set(from_changed) | set(to_changed))
        # a manifest can outlive its data files (vacuum keeps the last N
        # manifests but prunes commit dirs unreachable from them) — fail
        # with a clear driver-side error instead of a mid-job read failure
        from_set, to_set = set(from_changed), set(to_changed)
        need_commits = {
            loc
            for locs, want in ((locs_to, to_set), (locs_from, from_set))
            for b, loc in locs.items()
            if loc is not None and int(b) in want
        }
        missing = sorted(
            c for c in need_commits
            if not os.path.isdir(os.path.join(self.data_dir, c))
        )
        if missing:
            raise ValueError(
                f"changes({from_snapshot_id}, {to_snapshot_id}) needs commit "
                f"dirs expired by vacuum(): {missing}; re-run with a newer "
                "from_snapshot or raise vacuum's keep_snapshots"
            )
        schema = self._schema(to_snap)
        user_cols = [f.name for f in schema.fields if f.name not in VERSION_COLUMNS]
        payload = [c for c in user_cols if c not in MERGE_KEY]
        out_fields = (
            [T.StructField("change_op", T.StringType())]
            + [schema[c] for c in user_cols]
            + [schema[c] for c in VERSION_COLUMNS if c != "_op"]
            + (
                [
                    T.StructField(f"_before_{c}", schema[c].dataType)
                    for c in payload
                ]
                if include_before
                else []
            )
        )
        if not changed:
            return self.spark.createDataFrame([], T.StructType(out_fields))

        def _side(df: DataFrame, tag: str, live_only: bool) -> DataFrame:
            keep = (
                MERGE_KEY
                + payload
                + [c for c in VERSION_COLUMNS if c != "_op"]
                + ["_op"]
            )
            renamed = df.select(
                *MERGE_KEY,
                *[F.col(c).alias(f"{tag}_{c}") for c in keep if c not in MERGE_KEY],
                F.lit(True).alias(f"{tag}_present"),
            )
            if live_only:
                return renamed.where(F.col(f"{tag}__op") != "D").drop(f"{tag}__op")
            return renamed

        # keep the to-side TOMBSTONES: a D row's version stamp must be the
        # DELETING event's (carried by the tombstone), not the old row's —
        # an outbound subscriber replaying the feed with LWW needs the
        # delete to strictly beat the row it removes.
        new = _side(
            self.read_internal(buckets=to_changed, snapshot_id=to_id),
            "n",
            live_only=False,
        )
        if from_snap is None:
            return new.where(F.col("n__op") != "D").select(
                F.lit("I").alias("change_op"),
                *MERGE_KEY,
                *[F.col(f"n_{c}").alias(c) for c in payload],
                *[
                    F.col(f"n_{c}").alias(c)
                    for c in ("_ts", "_file_seq", "_log_pos")
                ],
                *(
                    [
                        F.lit(None)
                        .cast(schema[c].dataType)
                        .alias(f"_before_{c}")
                        for c in payload
                    ]
                    if include_before
                    else []
                ),
            )
        old = _side(
            self.read_internal(
                buckets=from_changed, snapshot_id=from_snap["snapshot_id"]
            ),
            "o",
            live_only=True,
        )
        j = old.join(new, MERGE_KEY, "full_outer")
        has_new_row = F.col("n_present").isNotNull()
        has_new = has_new_row & (F.col("n__op") != "D")  # live on the to side
        has_old = F.col("o_present").isNotNull()
        same_version = (
            (F.col("o__ts") == F.col("n__ts"))
            & (F.col("o__file_seq") == F.col("n__file_seq"))
            & (F.col("o__log_pos") == F.col("n__log_pos"))
        )
        # keys with a to-side tombstone and no from-side live row (created
        # AND deleted inside the window) net to nothing -> no branch -> NULL
        op = (
            F.when(has_new & ~has_old, "I")
            .when(~has_new & has_old, "D")
            .when(
                has_new & has_old,
                F.when(same_version, F.lit(None)).otherwise(F.lit("U")),
            )
        )
        side = lambda c: F.when(F.col("change_op") == "D", F.col(f"o_{c}")).otherwise(
            F.col(f"n_{c}")
        )
        # version stamp: D rows report the DELETING event's position (the
        # to-side tombstone); only when the tombstone was expired by
        # vacuum/compaction do they fall back to the removed row's stamp
        ver = lambda c: F.when(
            (F.col("change_op") == "D") & ~has_new_row, F.col(f"o_{c}")
        ).otherwise(F.col(f"n_{c}"))
        return (
            j.withColumn("change_op", op)
            .where(F.col("change_op").isNotNull())
            .select(
                "change_op",
                *MERGE_KEY,
                *[side(c).alias(c) for c in payload],
                *[ver(c).alias(c) for c in ("_ts", "_file_seq", "_log_pos")],
                *(
                    [
                        F.col(f"o_{c}").alias(f"_before_{c}")
                        for c in payload
                    ]
                    if include_before
                    else []
                ),
            )
        )

    def read_for_keys(
        self, keys: list[str], snapshot_id: int | None = None
    ) -> DataFrame:
        """Point-lookup read: prune the scan to ONLY the hash buckets the
        given merge keys live in (the read-side payoff of bucket
        clustering — at 100 TB a conversation lookup touches 1/buckets of
        the table, visible as PartitionFilters in the plan)."""
        key_col = MERGE_KEY[0]
        kdf = self.spark.createDataFrame([(k,) for k in keys], [key_col])
        buckets = sorted(
            r["_b"]
            for r in kdf.select(
                bucket_expr(key_col, self.buckets).alias("_b")
            ).distinct().collect()
        )
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise ValueError(f"table {self.path} has no committed snapshot")
        schema = self._schema(snap)
        user_cols = [f.name for f in schema.fields if f.name not in VERSION_COLUMNS]
        return (
            self.read_internal(buckets=buckets, snapshot_id=snapshot_id)
            .where((F.col("_op") != "D") & F.col(key_col).isin(keys))
            .select(*user_cols)
        )

    # --------------------------------------------------------------- merge
    def merge(
        self,
        upserts: DataFrame,
        batch_id: int,
        watermark: dict | None = None,
        pre_reduced: bool = False,
        touched_buckets: list[int] | None = None,
        publish: bool = True,
        observe_buckets: bool = False,
    ) -> dict:
        """MERGE INTO … USING upserts ON (conv_id, turn_idx) with LWW.

        ``upserts``: user columns + VERSION_COLUMNS (tombstones as _op='D').
        Returns {applied, superseded, replayed, snapshot_id}. Replaying an
        already-committed batch_id is a committed no-op.

        Two merge strategies (EngineConfig.merge_strategy / ctor arg):

        * ``jvm`` (default): salted partial reduce -> final hash-agg reduce
          -> bucket repartition -> write. Three exchanges, all whole-stage
          codegen; measured fastest in local mode, where exchange = memcpy.
        * ``arrow_local``: salted partial reduce -> ONE bucket-colocation
          exchange of (partials ∪ touched current rows) -> partition-local
          Arrow finalize -> shuffle-free write. One fewer full exchange —
          the right trade on a real cluster where exchanges cross the
          network, at the cost of an Arrow/Python boundary pass.

        ``touched_buckets``: a pre-computed SUPERSET of the hash buckets the
        batch touches (``bucket_expr`` over the batch's merge keys). With it
        the merge is ONE job over ``upserts`` — no persist through the block
        store, no separate distinct-buckets job; callers that can read the
        key column cheaply (column-pruned parquet scan) piggyback the bucket
        set on their lineage aggregation. A superset only rewrites extra
        buckets byte-identically — never wrong, at worst slightly wasteful.
        Without it the merge persists the reduced winners and runs a small
        distinct job (the right trade when ``upserts`` is an expensive
        computed plan whose recomputation would dominate).

        Applied/skipped metrics ride the write job via Observation — the
        merge never runs a separate metrics join or count over the data.

        ``observe_buckets=True`` (valid only while the table has NO
        committed snapshot, i.e. a first batch): the touched-bucket set is
        not needed BEFORE the job when there is no current state to union
        in, so instead of a caller-side pre-scan (the raw path's bucket
        kernel pass reads every payload byte once just for this) the
        EXACT set rides the write job's Observation (``collect_set`` of
        ``_bucket`` — bounded by the bucket count) and the whole merge is
        ONE job over ``upserts`` with zero pre-jobs.

        ``publish=False`` runs the full merge but STAGES the snapshot
        (write-audit-publish): data and manifest land on disk, CURRENT
        does not move. Audit the staged state with
        ``read(snapshot_id=...)`` / ``changes(...)``, then
        :meth:`publish_staged` or :meth:`abort_staged`. Exactly one
        staged snapshot can be in flight (the next snapshot id is taken).
        """
        snap = self.snapshot()
        if snap is not None and batch_id <= snap["batch_id"]:
            # superseded=None, not upserts.count(): a replayed batch_id is a
            # committed no-op, and launching a full job over the batch plan
            # for a diagnostic metric would make the CHEAP path the slow one
            return {
                "applied": 0,
                "superseded": None,
                "replayed": True,
                "snapshot_id": snap["snapshot_id"],
            }

        observe = observe_buckets and touched_buckets is None
        if observe and snap is not None:
            raise ValueError(
                "observe_buckets requires a table with no committed snapshot "
                "(the touched set must be known BEFORE the job once current "
                "rows need to be unioned in)"
            )
        winners = upserts if pre_reduced else partial_lww_reduce(upserts)
        winners = winners.withColumn(
            "_bucket", bucket_expr(MERGE_KEY[0], self.buckets)
        )
        one_pass = touched_buckets is not None or observe
        if not one_pass:
            winners.persist()
        try:
            if observe:
                touched = None  # resolved from the write job's Observation
            elif one_pass:
                touched = sorted({int(b) for b in touched_buckets})
                if touched and (touched[0] < 0 or touched[-1] >= self.buckets):
                    # an out-of-range bucket proves the caller hashed with a
                    # different modulus than this table — silently dropping
                    # it would strand rows in unregistered bucket partitions
                    raise ValueError(
                        f"touched_buckets {touched[:3]}..{touched[-3:]} out of "
                        f"range for a {self.buckets}-bucket table; caller "
                        "hashed with a different bucket count"
                    )
            else:
                # job 1 (small): which buckets does this batch touch? This is
                # the copy-on-write pruning decision — the rest is one job.
                touched = sorted(
                    r["_bucket"]
                    for r in winners.select("_bucket").distinct().collect()
                )

            old_schema = self._schema(snap) if snap else None
            new_schema = T.StructType(
                [f for f in winners.schema.fields if f.name != "_bucket"]
            )
            schema = (
                self._union_schema(old_schema, new_schema) if old_schema else new_schema
            )

            # `_origin` breaks version ties in favor of the current row
            # (0 > -1), so exact replays land as skipped, not applied.
            def _align(df: DataFrame, origin: int) -> DataFrame:
                # columns align to the UNION schema's types: a batch whose
                # epoch lacks a column backfills it as an untyped (string)
                # NULL — without the cast, unionByName would coerce the
                # whole table column to string for that commit, silently
                # diverging from the manifest schema
                have = {f.name: f.dataType for f in df.schema.fields}
                return df.select(
                    *[
                        (
                            F.col(f.name)
                            if have.get(f.name) == f.dataType
                            else (
                                F.col(f.name) if f.name in have else F.lit(None)
                            ).cast(f.dataType)
                        ).alias(f.name)
                        for f in schema.fields
                    ],
                    F.col("_bucket"),
                    F.lit(origin).alias("_origin"),
                )

            w2 = _align(winners, -1)
            if snap is not None and touched:
                unioned = _align(self.read_internal(touched), 0).unionByName(w2)
            else:
                unioned = w2
            # Bucket-colocation partition count: len(touched) slots for
            # len(touched) distinct _bucket values is a balls-in-bins trap
            # (hash collisions leave ~1/e of the slots empty and pile 2-3
            # buckets on others — a 2-3x straggler on the sort+agg+write
            # stage, guide §2.5 "too few distinct values"). 4x slots make
            # double-ups rare; empty slots cost nothing; each bucket still
            # lands WHOLE in exactly one task (one file per bucket dir).
            n_parts = max(4 * (self.buckets if touched is None else len(touched)), 1)
            if self.merge_strategy == "arrow_local":
                colocated = unioned.repartition(n_parts, "_bucket")
                merged = bucket_local_lww(colocated)
            elif self.merge_strategy == "jvm_legacy":
                # pre-r6 shape (final reduce BEFORE the bucket exchange):
                # kept for A/B measurement only
                merged = lww_reduce(unioned, salt=1).repartition(
                    max(len(touched), 1), "_bucket"
                )
            else:
                # one bucket-colocation exchange, then a PARTITION-LOCAL
                # complete reduce: grouping by (_bucket, key) is satisfied
                # by the repartition's HashPartitioning(_bucket), so the
                # final LWW aggregation adds NO second exchange (one fewer
                # full shuffle + one fewer pre-exchange sort pass than the
                # legacy reduce-then-repartition shape; plan-asserted in
                # tests/test_plans.py)
                colocated = unioned.repartition(n_parts, "_bucket")
                merged = lww_reduce(
                    colocated, key=MERGE_KEY + ["_bucket"], salt=1
                )

            snapshot_id = (snap["snapshot_id"] + 1) if snap else 1
            bucket_locations = dict(snap["bucket_locations"]) if snap else {
                str(b): None for b in range(self.buckets)
            }
            commit_rel = f"commit-{snapshot_id:08d}"
            applied, n_winners, batch_max_ts = 0, (None if one_pass else 0), None
            if touched is None or touched:
                obs = Observation(f"merge-{batch_id}")
                out_cols = [
                    F.col(f.name) if f.name in merged.columns
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
                obs_metrics = [
                    F.count(F.when(F.col("_origin") == -1, 1)).alias("applied"),
                    F.count("*").alias("live_rows"),
                    # event-time frontier of THIS batch's winners — rides
                    # the write job, no separate max() job
                    F.max(
                        F.when(F.col("_origin") == -1, F.col("_ts"))
                    ).alias("max_event_ts"),
                ]
                if touched is None:
                    # observe mode: the EXACT touched set rides the write
                    # (bounded by the bucket count, not the row count)
                    obs_metrics.append(
                        F.collect_set(F.col("_bucket")).alias("touched")
                    )
                to_write = merged.observe(obs, *obs_metrics).select(
                    *out_cols, "_bucket"
                )
                (
                    # already bucket-colocated by the merge shuffle: each
                    # task holds whole buckets -> one file per bucket dir,
                    # no extra exchange
                    to_write.write.partitionBy("_bucket")
                    .mode("overwrite")
                    .parquet(os.path.join(self.data_dir, commit_rel))
                )
                applied = obs.get["applied"]
                batch_max_ts = obs.get["max_event_ts"]
                if touched is None:
                    touched = sorted(int(b) for b in obs.get["touched"])
                # one-pass mode never materializes `winners` separately, so
                # the pre-reduce winner count (a diagnostic, not a contract
                # metric — applied/skipped come from the Observation and the
                # caller's lineage job) is not known. An Observation BELOW
                # the union never resolves under the streaming foreachBatch
                # listener (hangs), so it stays unknown rather than clever.
                n_winners = None if one_pass else winners.count()  # cached
                if obs.get["live_rows"] > 0:
                    for b in touched:
                        bucket_locations[str(b)] = commit_rel
                # else: the batch contributed NOTHING to these buckets (a
                # one-pass touched SUPERSET where every event was scope-
                # filtered away, against buckets with no prior data) — the
                # commit dir holds zero parquet files, so pointing
                # bucket_locations at it would make every later read fail
                # schema inference. Keep prior locations; the manifest
                # still advances batch_id/watermark.

            manifest = {
                "snapshot_id": snapshot_id,
                "parent": snap["snapshot_id"] if snap else None,
                "batch_id": batch_id,
                "schema_json": json.dumps(schema.jsonValue()),
                "bucket_locations": bucket_locations,
                "buckets": self.buckets,
                "watermark": self._advance_watermark(
                    (snap or {}).get("watermark"), watermark
                ),
                "metrics": {
                    "applied": applied,
                    "upsert_keys": n_winners,
                    "max_event_ts": self._advance_event_ts(
                        (snap or {}).get("metrics", {}).get("max_event_ts"),
                        batch_max_ts,
                    ),
                },
            }
            self._commit(manifest, publish=publish)
            return {
                "applied": applied,
                "superseded": (
                    None if n_winners is None else n_winners - applied
                ),
                "replayed": False,
                "snapshot_id": snapshot_id,
                **({} if publish else {"staged": True}),
            }
        finally:
            if not one_pass:
                winners.unpersist()

    @staticmethod
    def _advance_watermark(old: dict | None, new: dict | None) -> dict | None:
        """Monotone offset watermark (T1): micro-batches may arrive out of
        delivery order after a restart; the committed frontier never goes
        backwards (the reference's position context only moves forward,
        /root/reference/packet.cc:56-68)."""
        if not new:
            return old
        if not old:
            return new
        return max(old, new, key=lambda w: (w["file_seq"], w["log_pos"]))

    @staticmethod
    def _advance_event_ts(old, new):
        """Monotone event-time frontier: ISO text in the manifest when
        ``_ts`` is a timestamp (the engine's envelope), the raw value for
        tables whose version column is numeric; never regresses on
        replays/empty batches."""
        if new is None:
            return old
        if hasattr(new, "isoformat"):
            new = new.isoformat()
        return max(old, new) if old is not None else new

    def freshness(self) -> dict:
        """Ingest-lag observability, manifest-only (no Spark job): how far
        the committed event-time frontier trails wall clock. ``lag ==
        committed_at - max_event_ts`` is end-to-end staleness — source
        event time to durable lake visibility — the number an SLO on a
        CDC pipeline actually bounds (a watermark alone measures log
        position, not time)."""
        from datetime import datetime

        snap = self.snapshot()
        if snap is None:
            raise ValueError(f"table {self.path} has no committed snapshot")
        max_ts = snap.get("metrics", {}).get("max_event_ts")
        committed = snap.get("committed_at")
        lag = None
        if isinstance(max_ts, str) and committed is not None:
            try:
                lag = committed - datetime.fromisoformat(max_ts).timestamp()
            except ValueError:
                pass  # non-ISO frontier (numeric _ts table): no time lag
        return {
            "snapshot_id": snap["snapshot_id"],
            "batch_id": snap["batch_id"],
            "watermark": snap.get("watermark"),
            "committed_at": committed,
            "max_event_ts": max_ts,
            "ingest_lag_seconds": lag,
        }

    def delete_keys(self, keys, batch_id: int, key_col: str = "conv_id") -> dict:
        """Targeted erasure (right-to-be-forgotten): tombstone every live
        row whose ``key_col`` is in ``keys`` (a Python list or a
        single-column DataFrame), through the NORMAL LWW MERGE — no
        special-case table surgery, so replays, time travel, changelog
        scans and downstream CDC feeds all see the deletion as ordinary
        tombstones.

        Scale shape: the key set hashes to a bucket list first (distinct
        bucket ids — bounded by the table's bucket count, never by key
        count), so a 10-conversation erasure reads ~10 buckets of a
        10k-bucket table, not the table. The tombstone version stamp
        keeps each row's own ``_ts`` and maxes out (``_file_seq``,
        ``_log_pos``): the deletion wins against everything at-or-before
        the row's timestamp, while a LATER source-side change (the
        primary re-inserting the key) still legitimately wins over it.
        Deterministic, so a replayed erasure batch is idempotent.

        The reference has no deletion surface at all (it forwards D
        events, business.cc; it cannot originate one) — this is lake-side
        lifecycle the Spark engine adds."""
        spark = self.spark
        if isinstance(keys, (list, tuple, set)):
            keys_df = spark.createDataFrame(
                [(k,) for k in sorted(keys)], f"{key_col} string"
            )
        else:
            keys_df = keys.select(key_col).distinct()
        touched = sorted(
            r["b"]
            for r in keys_df.select(
                bucket_expr(key_col, self.buckets).alias("b")
            )
            .distinct()
            .collect()
        )
        snap = self.snapshot()
        if snap is None:
            raise ValueError(f"table {self.path} has no committed snapshot")
        schema = self._schema(snap)
        live = (
            self.read_internal(buckets=touched)
            .where(F.col("_op") != "D")
            .join(F.broadcast(keys_df), key_col, "left_semi")
        )
        payload = [
            f
            for f in schema.fields
            if f.name not in MERGE_KEY and f.name not in VERSION_COLUMNS
        ]
        tombstones = live.select(
            *MERGE_KEY,
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in payload],
            F.lit("D").alias("_op"),
            F.col("_ts"),
            F.lit(2**31 - 1).cast("int").alias("_file_seq"),
            F.lit(2**63 - 1).cast("long").alias("_log_pos"),
        )
        # keys are unique live rows -> already reduced; the bucket list is
        # exact (not a superset), so this is the one-pass merge
        return self.merge(
            tombstones,
            batch_id=batch_id,
            pre_reduced=True,
            touched_buckets=touched,
        )

    # ----------------------------------------------------------- lineage
    LINEAGE_ARROW_FIELDS = [
        ("batch_id", "int64"),
        ("file_seq", "int32"),
        ("max_log_pos", "int64"),
        ("events", "int64"),
        ("applied", "int64"),
        ("skipped", "int64"),
        ("replayed", "bool"),
        ("snapshot_id", "int64"),
    ]

    def append_lineage(self, rows: list[tuple]) -> None:
        """Per-batch, per-file_seq offset/metrics log. Driver-side pyarrow
        write — it is metadata (a handful of rows per batch, like the
        manifest), not a distributed dataset; a Spark job here would cost
        more in scheduling than the data is worth."""
        if not rows:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.lineage_dir, exist_ok=True)
        names = [n for n, _ in self.LINEAGE_ARROW_FIELDS]
        schema = pa.schema([(n, t) for n, t in self.LINEAGE_ARROW_FIELDS])
        cols = list(zip(*rows))
        tbl = pa.table({n: list(c) for n, c in zip(names, cols)}, schema=schema)
        pq.write_table(
            tbl, os.path.join(self.lineage_dir, f"lineage-{uuid.uuid4().hex}.parquet")
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_dir)

    # ---------------------------------------------------------- maintenance
    def vacuum(self, keep_snapshots: int = 10) -> dict:
        """Remove data files unreachable from the last ``keep_snapshots``
        manifests — crash-orphans (a merge that died after writing data but
        before committing) and commits expired out of the time-travel
        window. Metadata-only traversal; no Spark job."""
        import shutil

        snaps = self.history()
        if not snaps:
            return {"removed_dirs": 0}
        keep = snaps[-keep_snapshots:]
        # tagged snapshots are retention-pinned: a tag is a promise that
        # the snapshot stays readable (audit baselines, release states)
        tagged_ids = set(self.tags().values())
        kept_ids = {s["snapshot_id"] for s in keep}
        keep = keep + [
            s for s in snaps
            if s["snapshot_id"] in tagged_ids and s["snapshot_id"] not in kept_ids
        ]
        live_commits = {
            loc for s in keep for loc in s["bucket_locations"].values() if loc
        }
        removed = 0
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                if d.startswith("commit-") and d not in live_commits:
                    shutil.rmtree(os.path.join(self.data_dir, d), ignore_errors=True)
                    removed += 1
        # expire old manifests (keep the retained window)
        keep_names = {f"snap-{s['snapshot_id']:08d}.json" for s in keep}
        for n in os.listdir(self.manifest_dir):
            if n.startswith("snap-") and n not in keep_names:
                os.remove(os.path.join(self.manifest_dir, n))
        return {"removed_dirs": removed, "kept_snapshots": len(keep)}

    def read_keys(self, keys, key_col: str = "conv_id") -> DataFrame:
        """Point lookup: live rows of the listed key values, reading ONLY
        the buckets those keys hash to — a handful-of-conversations fetch
        touches a handful of bucket files of an arbitrarily large table
        (then, post-compaction, a handful of ROW GROUPS inside them,
        thanks to the clustered sort + parquet min/max pushdown). Same
        pruning shape as :meth:`delete_keys`, read-only."""
        keys = sorted(set(keys))
        buckets = sorted(
            {
                r["b"]
                for r in self.spark.createDataFrame(
                    [(k,) for k in keys], f"{key_col} string"
                )
                .select(bucket_expr(key_col, self.buckets).alias("b"))
                .distinct()
                .collect()
            }
        )
        snap = self.snapshot()
        if snap is None:
            raise ValueError(f"table {self.path} has no committed snapshot")
        schema = self._schema(snap)
        user_cols = [f.name for f in schema.fields if f.name not in VERSION_COLUMNS]
        return (
            self.read_internal(buckets=buckets)
            .where(F.col("_op") != "D")
            .where(F.col(key_col).isin(keys))
            .select(*user_cols)
        )

    # ----------------------------------------------------------------- tags
    def _refs_path(self) -> str:
        return os.path.join(self.manifest_dir, "refs.json")

    def tags(self) -> dict:
        """{tag_name: snapshot_id} — named, retention-pinned snapshots."""
        p = self._refs_path()
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def tag(self, name: str, snapshot_id: int | None = None) -> int:
        """Name a snapshot (default: current). Tagged snapshots survive
        ``vacuum`` regardless of the retention window — the Iceberg-tag
        shape: 'the table as of release X' stays readable forever."""
        if snapshot_id is None:
            snap = self.snapshot()
            if snap is None:
                raise ValueError("tag() on a table with no snapshot")
            snapshot_id = snap["snapshot_id"]
        elif self.snapshot(snapshot_id) is None:
            raise ValueError(f"snapshot {snapshot_id} does not exist")
        refs = self.tags()
        refs[name] = int(snapshot_id)
        tmp = self._refs_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(refs, f, indent=1)
        os.replace(tmp, self._refs_path())
        return int(snapshot_id)

    def drop_tag(self, name: str) -> None:
        refs = self.tags()
        refs.pop(name, None)
        tmp = self._refs_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(refs, f, indent=1)
        os.replace(tmp, self._refs_path())

    def read_tag(self, name: str) -> DataFrame:
        refs = self.tags()
        if name not in refs:
            raise ValueError(f"unknown tag {name!r} (have {sorted(refs)})")
        return self.read(snapshot_id=refs[name])

    # ------------------------------------------------------------- backfill
    def backfill(self, name: str, expr, publish: bool = True) -> dict:
        """Add (or recompute) a derived column for EVERY live row as one
        atomic snapshot — schema evolution at rest, the job a 100 TB
        table runs when a new training signal must exist for historical
        rows too. ``expr``: a Column or SQL string over the existing
        columns. One bucket-colocated rewrite (same plan shape as
        compact — no join, no window: the derivation rides the scan);
        time travel still shows the pre-backfill schema, and
        ``publish=False`` stages the result for a write-audit-publish
        gate like any merge."""
        if name in VERSION_COLUMNS or name == "_bucket":
            raise ValueError(f"cannot backfill internal column {name!r}")
        snap = self.snapshot()
        if snap is None:
            raise ValueError("backfill() on a table with no snapshot")
        col = F.expr(expr) if isinstance(expr, str) else expr
        df = self.read_internal().withColumn(name, col)
        snapshot_id = snap["snapshot_id"] + 1
        commit_rel = f"commit-{snapshot_id:08d}"
        (
            df.repartition(self.buckets, "_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(os.path.join(self.data_dir, commit_rel))
        )
        new_schema = T.StructType(
            [f for f in df.schema.fields if f.name != "_bucket"]
        )
        live = {
            str(b): (commit_rel if snap["bucket_locations"].get(str(b)) else None)
            for b in range(self.buckets)
        }
        manifest = dict(
            snap,
            snapshot_id=snapshot_id,
            parent=snap["snapshot_id"],
            bucket_locations=live,
            schema_json=json.dumps(new_schema.jsonValue()),
            metrics={"backfill": name},
        )
        manifest.pop("staged", None)
        self._commit(manifest, publish=publish)
        return {"snapshot_id": snapshot_id, **({} if publish else {"staged": True})}

    def compact(
        self,
        cluster_by: tuple = ("conv_id", "turn_idx"),
        codec: str = "zstd",
    ) -> dict:
        """Rewrite all live buckets into a single commit dir — bounds the
        number of commit dirs a read must union (small-files problem).

        ``cluster_by`` sorts rows WITHIN each bucket file before the
        rewrite (default: the merge key). Clustered files get parquet
        row-group min/max statistics that actually discriminate — a
        point lookup on ``conv_id`` prunes to one row group instead of
        scanning the bucket — and sorted keys compress markedly better.
        The sort is partition-local (``sortWithinPartitions`` after the
        bucket colocation), no extra exchange. Pass ``cluster_by=None``
        to skip (fastest possible compaction).

        ``codec``: at-rest rewrites default to zstd — compaction is the
        one write whose output lives long and is read many times, so it
        trades a little write CPU for markedly smaller cold data (the
        hot merge path keeps Spark's default codec: ingest throughput is
        the SLO there, storage is the SLO here)."""
        snap = self.snapshot()
        if snap is None:
            raise ValueError("compact() on a table with no snapshot")
        schema = self._schema(snap)
        df = self.read_internal()
        snapshot_id = snap["snapshot_id"] + 1
        commit_rel = f"commit-{snapshot_id:08d}"
        colocated = df.repartition(self.buckets, "_bucket")
        if cluster_by:
            colocated = colocated.sortWithinPartitions(*cluster_by)
        (
            colocated
            .write.partitionBy("_bucket")
            .option("compression", codec)
            .mode("overwrite")
            .parquet(os.path.join(self.data_dir, commit_rel))
        )
        live = {
            str(b): (commit_rel if snap["bucket_locations"].get(str(b)) else None)
            for b in range(self.buckets)
        }
        manifest = dict(
            snap,
            snapshot_id=snapshot_id,
            parent=snap["snapshot_id"],
            bucket_locations=live,
            schema_json=json.dumps(schema.jsonValue()),
            metrics={"compaction": True},
        )
        self._commit(manifest)
        return {"snapshot_id": snapshot_id}

    def rebucket(self, new_buckets: int) -> dict:
        """Online bucket-count rescale — the operational gap a day-1 bucket
        choice leaves at 100 TB (a table bucketed for 1 TB has 100x-oversized
        COW rewrite units after two years of growth). One full-table rewrite
        into ``new_buckets`` CRC32 buckets, committed as a normal atomic
        snapshot: readers never see a half-rescaled table, time travel to
        pre-rescale snapshots still reads the old layout, and ingest resumes
        against the new modulus (watermark/batch-id untouched, so
        exactly-once replay semantics carry straight across).

        Scale shape: when ``new_buckets`` is an integer multiple of the old
        count (or vice versa), ``pmod(h, k*n) ≡ pmod(h, n) (mod n)`` means
        every old bucket's rows land in exactly k new buckets (or k old
        buckets coalesce into one) — the remap is PARTITION-LOCAL, so the
        plan is scan -> project -> dynamic-partitioned write with NO
        exchange (plan-asserted in tests). Any other ratio pays one
        repartition. Prefer power-of-two steps in production.

        The handle adopts the new count; handles opened later adopt it from
        the manifest (``__init__``)."""
        if new_buckets < 1:
            raise ValueError(f"new_buckets must be >= 1, got {new_buckets}")
        snap = self.snapshot()
        if snap is None:
            raise ValueError("rebucket() on a table with no snapshot")
        old_buckets = self.buckets
        if new_buckets == old_buckets:
            return {"snapshot_id": snap["snapshot_id"], "rebucketed": False}
        schema = self._schema(snap)
        snapshot_id = snap["snapshot_id"] + 1
        commit_rel = f"commit-{snapshot_id:08d}"
        has_rows = any(v is not None for v in snap["bucket_locations"].values())
        if has_rows:
            df = self.read_internal().drop("_bucket").withColumn(
                "_bucket", bucket_expr(MERGE_KEY[0], new_buckets)
            )
            aligned = new_buckets % old_buckets == 0 or old_buckets % new_buckets == 0
            if not aligned:
                df = df.repartition(new_buckets, "_bucket")
            (
                df.write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(os.path.join(self.data_dir, commit_rel))
            )
            written = {
                int(d.split("=", 1)[1])
                for d in os.listdir(os.path.join(self.data_dir, commit_rel))
                if d.startswith("_bucket=")
            }
        else:
            written = set()
        manifest = dict(
            snap,
            snapshot_id=snapshot_id,
            parent=snap["snapshot_id"],
            buckets=new_buckets,
            bucket_locations={
                str(b): (commit_rel if b in written else None)
                for b in range(new_buckets)
            },
            schema_json=json.dumps(schema.jsonValue()),
            metrics={"rebucket": [old_buckets, new_buckets]},
        )
        self._commit(manifest)
        self.buckets = new_buckets
        return {
            "snapshot_id": snapshot_id,
            "rebucketed": True,
            "buckets": new_buckets,
        }
