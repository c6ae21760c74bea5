"""binlogsub_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-realizes the capabilities of the reference C++ binlog subscriber
(`liujian0616/binlogsub`, /root/reference) as an idiomatic Spark pipeline:

    synthetic binlog event table (deterministic, parametric scale)
      -> vectorized Arrow decode (pandas batches, no per-row Python)
      -> schema-scope regex filter (predicate BEFORE the expensive decode,
         mirroring /root/reference/packet.cc:201-205)
      -> salted two-phase last-writer-wins dedup per (conv_id, turn_idx)
         ordered by (ts, file_seq, log_pos)
      -> copy-on-write MERGE into a snapshot-based lakehouse table
         ("LakeTable": parquet data files + JSON manifests, schema-union
         evolution, bucket pruning)
      -> per-partition offset/lineage checkpointing + applied/skipped metrics
         (replaces the reference's Redis position hash,
         /root/reference/business.cc:35-73)

Nothing here is a translation of the reference's code; the reference defines
*what* to compute (SURVEY.md catalogs every stage with file:line citations),
and this package expresses it with DataFrame/Structured Streaming primitives.
"""

__version__ = "0.1.0"

from binlogsub_spark.session import get_spark  # noqa: F401
