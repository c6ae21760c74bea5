"""Built-in write-audit-publish guards.

`apply_batch(audit=...)` / `run_stream(audit=...)` take any callable
``(table, staged_snapshot_id) -> bool``; these are the guards a CDC
pipeline reaches for first. They inspect the STAGED state (readable by
snapshot id while CURRENT still points at the prior snapshot) and vote
on publishing it — the classic defense against an upstream accident
(a mass-DELETE replication storm, a truncate-then-reload, a connector
replaying from position 0) becoming instantly visible to every reader.

Each guard costs at most two metadata-cheap counts over the staged and
current snapshots — bounded, bucket-parallel parquet count jobs, no
shuffles — so gating every micro-batch is affordable at scale.
"""

from __future__ import annotations


def row_count_guard(max_drop_frac: float = 0.5, min_rows: int = 0):
    """Refuse a batch that shrinks the live table by more than
    ``max_drop_frac`` (fraction of the current row count), or below
    ``min_rows``. Growth always passes; on an empty table anything
    passes (bootstrap)."""
    if not 0.0 <= max_drop_frac <= 1.0:
        raise ValueError("max_drop_frac must be in [0, 1]")

    def _audit(table, staged_snapshot_id: int) -> bool:
        staged = table.read(snapshot_id=staged_snapshot_id).count()
        if staged < min_rows:
            return False
        snap = table.snapshot()
        if snap is None:
            return True
        current = table.read().count()
        if current == 0:
            return True
        return staged >= current * (1.0 - max_drop_frac)

    return _audit


def no_null_keys_guard(key_cols=("conv_id", "turn_idx")):
    """Refuse a batch whose staged state contains a NULL merge key —
    the canonical symptom of a decoder/schema drift upstream."""

    def _audit(table, staged_snapshot_id: int) -> bool:
        from pyspark.sql import functions as F

        df = table.read(snapshot_id=staged_snapshot_id)
        cond = None
        for c in key_cols:
            x = F.col(c).isNull()
            cond = x if cond is None else (cond | x)
        return df.where(cond).limit(1).count() == 0

    return _audit


def all_of(*audits):
    """Combine guards; every one must pass. Short-circuits on the first
    rejection so cheaper guards should come first."""

    def _audit(table, staged_snapshot_id: int) -> bool:
        return all(a(table, staged_snapshot_id) for a in audits)

    return _audit
