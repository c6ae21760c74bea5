"""Engine configuration: schema scoping + column projection.

Replaces the reference's ini config (/root/reference/binlogsub.ini:16-25,
loaded by Config::LoadSchemaConf /root/reference/config.cc:77-161): a
POSIX-regex scope over (database, table) plus an ordinal->name column map.
Matching semantics mirror Schema::CheckSchema (/root/reference/schema.cc:36-43)
via Spark's ``rlike`` (F7 in SURVEY.md §2.6); the filter is applied BEFORE
the decode stage, reproducing the reference's manual predicate pushdown
(/root/reference/packet.cc:201-205 skips row decode for unmatched tables).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ColumnSpec:
    """Ordinal->name mapping, as in [schema_column_N] sections
    (/root/reference/config.cc:138-155; README.md:22 stresses the 0-based
    ordinal)."""

    name: str
    index: int


@dataclass(frozen=True)
class SchemaScope:
    """Which (db, table) streams this engine ingests, and which columns."""

    db_regex: str = "^test$"
    table_regex: str = "^transcripts$"
    columns: tuple[ColumnSpec, ...] = field(
        default_factory=lambda: tuple(
            ColumnSpec(n, i)
            for i, n in enumerate(
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
        )
    )

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in sorted(self.columns, key=lambda c: c.index)]


@dataclass(frozen=True)
class EngineConfig:
    scope: SchemaScope = field(default_factory=SchemaScope)
    # Salt fan-out for hot-key mitigation before the merge-apply stage.
    # 0/1 disables salting. At cluster scale this should be ~#cores in the
    # stage divided by expected distinct hot keys.
    skew_salt: int = 8
    # Number of hash buckets the lake table clusters conv_id into. MERGE
    # rewrites only touched buckets (copy-on-write granularity). At 100 TB
    # this is the knob that bounds per-commit rewrite volume.
    table_buckets: int = 32
    # Auto-compact after this many commits: a long-running stream otherwise
    # accumulates one commit dir per micro-batch and the read-side union
    # grows without bound. 0 disables.
    compact_every: int = 64
