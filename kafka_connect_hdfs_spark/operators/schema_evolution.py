"""Schema-evolution operators E1-E3 (SURVEY.md §2.7).

Reference semantics (schema/SchemaUtils.java:38-91, enum
schema/Compatibility.java:18-23, docs/hdfs_connector.rst:302-339, goldens in
avro/DataWriterAvroTest.java:267-353):

  - ``shouldChangeSchema(record_schema, current_schema)``:
      NONE      -> any inequality changes the writer schema (rotate per change)
      BACKWARD / FULL -> a *newer* version becomes the new current schema
      FORWARD   -> an *older* version becomes the new current schema
                   (new data is projected DOWN to the oldest schema!)
      version required when compatibility != NONE (throws otherwise).
  - ``project(record, from_schema, to_schema)``: drop fields unknown to the
    target, fill target-only optional fields with their defaults (Connect
    SchemaProjector semantics).

Spark shape: schemas are ``StructType`` + an integer version; projection is a
``select`` of casts/coalesces — Catalyst folds it into the scan, so projecting
a 100 TB backlog is a zero-extra-pass operation. Note this is deliberately NOT
Spark's ``mergeSchema`` (union-by-name): FORWARD projects to the *oldest*
schema, which union semantics cannot express (SURVEY.md §4 custom piece #2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaProjectorException(ValueError):
    """Mirrors Connect's SchemaProjectorException (missing version etc.)."""


@dataclass(frozen=True)
class VersionedSchema:
    """Connect ``Schema`` analog: a StructType + name + version.

    Defaults for optional fields live in field metadata key ``default``
    (Connect keeps them on the Schema; StructField.metadata is the Spark slot).
    """

    struct: StructType
    version: int | None = None
    name: str = "record"

    def defaults(self) -> dict[str, object]:
        out = {}
        for f in self.struct.fields:
            if f.metadata and "default" in f.metadata:
                out[f.name] = f.metadata["default"]
        return out


def should_change_schema(
    record: VersionedSchema, current: VersionedSchema | None, compatibility: str
) -> bool:
    """E1 — SchemaUtils.shouldChangeSchema (schema/SchemaUtils.java:38-61)."""
    if current is None:
        return True
    if compatibility == "NONE":
        return record.struct != current.struct or record.version != current.version
    if record.version is None or current.version is None:
        raise SchemaProjectorException(
            f"Schema version required for {compatibility} compatibility"
        )
    if compatibility == "FORWARD":
        # older version wins: change when the incoming record is OLDER
        return record.version < current.version
    # BACKWARD / FULL: newer version wins
    return record.version > current.version


def project(df: DataFrame, source: VersionedSchema, target: VersionedSchema) -> DataFrame:
    """E2 — rewrite rows from ``source`` to ``target`` schema
    (SchemaUtils.project, schema/SchemaUtils.java:64-91).

    Fields present in target but not source are filled with the target
    default (None when absent and nullable); fields present in source but not
    target are dropped; shared fields are cast to the target type.
    """
    src_names = {f.name for f in source.struct.fields}
    cols = []
    for f in target.struct.fields:
        if f.name in src_names:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            default = f.metadata.get("default") if f.metadata else None
            if default is None and not f.nullable:
                raise SchemaProjectorException(
                    f"required target field {f.name} missing from source and has no default"
                )
            cols.append(F.lit(default).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def evolve(
    current: VersionedSchema | None, record: VersionedSchema, compatibility: str
) -> VersionedSchema:
    """E1+E3 driver-side bookkeeping: the schema subsequent records project to."""
    if should_change_schema(record, current, compatibility):
        return record
    return current  # type: ignore[return-value]


def simulate_file_boundaries(
    versions: list[tuple[int, int]], flush_size: int, compatibility: str
) -> list[int]:
    """Replicate the reference writer state machine's file boundaries for an
    alternating-schema stream (F4 + F1 interaction,
    TopicPartitionWriter.java:329-399).

    ``versions`` is [(offset, schema_version)] in offset order. Returns the
    reference tests' ``validOffsets`` array: file k covers
    [validOffsets[k], validOffsets[k+1]-1]; the trailing open file is
    discarded (F6). Goldens: DataWriterAvroTest.java:267-353 — BACKWARD with
    7 alternating records flush.size=2 -> {0,1,3,5,7}; NONE -> {0..6};
    FORWARD (8 records from offset 1) -> {1,2,4,6,8}.

    Key ordering detail: a schema change commits the current file *before*
    writing the offending record (:354-365); a full file (flush.size) commits
    *after* the record that filled it.
    """
    boundaries: list[int] = []
    current: int | None = None
    file_start: int | None = None
    count = 0
    for off, v in versions:
        rec = VersionedSchema(StructType([]), version=v)
        cur = None if current is None else VersionedSchema(StructType([]), version=current)
        changed = (
            (cur is None or v != current)
            if compatibility == "NONE"
            else should_change_schema(rec, cur, compatibility)
        )
        if changed:
            if file_start is not None and count > 0:
                boundaries.append(file_start)  # commit current file pre-write
            current = v
            file_start, count = off, 0
        if file_start is None:
            file_start, count = off, 0
        count += 1
        if count >= flush_size:
            boundaries.append(file_start)
            file_start, count = off + 1, 0
    # trailing open file discarded (F6); boundaries[k+1]-1 closes file k, so
    # append the end sentinel = start of the never-committed region
    if file_start is not None:
        boundaries.append(file_start)
    return boundaries
