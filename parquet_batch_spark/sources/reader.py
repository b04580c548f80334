"""Reference-parity Parquet reader facade.

Re-expresses the COMPLETE public API of the reference library
(SMurphyDev/parquet-batch, src/parquetreader/reader.py) on Spark:

- ``ParquetReader(df)``          ≈ ``ParquetReader(dataset)``    (reader.py:15-29)
- ``from_path(spark, path)``     ≈ ``from_path(parquet_path)``   (reader.py:128-129)
- ``from_dataset(df)``           ≈ ``from_dataset(dataset)``     (reader.py:112-113)
- ``get_rows(columns)``          ≈ reader.py:90-97 — projected, memory-bounded
  row streaming with fixed scan defaults
- ``get_rows_with_args(**kw)``   ≈ reader.py:47-72 — expert passthrough
  (columns / filter / batch sizing knobs)

Semantics: the *documented* contract — "a generator where each
element is a single row from the underlying Dataset" (reader.py:10-11)
— with correct per-row values. The reference's implementation has a
row-aliasing bug (``records = [{}] * num_records``, reader.py:55,
every row in a batch collapses to the last one — SURVEY.md §0.1); we
implement the intended semantics, which is what its docs, README and
test intent describe. Spark Rows are immutable so the bug class
cannot recur.

Memory model parity: the reference streams one Arrow RecordBatch
(+readahead) at a time (reader.py:93-96). Here ``toLocalIterator``
streams one *partition* at a time to the driver — executors scan in
parallel (the scan itself is distributed, unlike the reference), but
driver-resident memory stays bounded by one partition, the same
envelope contract. ``prefetchPartitions`` maps to the reference's
``batch_readahead`` concept.
"""

from __future__ import annotations

from collections.abc import Generator, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession


class ParquetReader:
    """Row-streaming facade over a Spark DataFrame scan.

    Mirrors the reference's two-method surface (reader.py:15-97). The
    underlying plan stays fully declarative — projection and filters
    are handed to Catalyst, which pushes them into the parquet scan
    (the reference delegates the same way to the Arrow scanner).
    """

    def __init__(self, df: DataFrame):
        self.df = df

    def get_rows_with_args(
        self,
        columns: list[str] | None = None,
        filter: Column | str | None = None,  # noqa: A002 - reference kwarg name
        prefetch_partitions: bool = False,
        **_ignored: Any,
    ) -> Generator[dict, None, None]:
        """Expert path (reference reader.py:47-72).

        ``columns`` → projection pushdown (reference O4);
        ``filter``  → predicate pushdown (reference O9, the Arrow
        ``filter=`` passthrough); extra kwargs accepted-and-ignored
        for drop-in compatibility with Arrow scan-tuning knobs that
        have no Spark analog (batch_size/readahead are handled by the
        scan planner and ``spark.sql.files.maxPartitionBytes``).
        """
        df = self.df
        if filter is not None:
            df = df.filter(filter)
        if columns is not None:
            df = df.select(*columns)
        for row in df.toLocalIterator(prefetchPartitions=prefetch_partitions):
            yield row.asDict(recursive=True)

    def get_rows(self, columns: list[str]) -> Generator[dict, None, None]:
        """Primary path (reference reader.py:90-97): projected scan,
        bounded-memory row generator."""
        return self.get_rows_with_args(columns=columns)


def from_path(spark: SparkSession, parquet_path: str | Iterable[str]) -> ParquetReader:
    """Build a reader from a file, directory, or list of paths
    (reference reader.py:128-129; multi-file datasets per O2)."""
    paths = [parquet_path] if isinstance(parquet_path, str) else list(parquet_path)
    return ParquetReader(spark.read.parquet(*paths))


def from_dataset(df: DataFrame) -> ParquetReader:
    """Wrap a caller-configured DataFrame (reference reader.py:112-113
    — the 'preconfigured source' path O3: caller controls schema,
    corrupt-file handling, path filters via DataFrameReader options)."""
    return ParquetReader(df)
