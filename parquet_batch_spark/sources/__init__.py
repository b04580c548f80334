from parquet_batch_spark.sources.reader import ParquetReader, from_dataset, from_path
from parquet_batch_spark.sources.writer import write_parquet

__all__ = ["ParquetReader", "from_dataset", "from_path", "write_parquet"]
