from parquet_batch_spark.functions.numeric import dsum, davg, r6
from parquet_batch_spark.functions.hashing import hash32, affine_hash
from parquet_batch_spark.functions.text import tokens_col, shingles_col

__all__ = ["dsum", "davg", "r6", "hash32", "affine_hash", "tokens_col", "shingles_col"]
