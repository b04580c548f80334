"""Property test for the portable hash foundation: hash32 and the
affine family must be bit-identical between Spark and DuckDB on
arbitrary strings — minhash, simhash, LSH banding, CMS, fingerprints,
and the sampling splits all assume it."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parquet_batch_spark.functions.hashing import (
    affine_hash,
    hash32,
    hash_params,
    sql_affine_hash,
    sql_hash32,
)

# printable-ish unicode incl. edge cases; newlines/quotes excluded only
# from the SQL-literal path below via parameter binding (no escaping)
_STRINGS = st.lists(
    st.text(min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings=_STRINGS)
def test_hash32_and_affine_match_duckdb(spark, strings):
    a, b = hash_params(1)[0]
    sdf = spark.createDataFrame([(s,) for s in strings], "s string").select(
        "s",
        hash32(F.col("s")).alias("h"),
        affine_hash(hash32(F.col("s")), a, b).alias("ah"),
    )
    got = {r["s"]: (r["h"], r["ah"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = {
        s: (h, ah)
        for s, h, ah in con.sql(
            f"SELECT s, {sql_hash32('s')} AS h, "
            f"{sql_affine_hash(sql_hash32('s'), a, b)} AS ah FROM t"
        ).fetchall()
    }
    assert got == want
