"""Reference-parity tests for the reader facade.

Mirrors the reference's test matrix (FIXTURES.md §A; reference
tests/test_parquetbatch.py:275-330): single exact-fit file, multi-file
even, multi-file uneven (short final batch), nested types — but with
DISTINCT rows per batch (the reference's generator emits identical
rows due to its aliasing bug, tests/test_parquetbatch.py:154; we assert
the documented per-row semantics instead, SURVEY.md §0.1) and full
row-by-row golden checks, not just first/last/count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_batch_spark.sources import ParquetReader, from_dataset, from_path
from parquet_batch_spark.sources.writer import write_parquet


def _mixed_rows(n: int):
    """Deterministic mixed/nested rows shaped like the reference's
    generator menu (string/int/float/struct/list<struct>)."""
    rows = []
    for i in range(n):
        base = i - n // 2
        rows.append(
            {
                "f_str": f"string_field_{i}",
                "f_int": base,
                "f_float": base / 3.0,
                "f_struct": {
                    "sub_str": f"sub_{i}",
                    "sub_int": i,
                    "sub_float": i / 3.0,
                    "sub_list": list(range(1 + i % 9)),
                },
                "f_list_struct": [
                    {"s": f"elem_{i}_{j}", "v": i * 10 + j} for j in range(1 + i % 4)
                ],
            }
        )
    return rows


def _write_fixture(tmpdir: str, total: int, rows_per_file: int) -> str:
    rows = _mixed_rows(total)
    table = pa.Table.from_pylist(rows)
    import os

    os.makedirs(tmpdir, exist_ok=True)
    for fi, start in enumerate(range(0, total, rows_per_file)):
        chunk = table.slice(start, rows_per_file)
        pq.write_table(chunk, f"{tmpdir}/part-{fi:03d}.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "total,per_file",
    [(12, 12), (30, 10), (27, 10)],  # exact-fit / even / uneven short-final
    ids=["single-exact", "multi-even", "multi-uneven"],
)
def test_roundtrip_all_rows(spark, tmp_path, total, per_file):
    path = _write_fixture(str(tmp_path / "ds"), total, per_file)
    reader = from_path(spark, path)
    got = sorted(
        reader.get_rows(["f_str", "f_int", "f_float", "f_struct", "f_list_struct"]),
        key=lambda r: r["f_int"],
    )
    want = _mixed_rows(total)
    assert len(got) == total
    # full golden check, including nested struct/list fidelity
    for g, w in zip(got, want):
        assert g == w
    # the reference's own checks (first/last/count) hold a fortiori
    assert got[0] == want[0] and got[-1] == want[-1]


def test_rows_are_distinct_objects(spark, tmp_path):
    """Anti-regression for the reference's aliasing bug (reader.py:55):
    every yielded row must be an independent dict with its own values."""
    path = _write_fixture(str(tmp_path / "ds"), 3, 3)
    rows = list(from_path(spark, path).get_rows(["f_int"]))
    assert len({id(r) for r in rows}) == 3
    assert sorted(r["f_int"] for r in rows) == [-1, 0, 1]


def test_projection_only_selected_columns(spark, tmp_path):
    path = _write_fixture(str(tmp_path / "ds"), 10, 10)
    rows = list(from_path(spark, path).get_rows(["f_str", "f_int"]))
    assert set(rows[0].keys()) == {"f_str", "f_int"}


def test_filter_passthrough(spark, tmp_path):
    """Reference O9: filter= kwarg reaches the scan."""
    path = _write_fixture(str(tmp_path / "ds"), 20, 10)
    rows = list(
        from_path(spark, path).get_rows_with_args(
            columns=["f_int"], filter="f_int >= 5"
        )
    )
    assert sorted(r["f_int"] for r in rows) == list(range(5, 10))


def test_batch_size_maps_to_spark_conf(spark, tmp_path):
    """Arrow scan-tuning kwargs take effect via their Spark analogs
    (reference reader.py:93-96): batch_size sets the vectorized
    reader's columnarReaderBatchSize for the scan's duration and is
    restored when the generator closes."""
    conf_key = "spark.sql.parquet.columnarReaderBatchSize"
    prior = spark.conf.get(conf_key, None)
    path = _write_fixture(str(tmp_path / "ds"), 5, 5)
    gen = from_path(spark, path).get_rows_with_args(columns=["f_int"], batch_size=2)
    first = next(gen)
    assert first is not None
    assert spark.conf.get(conf_key) == "2"
    gen.close()
    assert spark.conf.get(conf_key, None) == prior


def test_use_threads_warns_no_analog(spark, tmp_path):
    import warnings

    path = _write_fixture(str(tmp_path / "ds"), 5, 5)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = list(
            from_path(spark, path).get_rows_with_args(
                columns=["f_int"], use_threads=False, fragment_readahead=1
            )
        )
    assert len(rows) == 5
    assert any("no Spark analog" in str(w.message) for w in caught)


def test_from_path_reader_options(spark, tmp_path):
    """from_path forwards DataFrameReader options, so the reference's
    exclude_invalid_files / ignore_prefixes convenience works without
    dropping to from_dataset."""
    path = _write_fixture(str(tmp_path / "ds"), 8, 4)
    with open(f"{path}/junk.txt", "w") as fh:
        fh.write("not parquet")
    rows = list(
        from_path(
            spark, path, pathGlobFilter="*.parquet", ignoreCorruptFiles="true"
        ).get_rows(["f_int"])
    )
    assert len(rows) == 8


def test_from_dataset_preconfigured(spark, tmp_path):
    """Reference O3: caller-configured source (explicit schema +
    corrupt-file tolerance)."""
    path = _write_fixture(str(tmp_path / "ds"), 8, 4)
    # drop a decoy file that pathGlobFilter must exclude
    with open(f"{path}/junk.txt", "w") as fh:
        fh.write("not parquet")
    df = (
        spark.read.option("pathGlobFilter", "*.parquet")
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
    )
    rows = list(from_dataset(df).get_rows(["f_int"]))
    assert len(rows) == 8


def test_writer_max_records_per_file(spark, tmp_path):
    """Reference O10 (write path): max_rows_per_file → multi-file
    dataset; read-back preserves all rows."""
    import glob

    df = spark.range(100).selectExpr("id", "id * 2 AS dbl")
    out = str(tmp_path / "out")
    write_parquet(df, out, max_records_per_file=30, n_files=1)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == 4  # 30+30+30+10
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert sorted(r["dbl"] for r in back.collect()) == [2 * i for i in range(100)]


def test_writer_partition_by(spark, tmp_path):
    """Hive-partitioned write → partition pruning on read (the scale
    feature the reference lacks; SURVEY.md §4 'partition pruning')."""
    df = spark.range(40).selectExpr("id", "CAST(id % 4 AS INT) AS bucket")
    out = str(tmp_path / "parted")
    write_parquet(df, out, partition_by=["bucket"])
    pruned = spark.read.parquet(out).filter("bucket = 2")
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "bucket" in plan


def test_hidden_and_corrupt_files_excluded(spark, sf_dir, tmp_path):
    """Reference O3 parity (exclude_invalid_files=True +
    ignore_prefixes=['.', '_'], /root/reference/tests/
    test_parquetbatch.py:392-398): Spark's parquet source skips
    dot/underscore-prefixed files by default, and ignoreCorruptFiles
    drops unreadable ones instead of failing the scan."""
    from parquet_batch_spark.catalog import load

    src = load(spark, sf_dir, "region")
    d = tmp_path / "ds"
    src.write.parquet(str(d))
    n = src.count()
    # hidden + metadata-prefixed + corrupt junk alongside real data
    (d / ".hidden.parquet").write_bytes(b"not parquet at all")
    (d / "_metadata_junk.parquet").write_bytes(b"junk")
    (d / "corrupt.parquet").write_bytes(b"PAR1 but not really")

    # the reference's expert path passes an explicit schema alongside
    # exclude_invalid_files (test_parquetbatch.py:392-398) — same here,
    # since schema inference would otherwise die on the corrupt footer
    back = (
        spark.read.schema(src.schema)
        .option("ignoreCorruptFiles", True)
        .parquet(str(d))
    )
    assert back.count() == n
