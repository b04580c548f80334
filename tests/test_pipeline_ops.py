"""Functional checks for the curation operators on planted inputs (the
driver corpus is synthetic and PII-free, so detection is proven here)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["synthetic"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_pii_detect_finds_planted_pii(spark, tmp_path):
    from parquet_batch_spark.operators.pipeline_ops import pii_detect

    sf_dir = _write_docs(
        tmp_path,
        [
            "contact me at alice.smith+work@example.co.uk for details",
            "call 555-123-4567 or 555 987 6543 tomorrow",
            "server at 192.168.1.100 went down",
            "nothing sensitive in this one at all",
            "mixed: bob@test.io and 10.0.0.1 and 123-456-7890",
        ],
    )
    out = {r["doc_id"]: r for r in pii_detect(spark, sf_dir).collect()}
    assert (out[0]["n_email"], out[0]["has_pii"]) == (1, True)
    assert out[1]["n_phone"] == 2 and out[1]["has_pii"]
    assert out[2]["n_ip"] == 1 and out[2]["has_pii"]
    assert not out[3]["has_pii"]
    assert (out[4]["n_email"], out[4]["n_ip"], out[4]["n_phone"]) == (1, 1, 1)


def test_pii_redaction_removes_matches(spark, tmp_path):
    """The redacted digest must equal the digest of the expected
    redacted string — i.e. redaction actually replaced the PII."""
    from parquet_batch_spark.operators.pipeline_ops import pii_detect

    sf_dir = _write_docs(tmp_path, ["email bob@test.io then 192.168.0.1 done"])
    got = pii_detect(spark, sf_dir).collect()[0]["redacted_md5"]
    expected = (
        spark.range(1)
        .select(F.md5(F.lit("email <EMAIL> then <IP> done")))
        .collect()[0][0]
    )
    assert got == expected


def test_stratified_sample_rates(spark, sf_dir):
    """Kept fraction per stratum must track the configured per-mille
    rate (hash uniformity gives a generous ±60% tolerance band at the
    small corpus sizes of the test SFs)."""
    from parquet_batch_spark.catalog import load
    from parquet_batch_spark.operators.pipeline_ops import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        sample_stratified,
    )

    totals = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {r["lang"]: r["n_kept"] for r in sample_stratified(spark, sf_dir).collect()}
    for lang, total in totals.items():
        rate = SAMPLE_RATES.get(lang, SAMPLE_DEFAULT_RATE) / 1000
        expected = total * rate
        # 4-sigma binomial band (+1 for the tiny-stratum floor)
        band = 4 * (expected * (1 - rate)) ** 0.5 + 1
        assert abs(kept.get(lang, 0) - expected) <= band, (lang, kept.get(lang), expected, band)


def test_compaction_actually_reduces_files(spark, sf_dir):
    """The summary row's file counts must reflect reality on disk:
    64 fragments in, ceil(rows/200k) right-sized files out."""
    import glob
    import os

    from parquet_batch_spark.operators.sources_ext import (
        _io_dir,
        sink_compact_small_files,
    )

    row = sink_compact_small_files(spark, sf_dir).collect()[0]
    frag = glob.glob(os.path.join(_io_dir(sf_dir, "lineitem_frag"), "*.parquet"))
    compacted = glob.glob(os.path.join(_io_dir(sf_dir, "lineitem_compact"), "*.parquet"))
    assert len(frag) == row["n_files_before"] == 64
    assert len(compacted) == row["n_files_after"]
    assert len(compacted) < len(frag)


def test_decontam_flags_benchmark_copy(spark, tmp_path):
    """A training doc that verbatim-copies a benchmark doc's text must
    be flagged; unrelated docs must not."""
    from parquet_batch_spark.operators.pipeline_ops import (
        BENCH_MOD,
        decontam_ngram_overlap,
    )

    bench_text = "the held out evaluation question about rivers in europe today"
    # corpus smaller than BENCH_MOD so doc 0 is the ONLY benchmark doc;
    # fillers share 5-grams with each other but not with the benchmark
    texts = ["filler document %d with its own unrelated words here" % i for i in range(50)]
    texts[0] = bench_text  # doc_id 0 % BENCH_MOD == 0 -> benchmark slice
    texts[5] = "prefix words " + bench_text + " suffix words"  # contaminated
    assert 5 % BENCH_MOD != 0
    sf_dir = _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r["contaminated"] for r in decontam_ngram_overlap(spark, sf_dir).collect()}
    assert out[5] is True
    assert out[6] is False
    assert 0 not in out  # benchmark slice excluded from train output
