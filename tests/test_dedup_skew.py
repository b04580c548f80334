"""Stop-shingle skew: the document-frequency cap must drop boilerplate
shingles before the inverted-index self-join (the quadratic hot bucket
at corpus scale) without losing true near-dup pairs — identically in
Spark and the DuckDB oracle."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from oracle_harness import compare

STOP = "subscribe to our newsletter for daily updates and exclusive offers"


def _write_corpus(tmp_path) -> str:
    """100 unique docs, 40 of them sharing a verbatim stop phrase
    (df=40 > cap=max(32, 2%·102)=32), plus one true near-dup pair
    (ids 100/101) that ALSO carries the stop phrase."""
    rows = []
    for i in range(100):
        uniq = f"document number {i} speaks of topic {i * 7} and subject {i * 13} entirely"
        text = uniq + (" " + STOP if i < 40 else "")
        rows.append((i, text))
    dup = "the quick brown fox jumps over the lazy dog near the river bank " + STOP
    rows.append((100, dup))
    rows.append((101, dup + " today"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["synthetic"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_df_cap_drops_stop_shingles_keeps_true_dups(spark, tmp_path):
    from parquet_batch_spark.operators.dedup import (
        SHINGLE_DF_CAP_MIN,
        _doc_shingle_hashes,
        dedup_ngram_jaccard,
    )

    sf_dir = _write_corpus(tmp_path)
    hashes = _doc_shingle_hashes(spark, sf_dir)
    max_df = (
        hashes.groupBy("h").agg(F.count(F.lit(1)).alias("df")).agg(F.max("df")).collect()
    )[0][0]
    assert max_df <= SHINGLE_DF_CAP_MIN, f"hot shingle survived the cap: df={max_df}"

    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    assert (100, 101) in pairs, pairs
    # no pair among the 40 stop-phrase docs: they share ONLY boilerplate
    assert not any(a < 100 and b < 100 for a, b in pairs), pairs


def test_fuzzy_blocking_catches_bucket_straddlers(spark, tmp_path):
    """A 199/201-char near-dup pair falls in adjacent length buckets
    (floor(n/100) = 1 vs 2); adjacent-bucket probing must still pair
    them. Also pins the anchor key: a pair sharing a first token but
    exceeding the edit threshold stays out."""
    base199 = ("shared opening words here " + "x " * 200)[:199]
    base201 = (base199 + "yy")[:201]
    other = "totally different start " + "z " * 100
    rows = [
        (0, base199),
        (1, base201),
        (2, other[:150]),  # same first-token anchor as nothing above
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["synthetic"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    from parquet_batch_spark.operators.dedup import (
        _DEDUP_FUZZY_SQL,
        dedup_fuzzy_levenshtein,
    )

    out = dedup_fuzzy_levenshtein(spark, str(tmp_path))
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in pairs, pairs

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    res = compare("dedup_fuzzy_levenshtein", out, _DEDUP_FUZZY_SQL, con)
    assert res.ok, f"{res.detail}\n" + "\n".join(res.mismatches)


def test_df_cap_matches_oracle_on_skewed_corpus(spark, tmp_path):
    """Borderline document frequencies must be capped identically in
    both engines (same floor/greatest arithmetic)."""
    import __spark_entry__ as e

    sf_dir = _write_corpus(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    oracles = e.oracle_sql()
    for name in ("dedup_ngram_jaccard", "dedup_minhash_lsh"):
        df = e.queries()[name](spark, sf_dir)
        res = compare(name, df, oracles[name], con)
        assert res.ok, f"{name}: {res.detail}\n" + "\n".join(res.mismatches)
